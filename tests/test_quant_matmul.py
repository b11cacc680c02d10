"""Fused LN+int8-quant matmul kernel (ops/quant_matmul.py).

The Pallas kernel runs via the interpreter on CPU; its math twin
(_qmm_reference, fed the same folded weights) doubles as the oracle, and is
itself checked against a plain fp32 LayerNorm+Dense composition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transparent_object_detection_tpu.ops.quant_matmul as qmm_mod
from transparent_object_detection_tpu.ops.quant_matmul import (
    _fold_ln,
    _qmm_reference,
    quant_matmul,
    quantize_weights,
)


@pytest.fixture
def data(rng):
    m, k, n = 256, 256, 256
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(k,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(k,)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    return x, w, bias, gamma, beta, res


def _dense_oracle(x, w, bias, gamma=None, beta=None, act=None, res=None):
    xf = x.astype(jnp.float32)
    if gamma is not None:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xf = (xc * jax.lax.rsqrt(var + 1e-6)) * gamma + beta
    out = xf @ w + bias
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = jax.nn.silu(out)
    if res is not None:
        out = out + res
    return out


def _folded(w, bias, gamma, beta, ln):
    """Mirror quant_matmul's trace-time weight prep for the reference twin."""
    if ln:
        w, bias = _fold_ln(w, bias, gamma, beta)
    wq, ws = quantize_weights(w)
    return wq, ws, bias


def test_reference_path_close_to_fp32(data):
    """int8 dynamic quant ~1-2% of the exact fp32 result."""
    x, w, bias, gamma, beta, res = data
    wq, ws, bias_eff = _folded(w, bias, gamma, beta, ln=True)
    got = _qmm_reference(
        x, wq, ws, bias_eff, res,
        ln=True, act="gelu", residual=True, ln_eps=1e-6, out_dtype=jnp.float32,
    )
    ref = _dense_oracle(x, w, bias, gamma, beta, "gelu", res)
    denom = np.abs(np.asarray(ref)) + 1e-2
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
    assert np.median(rel) < 0.02
    assert rel.mean() < 0.1


def test_public_entry_close_to_fp32(data):
    """quant_matmul (XLA fallback path) ~ fp32 LN+Dense oracle."""
    x, w, bias, gamma, beta, res = data
    got = quant_matmul(
        x, w, bias=bias, ln_scale=gamma, ln_bias=beta, act="gelu",
        residual=res, out_dtype=jnp.float32,
    )
    ref = _dense_oracle(x, w, bias, gamma, beta, "gelu", res)
    denom = np.abs(np.asarray(ref)) + 1e-2
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
    assert np.median(rel) < 0.02


@pytest.mark.parametrize(
    "ln,act,residual",
    [(False, None, False), (True, None, False), (True, "gelu", False),
     (False, None, True), (True, "gelu", True), (False, "silu", False)],
)
def test_kernel_matches_reference(data, ln, act, residual, monkeypatch):
    """Interpreter-mode Pallas kernel == the pure-JAX math twin."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, gamma, beta, res = data
    kwargs = dict(bias=bias, out_dtype=jnp.float32)
    if ln:
        kwargs.update(ln_scale=gamma, ln_bias=beta)
    if act:
        kwargs.update(act=act)
    if residual:
        kwargs.update(residual=res)
    got = quant_matmul(x, w, **kwargs)
    wq, ws, bias_eff = _folded(w, bias, gamma, beta, ln)
    ref = _qmm_reference(
        x, wq, ws, bias_eff, res if residual else None,
        ln=ln, act=act, residual=residual, ln_eps=1e-6, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_batched_input_shape(data, monkeypatch):
    """(B, N, K) inputs flatten/unflatten around the kernel."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, *_ = data
    x3 = x.reshape(2, 128, -1)
    got = quant_matmul(x3, w, bias=bias, out_dtype=jnp.float32)
    flat = quant_matmul(x, w, bias=bias, out_dtype=jnp.float32)
    assert got.shape == (2, 128, w.shape[1])
    np.testing.assert_allclose(
        np.asarray(got).reshape(flat.shape), np.asarray(flat), rtol=1e-5, atol=1e-5
    )


def test_untileable_shapes_fall_back(data):
    """K not 128-aligned -> XLA reference path (no error)."""
    x, w, bias, *_ = data
    x = x[:, :200]
    w = w[:200]
    out = quant_matmul(x, w, bias=bias, out_dtype=jnp.float32)
    wq, ws = quantize_weights(w)
    ref = _qmm_reference(x, wq, ws, bias, None, ln=False, act=None,
                         residual=False, ln_eps=1e-6, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ln", [False, True])
def test_split_path_matches_reference(data, ln, monkeypatch):
    """The split path (_pquant_call: Pallas quant pass -> XLA int8 dot ->
    XLA epilogue) computes the same math as the fused kernel's twin."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, gamma, beta, res = data
    wq, ws, bias_eff = _folded(w, bias, gamma, beta, ln)
    got = qmm_mod._pquant_call(
        x, wq, ws.astype(jnp.float32), bias_eff,
        out_dtype=jnp.float32, ln=ln, act=None, ln_eps=1e-6,
    )
    ref = _qmm_reference(
        x, wq, ws, bias_eff, None,
        ln=ln, act=None, residual=False, ln_eps=1e-6, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_prefer_split_routes_qkv_only():
    """Measured routing: only the large wide-N qkv family (n == 3k, LN,
    no act/residual) takes the split path."""
    assert qmm_mod._prefer_split(204800, 1536, 4608, True, None, None)
    assert qmm_mod._prefer_split(51200, 2048, 6144, True, None, None)
    # attn_out (residual), mlp1 (gelu), mlp2 (residual), small m: fused
    assert not qmm_mod._prefer_split(204800, 1536, 1536, False, None, object())
    assert not qmm_mod._prefer_split(204800, 1536, 6144, True, "gelu", None)
    assert not qmm_mod._prefer_split(204800, 6144, 1536, False, None, object())
    assert not qmm_mod._prefer_split(12800, 3072, 9216, True, None, None)


# ---------------------------------------------------------------------------
# multi-chip: the int8 TEB path must partition under a data mesh
# ---------------------------------------------------------------------------


@pytest.fixture
def _mesh_cleanup():
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh

    yield
    set_compute_mesh(None)


def test_shard_map_pallas_partitions_batch(data, monkeypatch, _mesh_cleanup):
    """Under a registered 8-device mesh, the PALLAS path (interpret mode)
    runs per-shard: each shard's local M (8*256/8 = 256 rows) passes
    _pick_blocks, and the assembled result matches the math twin."""
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh
    from transparent_object_detection_tpu.parallel import batch_sharding, make_mesh

    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, gamma, beta, res = data
    mesh = make_mesh()
    set_compute_mesh(mesh)

    seen = []
    orig = qmm_mod._qmm_call

    def spy(x2d, *args, **kwargs):
        seen.append(x2d.shape)
        return orig(x2d, *args, **kwargs)

    monkeypatch.setattr(qmm_mod, "_qmm_call", spy)

    xb = jnp.tile(x.reshape(1, 256, 256), (8, 1, 1)) * jnp.linspace(
        0.5, 1.5, 8
    ).reshape(8, 1, 1)
    xb = jax.device_put(xb, batch_sharding(mesh))
    got = quant_matmul(xb, w, bias=bias, ln_scale=gamma, ln_bias=beta,
                       act="gelu", out_dtype=jnp.float32)
    assert got.shape == (8, 256, 256)
    # the kernel launcher saw per-shard local rows, not the global M
    assert seen and all(s[0] == 256 for s in seen), seen

    wq, ws, bias_eff = _folded(w, bias, gamma, beta, ln=True)
    ref = _qmm_reference(
        xb, wq, ws, bias_eff, None,
        ln=True, act="gelu", residual=False, ln_eps=1e-6, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_shard_map_residual_sharded(data, monkeypatch, _mesh_cleanup):
    """The residual operand rides the batch axis through shard_map."""
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh
    from transparent_object_detection_tpu.parallel import batch_sharding, make_mesh

    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, gamma, beta, res = data
    mesh = make_mesh()
    set_compute_mesh(mesh)
    xb = jnp.tile(x.reshape(1, 256, 256), (8, 1, 1))
    rb = jnp.tile(res.reshape(1, 256, 256), (8, 1, 1))
    xb = jax.device_put(xb, batch_sharding(mesh))
    rb = jax.device_put(rb, batch_sharding(mesh))
    got = quant_matmul(xb, w, bias=bias, residual=rb, out_dtype=jnp.float32)
    wq, ws = quantize_weights(w)
    ref = _qmm_reference(xb, wq, ws, bias, rb, ln=False, act=None,
                         residual=True, ln_eps=1e-6, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_int8_teb_partitions_under_data_mesh(rng, _mesh_cleanup):
    """End-to-end: a TransformerEncoderBlock with int8_dense under a data
    mesh — the full fused serving path (shard_map'd quant_matmul dispatch)
    executes and matches the no-mesh result exactly."""
    from transparent_object_detection_tpu.models.blocks import TransformerEncoderBlock
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh
    from transparent_object_detection_tpu.parallel import batch_sharding, make_mesh

    teb = TransformerEncoderBlock(num_heads=2, dtype=jnp.float32, int8_dense=True)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 128)), jnp.float32)
    variables = teb.init(jax.random.key(0), x, train=False)
    base = teb.apply(variables, x, train=False)

    mesh = make_mesh()
    set_compute_mesh(mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = teb.apply(variables, xs, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), rtol=1e-5, atol=1e-5
    )
