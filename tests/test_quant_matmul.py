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


# ---------------------------------------------------------------------------
# int8 handoff (quant_out producer -> x_quant consumer)
# ---------------------------------------------------------------------------


def _group_quantize(x, groups):
    """Per-(row, k-group) int8 quantization, the producer's emission format."""
    m, k = x.shape
    g = k // groups
    x3 = np.asarray(x, np.float32).reshape(m, groups, g)
    amax = np.maximum(np.abs(x3).max(axis=-1, keepdims=True), 1e-30)
    payload = np.round(x3 * (127.0 / amax)).astype(np.int8).reshape(m, k)
    scales = (amax[..., 0] / 127.0).astype(np.float32)
    return jnp.asarray(payload), jnp.asarray(scales)


def test_quant_out_matches_reference(data, monkeypatch):
    """Interpreter-mode kernel with quant_out == the math twin's payload and
    per-(row, tile) scales."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, gamma, beta, _ = data
    payload, scales = quant_matmul(
        x, w, bias=bias, ln_scale=gamma, ln_bias=beta, act="gelu",
        quant_out=True,
    )
    assert payload.dtype == jnp.int8
    group = w.shape[1] // scales.shape[-1]
    wq, ws, bias_eff = _folded(w, bias, gamma, beta, ln=True)
    ref_p, ref_s = _qmm_reference(
        x, wq, ws, bias_eff, None, ln=True, act="gelu", residual=False,
        ln_eps=1e-6, out_dtype=jnp.float32, quant_out_group=group,
    )
    # compare dequantized values (a borderline round may flip one LSB)
    got = np.asarray(payload, np.float32) * np.repeat(np.asarray(scales), group, -1)
    ref = np.asarray(ref_p, np.float32) * np.repeat(np.asarray(ref_s), group, -1)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_x_quant_consumer_matches_reference(data, groups, monkeypatch):
    """Interpreter-mode kernel consuming a pre-quantized payload (G=1 direct,
    G>1 requant-onto-rowmax) == the math twin."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, *_ , res = data
    payload, scales = _group_quantize(x, groups)
    got = quant_matmul(
        None, w, bias=bias, residual=res, out_dtype=jnp.float32,
        x_quant=(payload, scales),
    )
    wq, ws = quantize_weights(w)
    ref = _qmm_reference(
        payload, wq, ws, bias, res, ln=False, act=None, residual=True,
        ln_eps=1e-6, out_dtype=jnp.float32, x_scales=scales,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("groups", [1, 2])
def test_m_inner_layout_matches(data, groups, monkeypatch):
    """The M-innermost grid (weights stream once per outer step) computes
    the same values as the reference, for both direct and requant modes."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, *_ = data
    payload, scales = _group_quantize(x, groups)
    wq, ws = quantize_weights(w)
    got = qmm_mod._qmm_call(
        payload, scales, wq, ws, bias, None,
        out_dtype=jnp.float32, bm=128, bn=128, ln=False, act=None,
        residual=False, ln_eps=1e-6, groups=groups, quant_out=False,
        m_inner=True,
    )
    ref = _qmm_reference(
        payload, wq, ws, bias, None, ln=False, act=None, residual=False,
        ln_eps=1e-6, out_dtype=jnp.float32, x_scales=scales,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_handoff_chain_close_to_fp32(data):
    """mlp1(quant_out) -> mlp2(x_quant) == the fp32 two-layer oracle to
    within dynamic-int8 tolerance (the handoff must not add a noise class)."""
    x, w, bias, gamma, beta, res = data
    w2 = jnp.transpose(w)  # (n, k) second projection
    z8 = quant_matmul(
        x, w, bias=bias, ln_scale=gamma, ln_bias=beta, act="gelu",
        quant_out=True,
    )
    got = quant_matmul(
        None, w2, bias=None, residual=res, out_dtype=jnp.float32, x_quant=z8,
    )
    z = _dense_oracle(x, w, bias, gamma, beta, "gelu", None)
    ref = z @ w2 + res
    denom = np.abs(np.asarray(ref)) + 1e-1
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
    assert np.median(rel) < 0.03, np.median(rel)


def test_ln_quant_out_matches_reference(data, monkeypatch):
    """Interpreter-mode kernel with ln_quant_out == the math twin's
    (value, normalized payload, rsqrt-folded per-row scales) triple."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, *_ , res = data
    value, payload, scales = quant_matmul(
        x, w, bias=bias, residual=res, out_dtype=jnp.float32,
        ln_quant_out=True,
    )
    assert payload.dtype == jnp.int8 and scales.shape == (x.shape[0], 1)
    wq, ws = quantize_weights(w)
    ref_v, ref_p, ref_s = _qmm_reference(
        x, wq, ws, bias, res, ln=False, act=None, residual=True,
        ln_eps=1e-6, out_dtype=jnp.float32, ln_out=True,
    )
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_v),
                               rtol=2e-2, atol=2e-2)
    got = np.asarray(payload, np.float32) * np.asarray(scales)
    ref = np.asarray(ref_p, np.float32) * np.asarray(ref_s)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_ln_handoff_chain_close_to_fp32(data, monkeypatch):
    """attn_out(ln_quant_out) -> mlp1(x_quant_normalized, LN folded into
    weights) == the fp32 residual-add -> LayerNorm -> Dense oracle, within
    dynamic-int8 tolerance (the LN handoff must not add a noise class)."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, gamma, beta, res = data
    value, payload, scales = quant_matmul(
        x, w, bias=bias, residual=res, out_dtype=jnp.float32,
        ln_quant_out=True,
    )
    w2 = jnp.transpose(w)
    got = quant_matmul(
        None, w2, bias=None, ln_scale=gamma[: w.shape[1]],
        ln_bias=beta[: w.shape[1]], act="gelu", out_dtype=jnp.float32,
        x_quant=(payload, scales), x_quant_normalized=True,
    )
    t = _dense_oracle(x, w, bias, res=res)  # attn_out + residual
    ref = _dense_oracle(
        t, w2, jnp.zeros((w2.shape[1],)), gamma[: w.shape[1]],
        beta[: w.shape[1]], "gelu",
    )
    rel_v = np.abs(np.asarray(value) - np.asarray(t)) / (
        np.abs(np.asarray(t)) + 1e-1
    )
    assert np.median(rel_v) < 0.02, np.median(rel_v)
    denom = np.abs(np.asarray(ref)) + 1e-1
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
    assert np.median(rel) < 0.03, np.median(rel)


def test_ln_handoff_teb_ab_equivalence(rng, monkeypatch):
    """The TEB's int8 output with the LN handoff ON vs OFF differs only by
    one requantization class (both ~= the bf16 branch)."""
    from transparent_object_detection_tpu.models.blocks import (
        TransformerEncoderBlock,
    )

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 256)), jnp.float32)
    teb = TransformerEncoderBlock(num_heads=2, dtype=jnp.float32,
                                  int8_dense=True, name="t")
    v = teb.init(jax.random.key(1), x)
    # spy on quant_matmul to prove the handoff route actually engages (in
    # fp32 both routes compute IDENTICAL math — the producer normalizes the
    # same f32 rows mlp1's prologue would — so outputs alone can't tell)
    calls = []
    real_qmm = qmm_mod.quant_matmul

    def spy(*a, **k):
        calls.append({f: k.get(f, False) for f in
                      ("ln_quant_out", "x_quant_normalized")})
        return real_qmm(*a, **k)

    monkeypatch.setattr(qmm_mod, "quant_matmul", spy)
    monkeypatch.setenv("TOD_LN_HANDOFF_MIN_ROWS", "0")  # tiny test shapes
    monkeypatch.setenv("TOD_LN_HANDOFF", "0")
    off = teb.apply(v, x)
    assert not any(c["ln_quant_out"] for c in calls)
    calls.clear()
    monkeypatch.setenv("TOD_LN_HANDOFF", "1")
    on = teb.apply(v, x)
    assert any(c["ln_quant_out"] for c in calls)
    assert any(c["x_quant_normalized"] for c in calls)
    rel = np.abs(np.asarray(on) - np.asarray(off)) / (
        np.abs(np.asarray(off)) + 1e-2
    )
    assert np.median(rel) < 0.02, np.median(rel)


def test_ln_quant_out_with_x_quant_input(data, monkeypatch):
    """ln_quant_out on a consumer that ITSELF takes an x_quant payload (the
    env-gated attention-handoff attn_out variant): kernel == twin."""
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    x, w, bias, *_ , res = data
    payload, scales = _group_quantize(x, 1)
    got_v, got_p, got_s = quant_matmul(
        None, w, bias=bias, residual=res, out_dtype=jnp.float32,
        x_quant=(payload, scales), ln_quant_out=True,
    )
    wq, ws = quantize_weights(w)
    ref_v, ref_p, ref_s = _qmm_reference(
        payload, wq, ws, bias, res, ln=False, act=None, residual=True,
        ln_eps=1e-6, out_dtype=jnp.float32, x_scales=scales, ln_out=True,
    )
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=2e-2, atol=2e-2)
    got = np.asarray(got_p, np.float32) * np.asarray(got_s)
    ref = np.asarray(ref_p, np.float32) * np.asarray(ref_s)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_ln_quant_out_split_shapes_still_return_triple():
    """A qkv-like shape that would route to the split path must NOT swallow
    ln_quant_out (the split path returns a single array)."""
    import numpy as np2

    rng = np2.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(512, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 768)) * 0.05, jnp.float32)
    g = jnp.ones((256,), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    out = quant_matmul(x, w, ln_scale=g, ln_bias=b, out_dtype=jnp.float32,
                       ln_quant_out=True)
    assert isinstance(out, tuple) and len(out) == 3
    assert out[1].dtype == jnp.int8


def test_ln_quant_out_partitions_under_data_mesh(rng, _mesh_cleanup):
    """ln_quant_out producer -> x_quant_normalized consumer under a data
    mesh: the three producer outputs shard over the batch axis and the chain
    matches the no-mesh result."""
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh
    from transparent_object_detection_tpu.parallel import batch_sharding, make_mesh

    x = jnp.asarray(rng.normal(size=(8, 64, 256)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(256, 256)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(256, 512)) * 0.05, jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(256,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(256,)), jnp.float32)

    def chain(xx):
        t, p, s = quant_matmul(xx, w1, residual=xx, out_dtype=jnp.float32,
                               ln_quant_out=True)
        z = quant_matmul(None, w2, ln_scale=gamma, ln_bias=beta, act="gelu",
                         out_dtype=jnp.float32, x_quant=(p, s),
                         x_quant_normalized=True)
        return t, z

    base_t, base_z = chain(x)
    mesh = make_mesh()
    set_compute_mesh(mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    got_t, got_z = chain(xs)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(base_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_z), np.asarray(base_z),
                               rtol=1e-5, atol=1e-5)


def test_pick_layout_prequant_kills_weight_streaming():
    """The production mlp2 shapes: h2 fits weight-resident N-inner tiles;
    the wide-K h1 shape (16.8 MB int8 weights) flips to M-inner so the
    weights stream once per outer step instead of once per m-tile."""
    m_in, bm, bn = qmm_mod._pick_layout_prequant(204800, 6144, 1536, 8, True)
    assert (m_in, bn) == (False, 1536)  # weight-resident
    m_in2, bm2, bn2 = qmm_mod._pick_layout_prequant(51200, 8192, 2048, 16, True)
    assert m_in2 is True


def test_handoff_chain_partitions_under_data_mesh(rng, _mesh_cleanup):
    """quant_out producer -> x_quant consumer under a data mesh: both ends
    shard_map over the batch axis (two outputs on the producer) and match
    the no-mesh result."""
    from transparent_object_detection_tpu.ops.shard import set_compute_mesh
    from transparent_object_detection_tpu.parallel import batch_sharding, make_mesh

    x = jnp.asarray(rng.normal(size=(8, 64, 256)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(256, 512)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(512, 256)) * 0.05, jnp.float32)

    def chain(xx):
        z8 = quant_matmul(xx, w1, act="gelu", quant_out=True)
        return quant_matmul(None, w2, residual=xx, out_dtype=jnp.float32,
                            x_quant=z8)

    base = chain(x)
    mesh = make_mesh()
    set_compute_mesh(mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = chain(xs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------- w4a4


def test_w4a4_twin_close_to_fp32(data):
    """quant_matmul_w4a4 (CPU twin: int8 containers holding [-7,7] values,
    identical accumulation math to the TPU i4 x i4 program) tracks the fp32
    LN+Dense+gelu oracle within 4-bit quantization error. Per-element error
    is necessarily coarser than int8 (~2x the levels removed); whether it
    MATTERS is measured end-to-end by the hard-set drift gate
    (E2E_HARD=1 benchmarks/validate_e2e.py), not by this tolerance."""
    from transparent_object_detection_tpu.ops.quant_matmul import quant_matmul_w4a4

    x, w, bias, gamma, beta, _ = data
    got = quant_matmul_w4a4(
        x, w, bias=bias, ln_scale=gamma, ln_bias=beta, act="gelu",
        out_dtype=jnp.float32,
    )
    ref = _dense_oracle(x, w, bias, gamma, beta, "gelu")
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-2
    )
    assert np.median(rel) < 0.2
    assert rel.mean() < 0.5


def test_w4a4_quant_out_feeds_mlp2_x_quant(data):
    """The w4a4 mlp1 handoff contract: quant_out emits (int8 payload,
    per-row scales) that quant_matmul's x_quant consumer (groups=1 direct
    path — the mlp2 shape class) ingests, matching the fp32 two-layer
    chain within combined quantization error."""
    from transparent_object_detection_tpu.ops.quant_matmul import quant_matmul_w4a4

    x, w, bias, gamma, beta, _ = data
    k = x.shape[-1]
    n = w.shape[-1]
    w2 = jnp.asarray(
        np.random.default_rng(7).normal(size=(n, k)) * 0.05, jnp.float32
    )
    z8 = quant_matmul_w4a4(
        x, w, bias=bias, ln_scale=gamma, ln_bias=beta, act="gelu",
        quant_out=True,
    )
    assert z8[0].dtype == jnp.int8 and z8[1].shape == (x.shape[0], 1)
    got = quant_matmul(None, w2, x_quant=z8, out_dtype=jnp.float32)
    ref = _dense_oracle(x, w, bias, gamma, beta, "gelu") @ w2
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-2
    )
    assert np.median(rel) < 0.2


def test_w4a4_batched_and_no_ln(data):
    """(B, N, K) inputs flatten/unflatten; the no-LN path quantizes raw x."""
    from transparent_object_detection_tpu.ops.quant_matmul import quant_matmul_w4a4

    x, w, bias, *_ = data
    x3 = x.reshape(2, 128, -1)
    out = quant_matmul_w4a4(x3, w, bias=bias, out_dtype=jnp.float32)
    assert out.shape == (2, 128, w.shape[-1])
    ref = _dense_oracle(x, w, bias)
    rel = np.abs(np.asarray(out).reshape(ref.shape) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-2
    )
    assert np.median(rel) < 0.2
