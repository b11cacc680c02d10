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
     (False, None, True), (True, "gelu", True)],
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
