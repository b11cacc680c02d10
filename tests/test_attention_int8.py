"""int8 flash attention kernel (ops/attention_int8.py) — interpreter mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transparent_object_detection_tpu.ops.attention_int8 as a8
from transparent_object_detection_tpu.ops.attention import reference_attention
from transparent_object_detection_tpu.ops.attention_int8 import (
    attention_int8,
    pick_blocks,
)


def _per_head_reference(q, k, v, scale, heads):
    b, n, c = q.shape
    dh = c // heads
    fold = lambda t: t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3).reshape(
        b * heads, n, dh
    ).astype(jnp.float32)
    out = reference_attention(fold(q), fold(k), fold(v), scale)
    return out.reshape(b, heads, n, dh).transpose(0, 2, 1, 3).reshape(b, n, c)


@pytest.mark.parametrize("heads,blocks", [(2, (64, 64)), (1, (128, 256)), (2, (256, 128))])
def test_matches_reference_within_quant_error(rng, heads, blocks, monkeypatch):
    monkeypatch.setattr(a8, "INTERPRET", True)
    b, n, dh = 2, 256, 128
    c = heads * dh
    mk = lambda s: jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32).astype(
        jnp.bfloat16
    )
    q, k, v = mk(0), mk(1), mk(2)
    scale = 1.0 / dh**0.5
    out = attention_int8(q, k, v, scale, heads, *blocks)
    ref = _per_head_reference(q, k, v, scale, heads)
    rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-2
    )
    # int8 q/k scores + int8 softmax weights: ~1-2% median expected
    assert np.median(rel) < 0.05
    assert rel.mean() < 0.10


def test_extreme_scale_rows_stable(monkeypatch):
    """Rows with huge magnitude disparity don't NaN/overflow."""
    monkeypatch.setattr(a8, "INTERPRET", True)
    b, n, heads, dh = 1, 128, 1, 128
    q = jnp.ones((b, n, dh), jnp.bfloat16) * 30.0
    k = jnp.concatenate(
        [jnp.ones((b, n // 2, dh), jnp.bfloat16) * 50.0,
         jnp.ones((b, n // 2, dh), jnp.bfloat16) * 1e-4], axis=1
    )
    v = jnp.ones((b, n, dh), jnp.bfloat16)
    out = attention_int8(q, k, v, 1.0 / dh**0.5, heads, 64, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    # all-equal v => output ~= 1 regardless of weights
    np.testing.assert_allclose(np.asarray(out, np.float32), 1.0, atol=0.05)


def test_pick_blocks_rules():
    # dh must be a 128 multiple
    assert pick_blocks(6400, 1536, 6) is not None   # dh=256
    assert pick_blocks(6400, 1536, 8) is None       # dh=192
    # N with no 32-aligned divisor -> None
    assert pick_blocks(400, 2048, 8) is None
    # blocks divide N and are 32-aligned
    bq, bk = pick_blocks(6400, 1536, 6)
    assert 6400 % bq == 0 and 6400 % bk == 0
    assert bq % 32 == 0 and bk % 32 == 0


def test_dispatcher_falls_back_when_untileable(rng):
    """attention(int8=True) on an untileable map returns the bf16 result."""
    from transparent_object_detection_tpu.ops.attention import attention

    b, n, c, heads = 1, 400, 256, 2  # no 32-divisor of 400
    mk = lambda: jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    out = attention(q, k, v, scale=0.1, num_heads=heads, int8=True)
    ref = attention(q, k, v, scale=0.1, num_heads=heads, int8=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def _asym_reference(q, k, v, scale, heads):
    b, n, cq = q.shape
    cv = v.shape[2]
    dq, dv = cq // heads, cv // heads
    foldq = lambda t, d: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3).reshape(
        b * heads, n, d
    ).astype(jnp.float32)
    out = reference_attention(foldq(q, dq), foldq(k, dq), foldq(v, dv), scale)
    return out.reshape(b, heads, n, dv).transpose(0, 2, 1, 3).reshape(b, n, cv)


@pytest.mark.parametrize("heads,dq,dv", [(1, 64, 512), (2, 32, 128)])
def test_asymmetric_qk_v_widths(rng, heads, dq, dv, monkeypatch):
    """dq != dv (the backbone SelfAttention layout: qk at C/8, v at C)."""
    monkeypatch.setattr(a8, "INTERPRET", True)
    b, n = 1, 128
    mk = lambda c: jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32).astype(
        jnp.bfloat16
    )
    q, k, v = mk(heads * dq), mk(heads * dq), mk(heads * dv)
    out = attention_int8(q, k, v, 1.0, heads, 64, 64)
    assert out is not None and out.shape == (b, n, heads * dv)
    ref = _asym_reference(q, k, v, 1.0, heads)
    rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-2
    )
    assert np.median(rel) < 0.05
    assert rel.mean() < 0.10


def test_pick_blocks_asymmetric_rules():
    # SelfAttention shape: qk C/8=64 (32-aligned), v 512 (128-aligned) -> ok
    assert pick_blocks(6400, 64, 1, cv=512) is not None
    # v head dim not 128-aligned -> fall back
    assert pick_blocks(6400, 64, 1, cv=192) is None
    # qk head dim not 32-aligned -> fall back
    assert pick_blocks(6400, 48, 1, cv=512) is None
