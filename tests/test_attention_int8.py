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


# ---------------------------------------------------------------------------
# int8 handoff variant (qkv payload in, optional int8 + head scales out)
# ---------------------------------------------------------------------------


def _group_quantize_tokens(x, groups):
    """(B, N, C) -> per-(row, C/groups-group) int8 payload + scales, the
    quant_out emission format of ops/quant_matmul.py."""
    b, n, c = x.shape
    g = c // groups
    x3 = np.asarray(x, np.float32).reshape(b, n, groups, g)
    amax = np.maximum(np.abs(x3).max(axis=-1, keepdims=True), 1e-30)
    payload = np.round(x3 * (127.0 / amax)).astype(np.int8).reshape(b, n, c)
    scales = (amax[..., 0] / 127.0).astype(np.float32)
    return jnp.asarray(payload), jnp.asarray(scales)


@pytest.mark.parametrize("groups_per_c,quant_out", [(1, True), (2, True), (2, False)])
def test_handoff_matches_reference(rng, groups_per_c, quant_out, monkeypatch):
    """teb_attention_handoff == per-head fp32 oracle within int8 tolerance,
    for per-row (G=1) and per-group scales, int8 and bf16 output."""
    monkeypatch.setattr(a8, "INTERPRET", True)
    b, n, heads, dh = 1, 128, 2, 128
    c = heads * dh
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * c)), jnp.float32)
    groups = 1 if groups_per_c == 1 else 3 * c // dh  # g = dh
    payload, scales = _group_quantize_tokens(qkv, groups)
    scale = 1.0 / dh**0.5
    out = a8.teb_attention_handoff(
        payload, scales, heads, scale, quant_out=quant_out,
        out_dtype=jnp.float32,
    )
    assert out is not None
    if quant_out:
        o8, os_ = out
        assert o8.dtype == jnp.int8 and os_.shape == (b, n, heads)
        got = np.asarray(o8, np.float32).reshape(b, n, heads, dh) * np.asarray(
            os_
        )[..., None]
        got = got.reshape(b, n, c)
    else:
        got = np.asarray(out, np.float32)
    q, k, v = jnp.split(qkv.astype(jnp.bfloat16), 3, axis=-1)
    ref = np.asarray(_per_head_reference(q, k, v, scale, heads))
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-2)
    assert np.median(rel) < 0.05, np.median(rel)
    assert rel.mean() < 0.12


def test_handoff_rejects_misaligned_groups(rng, monkeypatch):
    """Scale groups that split a head -> None (caller dequantizes)."""
    monkeypatch.setattr(a8, "INTERPRET", True)
    b, n, heads, dh = 1, 128, 2, 128
    c = heads * dh
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * c)), jnp.float32)
    payload, scales = _group_quantize_tokens(qkv, 3 * c // 64)  # g=64 < dh
    out = a8.teb_attention_handoff(payload, scales, heads, 0.1)
    assert out is None


def test_teb_int8_attn_handoff_path_close_to_bf16(rng, monkeypatch):
    """TransformerEncoderBlock with int8_dense+int8_attn routes through the
    handoff (interpret mode) and stays close to the bf16 TEB."""
    import transparent_object_detection_tpu.ops.quant_matmul as qmm_mod
    from transparent_object_detection_tpu.models.blocks import (
        TransformerEncoderBlock,
    )

    monkeypatch.setattr(a8, "INTERPRET", True)
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    # default-off on v5e (net loss vs the split-qkv path, see blocks.py);
    # force it on so the full handoff routing stays covered
    monkeypatch.setenv("TOD_ATTN_HANDOFF", "1")
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 128)), jnp.float32)  # N=2304
    teb8 = TransformerEncoderBlock(
        num_heads=1, dtype=jnp.float32, int8_dense=True, int8_attn=True,
    )
    teb = TransformerEncoderBlock(num_heads=1, dtype=jnp.float32)
    variables = teb.init(jax.random.key(0), x, train=False)
    base = np.asarray(teb.apply(variables, x, train=False))
    got = np.asarray(teb8.apply(variables, x, train=False))
    rel = np.abs(got - base) / (np.abs(base) + 1e-1)
    assert np.median(rel) < 0.05, np.median(rel)


def test_quant_out_variant_matches_bf16_output_kernel(rng, monkeypatch):
    """attention_int8_quant_out's dequantized (payload, per-(row, head)
    scales) == the bf16-output int8 kernel within per-head quantization
    error (the per-head quantize replaces attn_out's per-row prologue
    quantize of the same values — see _mha_flash_int8_qout_kernel)."""
    import transparent_object_detection_tpu.ops.quant_matmul as qmm_mod

    monkeypatch.setattr(a8, "INTERPRET", True)
    b, n, heads, dh = 2, 128, 4, 128
    c = heads * dh
    mk = lambda s: jnp.asarray(
        rng.normal(size=(b, n, c)) * 0.4, jnp.float32
    ).astype(jnp.bfloat16)
    q, k, v = mk(0), mk(1), mk(2)
    out = a8.attention_int8_quant_out(q, k, v, scale=0.08, num_heads=heads)
    assert out is not None
    payload, scales = out
    assert payload.dtype == jnp.int8 and scales.shape == (b, n, heads)
    bq, bk = pick_blocks(n, c, heads, cv=c)
    ref = a8.flash_attention_mha_int8(q, k, v, heads, 0.08, bq, bk)
    deq = np.asarray(
        qmm_mod.dequantize(payload, scales, dtype=jnp.float32)
    )
    rel = np.abs(deq - np.asarray(ref, np.float32)).max() / (
        np.abs(np.asarray(ref, np.float32)).max() + 1e-9
    )
    assert rel < 0.02, rel


def test_teb_attention_qout_path_close_to_bf16(rng, monkeypatch):
    """TEB routes attention -> attn_out through the output-side handoff
    (TOD_ATTN_QOUT=1, interpret mode) and stays close to the bf16 TEB.
    Default OFF on v5e: measured a wash/slight loss e2e (140.1 vs 140.9
    imgs/s batch-32 phi='s') — the attention kernel is VPU-bound, so the
    h-inner grid + one-hot scale writes cost what the saved o round trip
    buys; kept env-gated for future VPU-lighter kernels."""
    import transparent_object_detection_tpu.ops.quant_matmul as qmm_mod
    from transparent_object_detection_tpu.models.blocks import (
        TransformerEncoderBlock,
    )

    monkeypatch.setattr(a8, "INTERPRET", True)
    monkeypatch.setattr(qmm_mod, "INTERPRET", True)
    monkeypatch.setenv("TOD_ATTN_QOUT", "1")
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 128)), jnp.float32)  # N=2304
    teb8 = TransformerEncoderBlock(
        num_heads=1, dtype=jnp.float32, int8_dense=True, int8_attn=True,
    )
    teb = TransformerEncoderBlock(num_heads=1, dtype=jnp.float32)
    variables = teb.init(jax.random.key(0), x, train=False)
    base = np.asarray(teb.apply(variables, x, train=False))
    got = np.asarray(teb8.apply(variables, x, train=False))
    rel = np.abs(got - base) / (np.abs(base) + 1e-1)
    assert np.median(rel) < 0.05, np.median(rel)
