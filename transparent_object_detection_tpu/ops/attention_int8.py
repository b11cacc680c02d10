"""int8 flash attention — serving-path Pallas kernel.

Halves the MXU time of the neck's dominant attention (80x80 = 6,400 tokens
at C=1536 is ~0.25 TFLOP/img of score math) by running both score and
output matmuls as int8 x int8 -> int32 (2x the bf16 MXU rate on v5e), while
keeping the online-softmax statistics in f32.

Quantization layout is chosen so the dequantization stays off the VPU hot
path (the score-tile elementwise work is what bounds an int8 flash kernel):

  * q: per-row (per-query) int8, quantized in VMEM once per q-tile; the
    row scale folds into the score dequant as a rank-1 multiply.
  * k, v: per-(batch, head, kv-block) scalar scales, pre-quantized OUTSIDE
    the kernel in one XLA pass — the kernel then streams int8 k/v from HBM
    (half the bytes of the bf16 kernel) and dequantizes scores by a scalar.
  * p (softmax weights): p = exp(s - rowmax) <= 1, so a FIXED scale of 127
    quantizes it — no per-row max/divide, just round(p * 127). The p @ v
    dot dequantizes by the scalar vs_block / 127.

Accuracy: int8 q/k scores carry ~1% relative error pre-softmax and the p
quantization drops weights below 1/254 — both validated end-to-end (see
benchmarks/validate_e2e.py E2E_INT8 mode, which asserts mAP parity with the
bf16 path). Serving-only: training takes the bf16 flash VJP path.

Replaces the FLOP-heaviest part of the reference's neck/backbone attention
(reference model/blocks.py:226-289, fp32 torch matmuls).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# Flip to run through the Pallas interpreter (CPU tests).
INTERPRET = False


def _quantize_kv(x: Array, num_heads: int, block_k: int) -> Tuple[Array, Array]:
    """(B, N, H*dh) bf16 -> ((B, N, H*dh) int8, (B, H, N/bk) f32 scales).

    Scales are absmax over each (kv-block, head) slab / 127 — coarse on
    purpose: the kernel dequantizes with a scalar instead of a vector.
    """
    b, n, c = x.shape
    dh = c // num_heads
    xf = x.astype(jnp.float32).reshape(b, n // block_k, block_k, num_heads, dh)
    s = jnp.max(jnp.abs(xf), axis=(2, 4)) / 127.0  # (B, nk, H)
    s = jnp.maximum(s, 1e-12)
    xq = jnp.round(xf / s[:, :, None, :, None]).astype(jnp.int8)
    return xq.reshape(b, n, c), s.transpose(0, 2, 1)  # scales (B, H, nk)


def _mha_flash_int8_kernel(
    q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
    qq_scr, qs_scr, m_scr, l_scr, acc_scr, *, scale: float,
):
    """(batch, head, q-block, kv-block) grid step; kv innermost/sequential.

    Refs: q (1, bq, dh) bf16; kq/vq (1, bk, dh) int8; ks/vs (1, H, nk) f32
    full per-batch scale tables (tiny; a (1,1,1) block would violate the
    TPU (8,128) block-tiling rule) indexed by the head/kv-block program
    ids; o (1, bq, dh) bf16.
    Scratch: qq (bq, dh) int8, qs (bq, 128) f32, m/l (bq, 128) f32,
    acc (bq, dh) f32.
    """
    hi = pl.program_id(1)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        qf = q_ref[0].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-12)
        # multiply by the per-row reciprocal scale — no per-element divide
        qq_scr[...] = jnp.round(qf * (127.0 / amax)).astype(jnp.int8)
        qs_scr[:, 0:1] = amax * (1.0 / 127.0)

    s32 = jax.lax.dot_general(
        qq_scr[...], kq_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, bk) int8 MXU
    # rank-1 dequant: per-row q scale x scalar (k-block scale * softmax scale)
    row_scale = qs_scr[:, 0:1] * (ks_ref[0, hi, ki] * (scale * 1.4426950408889634))  # (bq, 1)
    s = s32.astype(jnp.float32) * row_scale

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # fold the fixed p-quantization scale into the exp: p127 = 127 * p.
    # l accumulates in 127-units; the final o = acc/l cancels the factor.
    # exp2 domain: the ×log2(e) that exp() would apply per element is folded
    # into row_scale above (one (bq, 1) multiply instead of (bq, bk)) — the
    # VPU transcendental is exp2 natively, so this is the same function with
    # one fewer full-tile multiply pass. 6.9886... = log2(127).
    p127 = jax.lax.exp2(s - (m_new - 6.988684686772166))
    correction = jax.lax.exp2(m_prev - m_new)
    l_scr[:, 0:1] = l_prev * correction + jnp.sum(p127, axis=-1, keepdims=True)
    pq = jnp.round(p127).astype(jnp.int8)
    pv32 = jax.lax.dot_general(
        pq, vq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, dh) int8 MXU
    # acc is 127-scaled like l (pq ~ 127 p), so the final acc/l cancels it
    acc_scr[:] = acc_scr[:] * correction + pv32.astype(jnp.float32) * vs_ref[0, hi, ki]
    m_scr[:, 0:1] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        # per-row reciprocal (bq divides) instead of a (bq, dh) divide
        o_ref[0] = (acc_scr[:] * (1.0 / l_scr[:, 0:1])).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_q", "block_k", "q_width")
)
def flash_attention_mha_int8(
    q: Array, k: Array, v: Array, num_heads: int, scale: float,
    block_q: int, block_k: int, q_width: Optional[int] = None,
) -> Array:
    """int8 streaming attention on head-packed (B, N, H*dh) bf16 arrays.

    q/k may have a different channel width than v (e.g. the backbone
    SelfAttention: qk at C/8, v at C). The v head dim must be a multiple
    of 128 and N a multiple of the (32-aligned) blocks — the `attention`
    dispatcher guarantees this before calling.

    `q_width`: when the q operand is the PACKED (B, N, 3C) qkv projection
    output (attention.attention_qkv — avoids the jnp.split copies), the
    logical q width C. The q section occupies block-columns [0, H) of the
    packed array, so the q index map is unchanged; only the head-dim shape
    math needs the logical width.
    """
    from jax.experimental.pallas import tpu as pltpu

    b, n, cq = q.shape
    if q_width is not None:
        cq = q_width
    cv = v.shape[2]
    dq = cq // num_heads
    dv = cv // num_heads
    kq, ks = _quantize_kv(k, num_heads, block_k)
    vq, vs = _quantize_kv(v, num_heads, block_k)
    grid = (b, num_heads, n // block_q, n // block_k)
    return pl.pallas_call(
        functools.partial(_mha_flash_int8_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dq), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_k, dq), lambda bi, hi, qi, ki: (bi, ki, hi)),
            pl.BlockSpec(
                (1, num_heads, n // block_k), lambda bi, hi, qi, ki: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, block_k, dv), lambda bi, hi, qi, ki: (bi, ki, hi)),
            pl.BlockSpec(
                (1, num_heads, n // block_k), lambda bi, hi, qi, ki: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda bi, hi, qi, ki: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, n, cv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, dq), jnp.int8),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, kq, ks, vq, vs)


def _mha_flash_int8_qout_kernel(
    q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, os_ref,
    qq_scr, qs_scr, m_scr, l_scr, acc_scr, *, scale: float,
):
    """Base int8 kernel variant emitting int8 output + per-(row, head) scales.

    Same math as _mha_flash_int8_kernel (bf16 q quantized in the ki == 0
    prologue, k/v pre-quantized per block by _quantize_kv), but the grid is
    (batch, q-block, head, kv-block) — head INSIDE q — so the (1, bq, H)
    output-scales block is revisited on consecutive steps and stays in VMEM
    until every head has one-hot-written its column (same layout trick as
    _mha_flash_int8_handoff_kernel). The consumer is the attn_out
    projection's x_quant path (ops/quant_matmul.py, groups == H): the
    (B, N, C) bf16 o intermediate never round-trips HBM, and attn_out's
    bf16 quantize prologue becomes an int8 rescale. The per-head quantize
    here replaces (not adds to) the per-row quantize attn_out's prologue
    would have applied to the same values, so the rounding-noise class is
    unchanged (plus one <=0.4%-of-rowmax requant round in the consumer).
    """
    hi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        qf = q_ref[0].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-12)
        qq_scr[...] = jnp.round(qf * (127.0 / amax)).astype(jnp.int8)
        qs_scr[:, 0:1] = amax * (1.0 / 127.0)

    s32 = jax.lax.dot_general(
        qq_scr[...], kq_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    row_scale = qs_scr[:, 0:1] * (ks_ref[0, hi, ki] * (scale * 1.4426950408889634))
    s = s32.astype(jnp.float32) * row_scale

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # exp2 domain: the ×log2(e) that exp() would apply per element is folded
    # into row_scale above (one (bq, 1) multiply instead of (bq, bk)) — the
    # VPU transcendental is exp2 natively, so this is the same function with
    # one fewer full-tile multiply pass. 6.9886... = log2(127).
    p127 = jax.lax.exp2(s - (m_new - 6.988684686772166))
    correction = jax.lax.exp2(m_prev - m_new)
    l_scr[:, 0:1] = l_prev * correction + jnp.sum(p127, axis=-1, keepdims=True)
    pq = jnp.round(p127).astype(jnp.int8)
    pv32 = jax.lax.dot_general(
        pq, vq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_scr[:] = acc_scr[:] * correction + pv32.astype(jnp.float32) * vs_ref[0, hi, ki]
    m_scr[:, 0:1] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o = acc_scr[:] * (1.0 / l_scr[:, 0:1])  # (bq, dv) f32
        amax = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-30)
        o_ref[0] = jnp.round(o * (127.0 / amax)).astype(jnp.int8)
        colh = jax.lax.broadcasted_iota(jnp.int32, os_ref.shape[1:], 1)
        os_ref[0] = jnp.where(colh == hi, amax * (1.0 / 127.0), os_ref[0])


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_q", "block_k")
)
def flash_attention_mha_int8_qout(
    q: Array, k: Array, v: Array, num_heads: int, scale: float,
    block_q: int, block_k: int,
) -> Tuple[Array, Array]:
    """int8 streaming attention on head-packed bf16 (B, N, H*dh) arrays,
    emitting (int8 payload (B, N, Cv), f32 per-(row, head) scales (B, N, H))
    for a quant_matmul x_quant consumer. See _mha_flash_int8_qout_kernel."""
    from jax.experimental.pallas import tpu as pltpu

    b, n, cq = q.shape
    cv = v.shape[2]
    dq = cq // num_heads
    dv = cv // num_heads
    h = num_heads
    kq, ks = _quantize_kv(k, num_heads, block_k)
    vq, vs = _quantize_kv(v, num_heads, block_k)
    grid = (b, n // block_q, h, n // block_k)
    return pl.pallas_call(
        functools.partial(_mha_flash_int8_qout_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dq), lambda bi, qi, hi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_k, dq), lambda bi, qi, hi, ki: (bi, ki, hi)),
            pl.BlockSpec(
                (1, h, n // block_k), lambda bi, qi, hi, ki: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, block_k, dv), lambda bi, qi, hi, ki: (bi, ki, hi)),
            pl.BlockSpec(
                (1, h, n // block_k), lambda bi, qi, hi, ki: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dv), lambda bi, qi, hi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_q, h), lambda bi, qi, hi, ki: (bi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, cv), jnp.int8),
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dq), jnp.int8),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, kq, ks, vq, vs)


def attention_int8_quant_out(
    q: Array, k: Array, v: Array, scale: float, num_heads: int,
) -> Optional[Tuple[Array, Array]]:
    """Dispatch wrapper for the quant_out attention variant: returns
    (payload, per-(row, head) scales) for quant_matmul's x_quant path, or
    None when shapes don't tile / backend is not TPU (caller falls back to
    the bf16-output kernel)."""
    ok_backend = jax.default_backend() in ("tpu", "axon") or INTERPRET
    if not ok_backend:
        return None
    blocks = pick_blocks(
        q.shape[1], q.shape[2], num_heads, cv=v.shape[2]
    )
    if blocks is None:
        return None

    from transparent_object_detection_tpu.ops.attention import _log_flash_launch
    from transparent_object_detection_tpu.ops.shard import maybe_shard_map

    b, n, cq = q.shape
    _log_flash_launch(b, n, cq, v.shape[2], int8=True)

    def local(q_l, k_l, v_l):
        return flash_attention_mha_int8_qout(
            q_l, k_l, v_l, num_heads=num_heads, scale=scale,
            block_q=blocks[0], block_k=blocks[1],
        )

    launch = maybe_shard_map(local, n_out=2)
    return launch(q, k, v)


def _block32(n: int, preferred: int) -> Optional[int]:
    """Largest block <= preferred dividing n, multiple of 32 (int8 sublane)."""
    for b in range(min(preferred, n) // 32 * 32, 31, -32):
        if n % b == 0:
            return b
    return None


def pick_blocks(
    n: int, cq: int, num_heads: int,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
    cv: Optional[int] = None,
) -> Optional[Tuple[int, int]]:
    """(bq, bk) for the int8 kernel, or None when shapes don't tile (the
    caller falls back to the bf16 path). Blocks are 32-aligned (int8 sublane
    tiling) divisors of N; the v head dim must be a 128-lane multiple (the
    qk head dim only 32 — e.g. the backbone SelfAttention's dq=64).

    Measured on v5e at the phi='s' h2 shape (N=6400, 6x256): a FULL-WIDTH kv
    block (one sequential step — the running-max/normalizer rescale work
    disappears and int8 k/v tiles are half-size) runs 40.8 ms vs 68.9 ms for
    bk=3200 and 57.4 ms for the bf16 kernel: 197 TOPS. So bk defaults to N
    (capped at 6400 so the f32 score tile stays inside VMEM), with a
    narrower q block when kv is wide."""
    if cv is None:
        cv = cq
    if (
        num_heads < 1 or cq % num_heads or cv % num_heads
        or (cv // num_heads) % 128 or (cq // num_heads) % 32
    ):
        return None
    dq, dv = cq // num_heads, cv // num_heads
    if block_k is None:
        block_k = n if n <= 6400 else 6400
    if block_q is None:
        block_q = 320 if block_k >= 3200 else 512
    bq = _block32(n, block_q)
    bk = _block32(n, block_k)
    if bq is None or bk is None:
        return None
    # VMEM model: persistent tiles plus the transient (bq, bk) f32 score
    # tile (8.2 MB at the validated bq=320/bk=6400 — omitting it made
    # unvalidated shape combos compile-fail instead of shrinking blocks).
    # Budget calibrated so the validated configs (320/6400 -> 15.1 MiB,
    # 512/<=3200) still pass against the ~16 MiB v5e VMEM.
    def vmem(bq_, bk_):
        return (
            2 * bk_ * (dq + dv)                # double-buffered int8 k/v tiles
            + bq_ * (2 * dq + dq + 4 * dv)     # q bf16 + qq int8 + acc f32
            + 4 * 3 * bq_ * 128                # m/l/qs scratch
            + bq_ * bk_ * 4                    # transient f32 score tile
        )
    budget = 15 * 1024 * 1024 + 512 * 1024
    # Wide head dims (phi='l'/'x' backbone SelfAttention: dv = C = 2048+)
    # bust the budget through the kv tiles alone — shrinking bq can never
    # fix that, so narrow the kv block first (full-width kv is a
    # performance preference, not a requirement; the running-max rescale
    # returns but the kernel stays correct at any block).
    while bk and bk > 128 and 2 * bk * (dq + dv) > budget // 2:
        bk = _block32(n, bk - 32)
    while bq and bk and vmem(bq, bk) > budget and bq > 32:
        bq = _block32(n, bq - 32)
    while bq and bk and vmem(bq, bk) > budget and bk > 128:
        bk = _block32(n, bk - 32)
    if not bq or not bk or bq < 32 or vmem(bq, bk) > budget:
        return None
    return bq, bk


def attention_int8(
    q: Array, k: Array, v: Array, scale: float, num_heads: int,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
) -> Optional[Array]:
    """Dispatch wrapper: int8 flash when shapes tile cleanly, else None."""
    blocks = pick_blocks(
        q.shape[1], q.shape[2], num_heads, block_q, block_k, cv=v.shape[2]
    )
    if blocks is None:
        return None
    return flash_attention_mha_int8(q, k, v, num_heads, scale, *blocks)


# ---------------------------------------------------------------------------
# int8 handoff variant: consumes the qkv projection's int8 payload directly
# (ops/quant_matmul.py quant_out=True) and optionally emits its output as
# int8 + per-(row, head) scales for the attn_out projection's x_quant path.
# The (B, N, 3C) bf16 qkv intermediate then never exists in HBM: q is read
# as int8 with ZERO copies (a column-offset index map into the fused
# payload), k/v are REquantized int8->int8 onto per-(batch, head, kv-block)
# scalars (half the traffic of the bf16->int8 quantize pass it replaces),
# and the q-tile quantize pass disappears from the kernel prologue.
# ---------------------------------------------------------------------------


def _mha_flash_int8_handoff_kernel(
    qq_ref, qs_ref, kq_ref, ks_ref, vq_ref, vs_ref, *out_refs,
    scale: float, quant_out: bool,
):
    """(batch, q-block, head, kv-block) grid step; kv innermost/sequential.

    vs the base kernel (_mha_flash_int8_kernel): q arrives int8 with a
    per-(row, head) scale TABLE qs (1, bq, H) f32 — the head's column is
    one-hot selected at ki == 0 (a dynamic lane slice can't be proven
    aligned) — and the head axis sits INSIDE the q axis so the optional
    int8 output-scales block (1, bq, H), revisited across heads, stays in
    VMEM until all heads have written their column.
    """
    o_ref = out_refs[0]
    os_ref = out_refs[1] if quant_out else None
    qsel_scr, m_scr, l_scr, acc_scr = out_refs[2 if quant_out else 1:]

    hi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        qs_blk = qs_ref[0]  # (bq, H)
        col = jax.lax.broadcasted_iota(jnp.int32, qs_blk.shape, 1)
        qsel_scr[:, 0:1] = jnp.sum(
            jnp.where(col == hi, qs_blk, 0.0), axis=1, keepdims=True
        )

    s32 = jax.lax.dot_general(
        qq_ref[0], kq_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, bk) int8 MXU
    row_scale = qsel_scr[:, 0:1] * (
        ks_ref[0, hi, ki] * (scale * 1.4426950408889634)
    )  # (bq, 1); log2(e) folded for the exp2-domain softmax
    s = s32.astype(jnp.float32) * row_scale

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # exp2 domain: the ×log2(e) that exp() would apply per element is folded
    # into row_scale above (one (bq, 1) multiply instead of (bq, bk)) — the
    # VPU transcendental is exp2 natively, so this is the same function with
    # one fewer full-tile multiply pass. 6.9886... = log2(127).
    p127 = jax.lax.exp2(s - (m_new - 6.988684686772166))
    correction = jax.lax.exp2(m_prev - m_new)
    l_scr[:, 0:1] = l_prev * correction + jnp.sum(p127, axis=-1, keepdims=True)
    pq = jnp.round(p127).astype(jnp.int8)
    pv32 = jax.lax.dot_general(
        pq, vq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_scr[:] = acc_scr[:] * correction + pv32.astype(jnp.float32) * vs_ref[0, hi, ki]
    m_scr[:, 0:1] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o = acc_scr[:] * (1.0 / l_scr[:, 0:1])  # (bq, dv) f32
        if quant_out:
            amax = jnp.maximum(
                jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-30
            )
            o_ref[0] = jnp.round(o * (127.0 / amax)).astype(jnp.int8)
            colh = jax.lax.broadcasted_iota(jnp.int32, os_ref.shape[1:], 1)
            os_ref[0] = jnp.where(colh == hi, amax * (1.0 / 127.0), os_ref[0])
        else:
            o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "scale", "block_q", "block_k", "quant_out", "out_dtype",
    ),
)
def flash_attention_int8_handoff(
    qkv_payload: Array,  # (B, N, >=Cq) int8; q = leading Cq columns
    qs: Array,           # (B, N, H) f32 per-(row, head) q scales
    kq: Array,           # (B, N, Cq) int8, requantized per kv-block
    ks: Array,           # (B, H, nk) f32
    vq: Array,           # (B, N, Cv) int8
    vs: Array,           # (B, H, nk) f32
    num_heads: int,
    scale: float,
    block_q: int,
    block_k: int,
    quant_out: bool,
    out_dtype=jnp.bfloat16,
):
    from jax.experimental.pallas import tpu as pltpu

    b, n, cv = vq.shape
    cq = kq.shape[2]
    dq = cq // num_heads
    dv = cv // num_heads
    h = num_heads
    grid = (b, n // block_q, h, n // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, dq), lambda bi, qi, hi, ki: (bi, qi, hi)),
        pl.BlockSpec((1, block_q, h), lambda bi, qi, hi, ki: (bi, qi, 0)),
        pl.BlockSpec((1, block_k, dq), lambda bi, qi, hi, ki: (bi, ki, hi)),
        pl.BlockSpec(
            (1, h, n // block_k), lambda bi, qi, hi, ki: (bi, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec((1, block_k, dv), lambda bi, qi, hi, ki: (bi, ki, hi)),
        pl.BlockSpec(
            (1, h, n // block_k), lambda bi, qi, hi, ki: (bi, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    if quant_out:
        out_specs = [
            pl.BlockSpec((1, block_q, dv), lambda bi, qi, hi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_q, h), lambda bi, qi, hi, ki: (bi, qi, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, n, cv), jnp.int8),
            jax.ShapeDtypeStruct((b, n, h), jnp.float32),
        ]
    else:
        out_specs = pl.BlockSpec(
            (1, block_q, dv), lambda bi, qi, hi, ki: (bi, qi, hi)
        )
        out_shape = jax.ShapeDtypeStruct((b, n, cv), out_dtype)
    return pl.pallas_call(
        functools.partial(
            _mha_flash_int8_handoff_kernel, scale=scale, quant_out=quant_out,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # selected q scale
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # normalizer
            pltpu.VMEM((block_q, dv), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(qkv_payload, qs, kq, ks, vq, vs)


def _requantize_section(
    payload: Array, scales: Array, col0: int, c: int, num_heads: int,
    block_k: int,
) -> Tuple[Array, Array]:
    """Requantize one int8 qkv section onto per-(batch, head, kv-block)
    scalar scales (the kernel's k/v format).

    payload (B, N, Ctot) int8 with per-(row, g-group) scales (B, N, G),
    g = Ctot/G; section = columns [col0, col0+c). Requires g % (c/H) == 0
    or G == 1 (checked by the caller) so each head's columns share one
    row-scale. ratio = row_scale / block_scale <= 1, so the re-round stays
    int8-exact in range; the added rounding is the same 0.4%-of-blockmax
    class as the bf16->int8 quantize pass this replaces (at HALF the HBM
    traffic: int8 in, int8 out)."""
    b, n, ctot = payload.shape
    g = ctot // scales.shape[-1]
    dh = c // num_heads
    nk = n // block_k
    sec = jax.lax.slice_in_dim(payload, col0, col0 + c, axis=2)
    # per-(row, head) scale of the section: the covering group's scale
    if scales.shape[-1] == 1:
        s_head = jnp.broadcast_to(scales, (b, n, num_heads))
    else:
        idx = [(col0 + hh * dh) // g for hh in range(num_heads)]
        s_head = jnp.take(scales, jnp.asarray(idx), axis=-1)  # (B, N, H)
    s_blk = jnp.max(
        s_head.reshape(b, nk, block_k, num_heads), axis=2
    )  # (B, nk, H)
    ratio = s_head.reshape(b, nk, block_k, num_heads) / jnp.maximum(
        s_blk[:, :, None, :], 1e-30
    )
    xq = jnp.round(
        sec.reshape(b, nk, block_k, num_heads, dh).astype(jnp.float32)
        * ratio[..., None]
    ).astype(jnp.int8)
    return xq.reshape(b, n, c), s_blk.transpose(0, 2, 1)  # (B, H, nk)


def teb_attention_handoff(
    payload: Array,      # (B, N, 3C) int8 fused-qkv payload
    scales: Array,       # (B, N, G) f32 per-(row, group) scales
    num_heads: int,
    scale: float,
    quant_out: bool = True,
    out_dtype=jnp.bfloat16,
):
    """Attention over a quant_out qkv projection, staying int8 end-to-end.

    Returns (o_payload int8, o_scales (B, N, H)) when quant_out (feed to
    quant_matmul(x_quant=...)), or a bf16 (B, N, C) array otherwise.
    Returns None when the handoff doesn't apply (shapes don't tile, scale
    groups don't align to heads, non-TPU backend) — the caller falls back
    to the dequantized bf16 path.
    """
    b, n, c3 = payload.shape
    c = c3 // 3
    h = num_heads
    if c % h:
        return None
    dh = c // h
    g = c3 // scales.shape[-1]
    ok_backend = jax.default_backend() in ("tpu", "axon") or INTERPRET
    aligned = scales.shape[-1] == 1 or (
        c % g == 0 and g % dh == 0
    )
    blocks = pick_blocks(n, c, h, cv=c)
    if not (ok_backend and aligned and blocks is not None):
        return None
    bq, bk = blocks

    if scales.shape[-1] == 1:
        qs = jnp.broadcast_to(scales, (b, n, h)).astype(jnp.float32)
    else:
        idx = jnp.asarray([(hh * dh) // g for hh in range(h)])
        qs = jnp.take(scales, idx, axis=-1).astype(jnp.float32)
    kq, ks = _requantize_section(payload, scales, c, c, h, bk)
    vq, vs = _requantize_section(payload, scales, 2 * c, c, h, bk)

    from transparent_object_detection_tpu.ops.attention import (
        _log_flash_launch,
    )
    from transparent_object_detection_tpu.ops.shard import maybe_shard_map

    _log_flash_launch(b, n, c, c, int8=True)

    def local(payload_l, qs_l, kq_l, ks_l, vq_l, vs_l):
        return flash_attention_int8_handoff(
            payload_l, qs_l, kq_l, ks_l, vq_l, vs_l,
            num_heads=h, scale=scale, block_q=bq, block_k=bk,
            quant_out=quant_out, out_dtype=out_dtype,
        )

    launch = maybe_shard_map(local, n_out=2 if quant_out else 1)
    return launch(payload, qs, kq, ks, vq, vs)
