"""Memory-efficient attention for large spatial token maps.

The detector attends over up to 80x80 = 6,400 spatial tokens (SelfAttention
in dark3, TEB fusion nodes in the neck). A naive softmax(Q Kᵀ) V
materializes an N² score matrix — at batch 32 that is gigabytes of HBM
traffic and the single biggest obstacle between this model and
HBM-bandwidth-limited serving. Two implementations:

  * flash_attention_pallas: a Pallas TPU kernel doing the online-softmax
    streaming computation in VMEM (never materializing N²). Used on TPU.
  * chunked_attention: lax.scan over query blocks with online softmax —
    pure-JAX fallback that is differentiable and runs anywhere (CPU tests),
    with O(N * block) memory.

Both compute plain scaled (or unscaled) dot-product attention:
    out[i] = sum_j softmax_j(q_i . k_j * scale) v_j
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# Flip to run the bf16 flash kernels through the Pallas interpreter (CPU
# tests of the packed-qkv path; the plain q/k/v kernels are TPU-gated by
# the dispatcher and never reach pallas_call off-TPU).
INTERPRET = False

# Mesh registration for SPMD execution lives in ops/shard.py (shared with
# the fused int8 matmul): GSPMD cannot auto-partition a pallas_call, so when
# a mesh is set the flash kernels are wrapped in shard_map over the data
# axis (attention is embarrassingly parallel in the batch dim).
from transparent_object_detection_tpu.ops.shard import (  # noqa: F401
    set_compute_mesh as set_attention_mesh,
)


# Trace-time FLOP accounting: XLA's cost analysis reports 0 FLOPs for
# custom calls, so Pallas flash launches would vanish from MFU math. The
# dispatcher appends one record per pallas launch while tracing; benchmarks
# wrap their jit .lower() in start/stop and add 2*B*N^2*(Cq + Cv) per entry.
_FLOP_LOG: Optional[list] = None


def start_flop_log() -> None:
    global _FLOP_LOG
    _FLOP_LOG = []


def stop_flop_log() -> list:
    """Return records appended since start_flop_log and disable logging."""
    global _FLOP_LOG
    log, _FLOP_LOG = _FLOP_LOG, None
    return log or []


def _log_flash_launch(b: int, n: int, cq: int, cv: int, int8: bool = False) -> None:
    if _FLOP_LOG is not None:
        _FLOP_LOG.append({"batch": b, "n": n, "cq": cq, "cv": cv,
                          "int8": int8,
                          "flops": 2.0 * b * n * n * (cq + cv)})


def log_custom_flops(flops: float, int8: bool = False) -> None:
    """Record FLOPs of a non-attention custom call (e.g. the fused int8
    matmul) so MFU accounting sees work XLA's cost analysis reports as 0.
    int8 ops are tagged so MFU math can count them against the int8 MXU
    peak (2x bf16 on v5e) instead of the bf16 peak."""
    if _FLOP_LOG is not None:
        _FLOP_LOG.append({"flops": flops, "int8": int8})


def _maybe_shard_map(make_fn, num_heads: int = 1):
    """Wrap a flash-kernel launcher factory in shard_map when a mesh is
    registered: batch-axis sharding on a data mesh, batch+head sharding on a
    (data, model) TP mesh (see ops/shard.py). `make_fn(local_heads)` builds
    the launcher for the per-rank head count."""
    from transparent_object_detection_tpu.ops.shard import maybe_shard_map_attention

    return maybe_shard_map_attention(make_fn, num_heads)


def reference_attention(q: Array, k: Array, v: Array, scale: float = 1.0) -> Array:
    """Naive O(N^2)-memory attention (for tests / tiny maps).

    q: (B, N, Dq), k: (B, N, Dq), v: (B, N, Dv) -> (B, N, Dv).
    """
    scores = jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bij,bjc->bic", attn.astype(v.dtype), v)


def chunked_attention(
    q: Array, k: Array, v: Array, scale: float = 1.0, block_q: int = 512
) -> Array:
    """Online-softmax attention scanning over query blocks.

    Memory is O(block_q * N) instead of O(N^2); XLA fuses each block's
    matmul + softmax + matmul. The scan body is checkpointed, so reverse-mode
    AD recomputes each block's scores instead of storing them — training
    memory stays O(block_q * N) too (the flash-backward recipe, expressed in
    plain XLA).
    """
    b, n, dq = q.shape
    dv = v.shape[-1]
    block_q = min(block_q, n)
    pad = (-n) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nb = q.shape[1] // block_q
    qb = q.reshape(b, nb, block_q, dq).transpose(1, 0, 2, 3)  # (nb, B, bq, dq)

    @jax.checkpoint
    def body(carry, q_blk):
        scores = jnp.einsum("bic,bjc->bij", q_blk, k).astype(jnp.float32) * scale
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum("bij,bjc->bic", (p / denom).astype(v.dtype), v)
        return carry, out

    _, outs = jax.lax.scan(body, None, qb)  # (nb, B, bq, dv)
    out = outs.transpose(1, 0, 2, 3).reshape(b, nb * block_q, dv)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float):
    """One (batch, q-block, kv-block) grid step of streaming attention.

    The kv-block axis is the innermost (sequential) grid dimension: running
    max / normalizer / accumulator live in VMEM scratch across those steps,
    and the normalized output is written on the last step. Only one
    (block_q x block_k) tile of scores ever exists.

    Refs: q (1, bq, dq), k (1, bk, dq), v (1, bk, dv), o (1, bq, dv);
    scratch: m (bq, 128) f32, l (bq, 128) f32, acc (bq, dv) f32 (m/l use a
    padded 128-lane minor dim to satisfy TPU tiling).
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # matmuls take the input dtype (bf16 in serving) with fp32 accumulation —
    # casting inputs to f32 first would force fp32 MXU passes at a fraction
    # of the bf16 rate; softmax statistics stay in f32
    q = q_ref[0]
    k_blk = k_ref[0]
    v_blk = v_ref[0]

    # exp2-domain online softmax: scale carries a folded log2(e) (see the
    # launchers), so exp() becomes the native VPU exp2 with no per-element
    # ×log2(e) multiply. Identical real function.
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * (scale * 1.4426950408889634)
    )  # (bq, bk) f32, log2 domain
    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jax.lax.exp2(s - m_new)
    correction = jax.lax.exp2(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] * (1.0 / l_scr[:, 0:1])).astype(o_ref.dtype)


def flash_attention_pallas(
    q: Array,
    k: Array,
    v: Array,
    scale: float = 1.0,
    block_q: int = 512,
    block_k: int = 512,
) -> Array:
    """Streaming attention on TPU via Pallas. q/k: (B, N, Dq), v: (B, N, Dv).

    N must be a multiple of the block sizes (the `attention` wrapper falls
    back to the chunked path otherwise). Grid = (B, N/bq, N/bk) with the kv
    axis innermost; VMEM holds one q tile, one k tile, one v tile and the
    fp32 accumulators — ~2 MB at the default blocks, leaving Mosaic room to
    double-buffer the HBM streams.
    """
    b, n, dq = q.shape
    dv = v.shape[-1]
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    grid = (b, n // block_q, n // block_k)

    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dq), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, dq), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # batch/q-block programs are independent; only the kv axis
            # carries state — lets Mosaic pipeline across parallel dims
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def _mha_flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float):
    """(batch, head, q-block, kv-block) grid step; refs are (1, bq|bk, dh)
    channel-sliced blocks of packed (B, N, H*dh) arrays — the head axis is a
    grid dimension over the channel axis, so no transpose or reshape ever
    materializes."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k_blk = k_ref[0]
    v_blk = v_ref[0]

    # exp2-domain online softmax (see _flash_kernel): log2(e) folded into
    # the scalar scale, native VPU exp2, identical real function.
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * (scale * 1.4426950408889634)
    )
    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jax.lax.exp2(s - m_new)
    correction = jax.lax.exp2(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] * (1.0 / l_scr[:, 0:1])).astype(o_ref.dtype)


def _mha_flash_call(
    q: Array, k: Array, v: Array, num_heads: int, scale: float, block_q: int,
    block_k: int, c: int, k_col_off: int, v_col_off: int, interpret: bool,
) -> Array:
    """Shared launcher for the split and packed multi-head flash variants.

    Heads are addressed by slicing the channel axis in the BlockSpec index
    map (grid dim), so the kernel sees contiguous (bq, dh) tiles with zero
    transposes in HBM. `c` is the LOGICAL per-section width (the operand
    arrays may be wider, e.g. the packed (B, N, 3C) qkv); `k_col_off` /
    `v_col_off` are head-block column offsets into the k/v operands (0 for
    split arrays, H/2H for the packed layout)."""
    from jax.experimental.pallas import tpu as pltpu

    b, n = q.shape[0], q.shape[1]
    d = c // num_heads
    grid = (b, num_heads, n // block_q, n // block_k)
    return pl.pallas_call(
        functools.partial(_mha_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec(
                (1, block_k, d),
                lambda bi, hi, qi, ki: (bi, ki, k_col_off + hi),
            ),
            pl.BlockSpec(
                (1, block_k, d),
                lambda bi, hi, qi, ki: (bi, ki, v_col_off + hi),
            ),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention_mha(
    q: Array, k: Array, v: Array, num_heads: int, scale: float, block_q: int,
    block_k: int,
) -> Array:
    """Multi-head streaming attention on head-packed (B, N, H*dh) arrays —
    the layout a fused qkv projection produces.

    dh = C // num_heads must be a multiple of 128 for clean tiling; the
    `attention` dispatcher falls back otherwise.
    """
    return _mha_flash_call(
        q, k, v, num_heads, scale, block_q, block_k,
        c=q.shape[2], k_col_off=0, v_col_off=0, interpret=INTERPRET,
    )


def flash_attention_mha_packed(
    qkv: Array, num_heads: int, scale: float, block_q: int, block_k: int,
) -> Array:
    """Multi-head streaming attention reading q/k/v straight out of ONE
    packed (B, N, 3C) array (the fused qkv projection's output, sections
    [q | k | v], heads packed inside each section).

    `jnp.split` before a pallas_call materializes each (B, N, C) section as
    a real HBM copy (a pallas operand must be a whole array, so XLA cannot
    fuse the slice into the kernel) — ~3.8 GB/step of pure copy traffic on
    the phi='s' batch-32 neck. Here the SAME packed array is passed three
    times with column-offset index maps (q head hi at block-column hi, k at
    H + hi, v at 2H + hi), so the copies never exist. Serving-only (the
    training path keeps the split + custom-VJP route).
    """
    c = qkv.shape[2] // 3
    return _mha_flash_call(
        qkv, qkv, qkv, num_heads, scale, block_q, block_k,
        c=c, k_col_off=num_heads, v_col_off=2 * num_heads, interpret=INTERPRET,
    )


def attention_qkv(
    qkv: Array,
    scale: float = 1.0,
    impl: Optional[str] = None,
    num_heads: int = 1,
    int8: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
) -> Array:
    """Packed serving front-end: one (B, N, 3C) array straight from the
    fused qkv projection (equal q/k/v widths). Routes to flash kernels that
    consume the packed array in place — the 3-way `jnp.split` copies
    (each section materialized in HBM before a pallas_call) never happen.
    Falls back to split + `attention` whenever the packed kernels don't
    apply (tiny maps, ragged shapes, non-TPU backend, or a tensor-parallel
    mesh — TP shards the channel axis, and a packed 3C axis would split
    MID-SECTION across model ranks).
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    if impl is None:
        impl = _auto_impl(n)

    from transparent_object_detection_tpu.ops.shard import get_compute_mesh

    mesh, _ = get_compute_mesh()
    tp = 1
    if mesh is not None:
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        tp = sizes.get("model", 1)

    backend_tpu = jax.default_backend() in ("tpu", "axon")
    if impl == "pallas" and tp == 1:
        if int8:
            # the int8 route has its OWN backend/interpret gate (its kernels
            # live in attention_int8 with a separate INTERPRET flag) — don't
            # couple it to this module's bf16 flag
            from transparent_object_detection_tpu.ops.attention_int8 import (
                INTERPRET as INT8_INTERPRET,
                flash_attention_mha_int8,
                pick_blocks,
            )

            blocks = pick_blocks(n, c, num_heads)
            if blocks is not None and (backend_tpu or INT8_INTERPRET):
                _log_flash_launch(b, n, c, c, int8=True)
                k = jax.lax.slice_in_dim(qkv, c, 2 * c, axis=2)
                v = jax.lax.slice_in_dim(qkv, 2 * c, 3 * c, axis=2)
                # k/v slices fuse into _quantize_kv's elementwise+reduce
                # read; q rides the packed array via q_width (zero copies)
                launch = _maybe_shard_map(
                    lambda h: functools.partial(
                        flash_attention_mha_int8, num_heads=h, scale=scale,
                        block_q=blocks[0], block_k=blocks[1], q_width=c,
                    ),
                    num_heads,
                )
                return launch(qkv, k, v)
        d = c // num_heads
        bq_pref, bk_pref = _preferred_blocks(d, block_q, block_k)
        bq = _divisor_block(n, bq_pref)
        bk = _divisor_block(n, bk_pref)
        bq, bk = _fit_blocks_vmem(n, d, d, bq, bk)
        if (
            (backend_tpu or INTERPRET)
            and bq is not None and bk is not None and d % 128 == 0
        ):
            _log_flash_launch(b, n, c, c)
            # _maybe_shard_map builds (q, k, v)-arity wrappers; the packed
            # kernel reads everything from the first operand (the other two
            # slots get the same array — same buffer, no copies).
            launch = _maybe_shard_map(
                lambda h: (
                    lambda qp, _k, _v: flash_attention_mha_packed(
                        qp, h, scale, bq, bk
                    )
                ),
                num_heads,
            )
            return launch(qkv, qkv, qkv)

    q, k, v = jnp.split(qkv, 3, axis=-1)
    return attention(q, k, v, scale, impl, block_q, block_k, num_heads, int8)


@functools.lru_cache(maxsize=64)
def _diff_flash(scale: float, bq: int, bk: int, num_heads: int):
    """Differentiable flash attention: Pallas forward (saving the per-query
    logsumexp) and Pallas flash backward (dq / dk / dv kernels recomputing
    score tiles in VMEM — see ops/attention_vjp.py). Cached per static
    config."""
    from transparent_object_detection_tpu.ops.attention_vjp import (
        compute_dcap,
        flash_bwd,
        flash_fwd_lse,
    )

    @jax.custom_vjp
    def fn(q, k, v):
        if num_heads > 1:
            return flash_attention_mha(q, k, v, num_heads, scale, bq, bk)
        return flash_attention_pallas(q, k, v, scale, bq, bk)

    def fwd(q, k, v):
        out, lse = flash_fwd_lse(q, k, v, scale, bq, bk, num_heads)
        return out, (q, k, v, out, lse)

    def bwd(res, g):
        q, k, v, out, lse = res
        dcap = compute_dcap(out, g, num_heads)
        # backward keeps more live tiles (q, k, v, dO + two fp32 accumulators
        # + score/grad temporaries) — blocks must fit VMEM. Defaults from the
        # r3 hardware sweep (benchmarks/bench_flash_bwd.py): narrow-q/wide-kv,
        # same pattern as the forward — 400/1600 took the 6400-token training
        # shape 139.1 -> 116.2 ms and the 1600-token one 16.6 -> 13.6 vs the
        # old 400/400 (wider kv OOMs VMEM, 800/400 and 200/* all slower).
        # TOD_FLASH_BWD_BQ/BK override for experiments (read at trace time).
        import os as _os

        n = q.shape[1]
        cap_q = int(_os.environ.get("TOD_FLASH_BWD_BQ", "400"))
        cap_k = int(_os.environ.get("TOD_FLASH_BWD_BK", "1600"))
        bq2 = _divisor_block(n, min(bq, cap_q)) or bq
        bk2 = _divisor_block(n, min(bk, cap_k)) or bk
        # XLA cost analysis reports 0 for the Pallas backward too: dq kernel
        # does s + dp + dq dots (2N^2(2Cq+Cv)), dkv kernel s + dp + dv + dk
        # (2N^2(2Cq+2Cv)) — packed-head C gives the per-head sum exactly.
        b = q.shape[0]
        cq, cv = q.shape[-1], v.shape[-1]
        log_custom_flops(2.0 * b * n * n * (4 * cq + 3 * cv))
        return flash_bwd(q, k, v, g, lse, dcap, scale, bq2, bk2, num_heads)

    fn.defvjp(fwd, bwd)
    return fn


def attention(
    q: Array,
    k: Array,
    v: Array,
    scale: float = 1.0,
    impl: Optional[str] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    num_heads: int = 1,
    int8: bool = False,
) -> Array:
    """Dispatching front-end. impl: None (auto) | 'xla' | 'chunked' | 'pallas'.

    Inputs are (B, N, C); with num_heads > 1, C packs heads contiguously
    (the fused-qkv layout) and attention runs per head. Auto picks pallas on
    TPU backends, chunked elsewhere; tiny maps (N <= 1024) always take the
    naive path — the N² matrix is small enough that XLA's fusion wins.

    int8=True (serving only) tries the int8 flash kernel on large maps —
    2x the MXU rate, ~1-2% relative output error (validated end-to-end);
    falls back to the bf16 path when shapes don't tile.
    """
    b, n, c = q.shape
    if impl is None:
        impl = _auto_impl(n)

    if int8 and impl == "pallas":
        from transparent_object_detection_tpu.ops.attention_int8 import (
            flash_attention_mha_int8,
            pick_blocks,
        )

        blocks = pick_blocks(n, c, num_heads, cv=v.shape[-1])
        if blocks is not None:
            _log_flash_launch(b, n, c, v.shape[-1], int8=True)
            launch = _maybe_shard_map(
                lambda h: functools.partial(
                    flash_attention_mha_int8, num_heads=h, scale=scale,
                    block_q=blocks[0], block_k=blocks[1],
                ),
                num_heads,
            )
            return launch(q, k, v)

    # narrow-q / wide-kv preference (59.7 -> 58.1 ms vs the 800/1600
    # default at N=6400 dh=256; shared with attention_qkv)
    dv_head = (v.shape[-1] // num_heads) if num_heads > 1 else v.shape[-1]
    block_q, block_k = _preferred_blocks(dv_head, block_q, block_k)

    if num_heads > 1:
        d = c // num_heads
        if impl == "pallas":
            bq = _divisor_block(n, block_q)
            bk = _divisor_block(n, block_k)
            bq, bk = _fit_blocks_vmem(n, d, v.shape[-1] // num_heads, bq, bk)
            if bq is not None and bk is not None and d % 128 == 0:
                # head axis = grid dim slicing the packed channel axis:
                # zero transposes in HBM; differentiable via custom VJP
                _log_flash_launch(b, n, c, v.shape[-1])
                launch = _maybe_shard_map(
                    lambda h: _diff_flash(scale, bq, bk, h), num_heads
                )
                return launch(q, k, v)
        # generic multi-head: fold heads into the batch axis
        dv = v.shape[-1] // num_heads
        fold = lambda t, dd: (
            t.reshape(b, n, num_heads, dd).transpose(0, 2, 1, 3).reshape(
                b * num_heads, n, dd
            )
        )
        out = attention(fold(q, d), fold(k, d), fold(v, dv), scale, impl, block_q, block_k)
        return out.reshape(b, num_heads, n, dv).transpose(0, 2, 1, 3).reshape(b, n, -1)

    if impl == "pallas":
        bq = _divisor_block(n, block_q)
        bk = _divisor_block(n, block_k)
        bq, bk = _fit_blocks_vmem(n, c, v.shape[-1], bq, bk)
        if bq is not None and bk is not None:
            _log_flash_launch(q.shape[0], n, c, v.shape[-1])
            launch = _maybe_shard_map(lambda h: _diff_flash(scale, bq, bk, h), 1)
            return launch(q, k, v)
        impl = "chunked"  # no MXU-friendly divisor / VMEM fit: fall back

    if impl == "xla":
        return reference_attention(q, k, v, scale)
    if impl == "chunked":
        return chunked_attention(q, k, v, scale, block_q)
    raise ValueError(f"unknown attention impl {impl!r}")


def _auto_impl(n: int) -> str:
    """Auto dispatch shared by attention() / attention_qkv(): naive XLA for
    tiny maps (N <= 1024 — the N² tile is small enough that XLA's fusion
    wins), pallas on TPU backends, chunked elsewhere."""
    if n <= 1024:
        return "xla"
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "chunked"


def _preferred_blocks(dv_head: int, block_q: int, block_k: int):
    """Measured v5e tile preference shared by attention() / attention_qkv()
    (single source so a retune propagates to both front-ends): narrow-q /
    wide-kv wins when the head dim fits — the kv axis is the sequential
    grid dim, so a wide k/v block amortizes the per-step accumulator
    rescale while the small q block keeps the fp32 score tile in VMEM
    (400x3200x4B ~ 5 MB). Callers pass their defaults (1024); explicit
    user overrides pass through untouched."""
    if dv_head <= 256:
        if block_q == 1024:
            block_q = 400
        if block_k == 1024:
            block_k = 3200
    return block_q, block_k


def _fit_blocks_vmem(
    n: int, dq: int, dv: int, bq: Optional[int], bk: Optional[int]
) -> tuple:
    """Shrink (bq, bk) until the bf16 flash kernel's working set fits VMEM.

    The default tiles assume head dims <= 512; the phi='l'/'x' backbone
    SelfAttention carries dv = C = 2048+, where a (1024, 1024) choice puts
    a 9+ MB double-buffered v tile next to an 8 MB f32 accumulator and
    Mosaic dies at compile with a scoped-vmem OOM (observed at phi='l':
    21.09M > 16M). Model: double-buffered q/k/v bf16 tiles + f32 acc +
    f32 score tile + m/l scratch, against the ~16 MiB v5e VMEM."""
    def vmem(bq_, bk_):
        return (
            2 * bq_ * dq * 2            # q bf16, double-buffered
            + 2 * bk_ * (dq + dv) * 2   # k + v bf16, double-buffered
            + 2 * bq_ * dv * 2          # out bf16, double-buffered
            + bq_ * dv * 4              # f32 accumulator scratch
            + bq_ * bk_ * 4             # transient f32 score tile
            + 2 * bq_ * 128 * 4         # m/l scratch
        )

    # calibrated against a measured 17.58M scoped allocation at
    # (bq=800, bk=400, dq=256, dv=2048) vs the 16M limit — the model above
    # gives 19.8M there, so a 14.5M budget keeps ~15% headroom for Mosaic's
    # vregs/temporaries without disturbing the validated phi='s' configs
    # (400/3200 d=256 -> 13.3M; 800/800 dq=64/dv=512 -> 8.7M)
    budget = 14 * 1024 * 1024 + 512 * 1024
    while bq and bk and vmem(bq, bk) > budget and bk > 128:
        bk = _divisor_block(n, bk - 8)
    while bq and bk and vmem(bq, bk) > budget and bq > 128:
        bq = _divisor_block(n, bq - 8)
    if bq and bk and vmem(bq, bk) > budget:
        return None, None  # nothing fits — caller falls back to chunked
    return bq, bk


def _divisor_block(n: int, preferred: int) -> Optional[int]:
    """Largest block <= preferred that divides n and is sublane-aligned
    (multiple of 8); None if nothing >= 128 exists. Spatial token counts are
    h*w of /8-strided maps, so real inputs (1600, 6400, 25600, ...) always
    have one."""
    for b in range(min(preferred, n), 127, -8):
        if n % b == 0:
            return b
    return None
