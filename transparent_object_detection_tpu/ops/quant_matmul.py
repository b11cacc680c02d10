"""Fused LN + dynamic-quant int8 matmul + epilogue — Pallas TPU kernel.

The int8 serving path (TEB projections, models/blocks.py) originally emitted
each step as separate XLA ops, every one a full HBM pass over
activation-sized tensors:

    LayerNorm (2 reduce passes) -> absmax reduce -> quantize -> int8 dot ->
    int32 dequant multiply -> bias add -> gelu -> residual add

Profiling the batch-32 serving step showed 34.5 ms/step of convert+reduce
fusions (LN statistics + quantization absmax) plus ~15 ms of dequant /
activation elementwise — pure HBM bandwidth with zero MXU work.

This kernel fuses the whole pipeline into one pallas_call:

  grid (M/bm, N/bn), N innermost:
    ni == 0:  read the (bm, K) bf16 activation tile once; quantize to int8
              in VMEM (Mosaic skips the x DMA on ni > 0 — block index
              unchanged)
    every ni: int8 x int8 -> int32 MXU dot (2x the bf16 rate on v5e) against
              the streamed (K, bn) weight tile; epilogue = rank-1 dequant
              (+bias) (+gelu) (+residual) in registers; write bf16

The LayerNorm is algebraically split so the prologue's VPU cost stays low
(the per-m-tile prologue is the kernel's serial bottleneck on narrow-N
projections):

  * the affine (gamma, beta) folds into the weights at trace time:
        LN(x) @ W + b  ==  z @ (gamma[:, None] * W) + (beta @ W + b)
    where z is the normalized-but-unscaled activation — zero per-element
    cost in the kernel (see _fold_ln);
  * the 1/sqrt(var) factor never touches the elements: the int8 payload is
    round(127 * d / amax(d)) with d = x - mean (identical for z since
    rsqrt > 0 scales rows uniformly), and rsqrt rides the per-row dequant
    scale  s = amax(d)/127 * rsqrt(var + eps).

Net prologue: two fused mean reductions, one subtract, one absmax, one
round-multiply — no per-element divide, no affine pass.

Weights are quantized at trace time (per-output-channel symmetric int8, one
O(K*N) pass per call — negligible against the O(M*K*N) dot).

Replaces the reference's fp32 torch.nn.Linear + LayerNorm stack in the neck
transformer blocks (reference model/blocks.py:257-289).
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


def quantize_weights(kernel: Array) -> Tuple[Array, Array]:
    """fp32 (K, N) kernel -> (int8 (K, N), f32 (1, N) per-channel scale)."""
    w_scale = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0  # (1, N)
    wq = jnp.round(kernel / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)
    return wq, w_scale


def _fold_ln(
    w: Array, bias: Optional[Array], ln_scale: Array, ln_bias: Array
) -> Tuple[Array, Array]:
    """Fold the LN affine into the projection: returns (w_eff, bias_eff)
    with LN(x) @ w + bias == z @ w_eff + bias_eff for normalized z."""
    w_eff = w * ln_scale.reshape(-1, 1)
    bias_eff = ln_bias.reshape(-1) @ w
    if bias is not None:
        bias_eff = bias_eff + bias
    return w_eff, bias_eff


def _qmm_kernel(
    *refs, ln: bool, has_bias: bool, act: Optional[str], residual: bool,
    ln_eps: float,
):
    """One (m-tile, n-tile) grid step; N is the inner (sequential) axis.

    Ref order: x, w, w_scale, [bias], [residual], out, xq_scratch,
    xs_scratch.
    """
    it = iter(refs)
    x_ref = next(it)
    w_ref = next(it)
    ws_ref = next(it)
    b_ref = next(it) if has_bias else None
    r_ref = next(it) if residual else None
    o_ref = next(it)
    xq_scr = next(it)
    xs_scr = next(it)

    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _prologue():
        # Chunked over row slabs: the f32 intermediates then occupy
        # (chunk, K) instead of (bm, K) of VMEM spill, which is what lets
        # _pick_blocks choose bm=1024 (fewer per-m-tile serializations —
        # the prologue stalls the MXU once per m-tile).
        bm = x_ref.shape[0]
        chunk = 256 if bm % 256 == 0 else 128
        if bm <= chunk:
            chunk = bm

        def slab(i, carry):
            sl = pl.ds(i * chunk, chunk)
            xf = x_ref[sl, :].astype(jnp.float32)
            if ln:
                mu = jnp.mean(xf, axis=1, keepdims=True)
                m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
                d = xf - mu
                var = jnp.maximum(m2 - mu * mu, 0.0)
                rstd = jax.lax.rsqrt(var + ln_eps)
            else:
                d = xf
                rstd = 1.0
            amax = jnp.maximum(
                jnp.max(jnp.abs(d), axis=1, keepdims=True), 1e-12
            )  # (chunk, 1)
            # |d| * 127/amax <= 127 exactly -> no clip needed for int8
            xq_scr[sl, :] = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
            xs_scr[sl, 0:1] = amax * (1.0 / 127.0) * rstd
            return carry

        jax.lax.fori_loop(0, bm // chunk, slab, 0, unroll=False)

    acc = jax.lax.dot_general(
        xq_scr[...],
        w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bm, bn) int32 on the MXU at the int8 rate
    out = acc.astype(jnp.float32) * xs_scr[:, 0:1] * ws_ref[0:1, :]
    if has_bias:
        out = out + b_ref[0:1, :]
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = out * jax.nn.sigmoid(out)
    if residual:
        out = out + r_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_blocks(
    m: int, k: int, n: int, residual: bool = True
) -> Optional[Tuple[int, int]]:
    """(bm, bn) fitting VMEM, MXU-aligned and dividing (m, n).

    First preference (r3 sweep): bn = n FULL WIDTH. The weight block index
    is then constant across the whole grid, so Mosaic keeps the quantized
    weights VMEM-RESIDENT — zero re-streaming of W per m-tile (the r2
    layout re-read all of W for every m-tile: for the 1536x1536 attn_out
    that was 2.4 MB x 200 tiles = 0.5 GB/call). Measured on v5e: the
    square-shape dot went 155 -> 183 TOPS at (256, 1536). Falls back to
    the r2 streaming layout (tall-m for narrow shapes, wide-bn otherwise)
    when W + tiles exceed VMEM."""
    def vmem(bm: int, bn: int) -> int:
        chunk = min(bm, 256)
        # Mosaic double-buffers every input/output block (x, w, out, and
        # the optional residual), plus the xq int8 scratch, the chunked
        # fp32 prologue temp, and the int32 accumulator vregs. Calibrated
        # against a measured 16.3M scoped allocation for (bm=1024, bn=512,
        # k=1536) vs the 16M limit.
        resident = bn == n  # constant block index -> single-buffered W
        return (
            2 * bm * k * 2       # x bf16, double-buffered
            + bm * k             # xq int8 scratch
            + chunk * k * 4      # fp32 prologue temp (row-chunked)
            + (1 if resident else 2) * k * bn  # w int8
            + 2 * bm * bn * 2    # out bf16, double-buffered
            + (2 * bm * bn * 2 if residual else 0)  # residual bf16
            + bm * bn * 4        # int32 accumulator
        )

    budget = 15 * 1024 * 1024 + 512 * 1024
    # Weight-resident full-width layout (see docstring), tallest fitting
    # m-tile first: the quantize prologue runs once per m-tile and
    # serializes the MXU, so taller tiles amortize it — decisive on
    # narrow-N shapes (the 1x1 reduce convs: only ~1 us of dot per
    # 256-row tile vs several us of prologue). bm=256 measured 138 -> 170
    # TOPS on the square attn_out; bm=128 (the only fit for the 4608-wide
    # qkv) measured a wash vs streaming, so 128 is excluded here.
    for bm in (1024, 512, 256):
        if m % bm == 0 and vmem(bm, n) <= budget:
            return bm, n
    # Measured on v5e (204800-row TEB shapes): narrow projections with few
    # wide-bn steps per m-tile are prologue-bound — tall m-tiles win (the
    # square 1536x1536 attn_out: 7.9 -> 6.9 ms at (1024, 256)). Everything
    # else is MXU/stream-bound and prefers the widest bn (wide-bn at
    # (512, 768) beats tall-narrow by 4-20% on the 3072/4608/6144-wide and
    # k=3072 shapes).
    if n <= 1536 and k <= 2048:
        for bm in (1024, 512, 256, 128):
            if m % bm:
                continue
            for bn in (768, 512, 256):
                if n % bn == 0 and vmem(bm, bn) <= budget:
                    return bm, bn
    else:
        for bn in (768, 512, 256):
            if n % bn:
                continue
            for bm in (512, 256, 128):
                if m % bm == 0 and vmem(bm, bn) <= budget:
                    return bm, bn
    return None


def _quant_rows_kernel(x_ref, xq_ref, xs_ref, *, ln: bool, ln_eps: float):
    """One-pass [LN-normalize +] per-row dynamic int8 quantization.

    Emits the int8 payload and the per-row dequant scale (with rsqrt folded
    in, same algebra as _qmm_kernel's prologue) for the SPLIT path: the dot
    itself then runs as a plain XLA int8 dot_general, which schedules the
    MXU better than the fused kernel on wide-N shapes (see _prefer_split)."""
    xf = x_ref[...].astype(jnp.float32)
    if ln:
        mu = jnp.mean(xf, axis=1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
        d = xf - mu
        var = jnp.maximum(m2 - mu * mu, 0.0)
        rstd = jax.lax.rsqrt(var + ln_eps)
    else:
        d = xf
        rstd = 1.0
    amax = jnp.maximum(jnp.max(jnp.abs(d), axis=1, keepdims=True), 1e-12)
    xq_ref[...] = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
    xs_ref[...] = amax * (1.0 / 127.0) * rstd


def _prefer_split(m: int, k: int, n: int, ln: bool, act, residual) -> bool:
    """Measured r3 routing (bench_qmm base vs pquant on v5e): the split
    quant-pass + XLA int8 dot wins on the wide-N qkv projections
    (n == 3k, LN, no act/residual: 212.9 -> 236.7 TOPS on the 1536->4608
    h2 qkv, 187.3 -> 196.6 on the 2048->6144 h1 qkv); the fused kernel
    wins everywhere else (attn_out 152.5 vs 131.4, mlp1 225.6 vs 219.0,
    mlp2 203.9 vs 208.5 within noise)."""
    return (
        ln and act is None and residual is None
        and n == 3 * k and m >= 51200 and m % 512 == 0
    )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "ln", "act", "ln_eps")
)
def _pquant_call(x2d, wq, w_scale, bias, *, out_dtype, ln, act, ln_eps):
    from jax.experimental.pallas import tpu as pltpu

    m, k = x2d.shape
    # bq * K * (bf16 in, double-buffered + int8 out + f32 transient) must
    # fit scoped VMEM (~12 MB usable)
    bq = 512 if k <= 2048 else (256 if k <= 6144 else 128)
    while m % bq:
        bq //= 2
    xq, xs = pl.pallas_call(
        functools.partial(_quant_rows_kernel, ln=ln, ln_eps=ln_eps),
        grid=(m // bq,),
        in_specs=[pl.BlockSpec((bq, k), lambda mi: (mi, 0))],
        out_specs=[
            pl.BlockSpec((bq, k), lambda mi: (mi, 0)),
            pl.BlockSpec((bq, 1), lambda mi: (mi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=INTERPRET,
    )(x2d)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * w_scale
    if bias is not None:
        out = out + bias.reshape(1, -1)
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = out * jax.nn.sigmoid(out)
    return out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "ln", "act", "residual", "ln_eps"),
)
def _qmm_call(
    x2d, wq, w_scale, bias, res2d, *,
    out_dtype, bm, bn, ln, act, residual, ln_eps,
):
    m, k = x2d.shape
    n = wq.shape[1]
    from jax.experimental.pallas import tpu as pltpu

    has_bias = bias is not None
    operands = [x2d, wq, w_scale.astype(jnp.float32)]
    in_specs = [
        pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0)),
        pl.BlockSpec((k, bn), lambda mi, ni: (0, ni)),
        pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)),
    ]
    if has_bias:
        operands.append(bias.reshape(1, n).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)))
    if residual:
        operands.append(res2d)
        in_specs.append(pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)))

    return pl.pallas_call(
        functools.partial(
            _qmm_kernel, ln=ln, has_bias=has_bias, act=act, residual=residual,
            ln_eps=ln_eps,
        ),
        grid=(m // bm, n // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        # NOTE: no pl.CostEstimate here — declared costs show up in XLA's
        # cost_analysis() and would double-count with the trace-time FLOP log
        # (ops/attention.py log_custom_flops), which MFU accounting relies on
        # to charge int8 work against the int8 MXU peak.
        interpret=INTERPRET,
    )(*operands)


def _qmm_reference(x, wq, w_scale, bias, res, *,
                   ln, act, residual, ln_eps, out_dtype):
    """Pure-JAX twin of the kernel math (CPU fallback + oracle for tests).

    Takes the already-folded weights (wq/w_scale/bias from _fold_ln +
    quantize_weights) and mirrors the kernel's normalize-only LN."""
    xf = x.astype(jnp.float32)
    if ln:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        d = xf - mu
        rstd = jax.lax.rsqrt(jnp.maximum(m2 - mu * mu, 0.0) + ln_eps)
    else:
        d = xf
        rstd = 1.0
    amax = jnp.maximum(jnp.max(jnp.abs(d), axis=-1, keepdims=True), 1e-12)
    xq = jnp.round(d * (127.0 / amax)).astype(jnp.int8)
    s = amax * (1.0 / 127.0) * rstd
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s * w_scale
    if bias is not None:
        out = out + bias
    if act == "gelu":
        out = jax.nn.gelu(out)
    elif act == "silu":
        out = out * jax.nn.sigmoid(out)
    if residual:
        out = out + res.astype(jnp.float32)
    return out.astype(out_dtype)


def _qmm_dispatch(x, wq, w_scale, bias, residual, *, ln, act, ln_eps, out_dtype):
    """Pallas-or-fallback on whatever shapes it receives (global, or the
    per-shard local shapes inside shard_map)."""
    k, n = wq.shape
    m = 1
    for d in x.shape[:-1]:
        m *= d
    use_pallas = (
        jax.default_backend() in ("tpu", "axon") or INTERPRET
    ) and x.shape[-1] == k and k % 128 == 0 and n % 256 == 0
    blocks = (
        _pick_blocks(m, k, n, residual=residual is not None)
        if use_pallas else None
    )
    if blocks is None:
        return _qmm_reference(
            x, wq, w_scale, bias, residual,
            ln=ln, act=act, residual=residual is not None, ln_eps=ln_eps,
            out_dtype=out_dtype,
        )
    bm, bn = blocks

    from transparent_object_detection_tpu.ops.attention import log_custom_flops

    if _prefer_split(m, k, n, ln, act, residual):
        # Split path: the int8 dot is a plain XLA dot_general, so XLA's
        # cost analysis already counts its 2mkn as (bf16-rate) flops —
        # log a negative bf16 correction and the same work as int8 so
        # bench.py charges it against the int8 MXU peak.
        log_custom_flops(-2.0 * m * k * n, int8=False)
        log_custom_flops(2.0 * m * k * n, int8=True)
        out = _pquant_call(
            x.reshape(m, k), wq, w_scale.astype(jnp.float32), bias,
            out_dtype=out_dtype, ln=ln, act=act, ln_eps=ln_eps,
        )
        return out.reshape(*x.shape[:-1], n)

    log_custom_flops(2.0 * m * k * n, int8=True)
    out = _qmm_call(
        x.reshape(m, k), wq, w_scale, bias,
        residual.reshape(m, n) if residual is not None else None,
        out_dtype=out_dtype, bm=bm, bn=bn, ln=ln, act=act,
        residual=residual is not None, ln_eps=ln_eps,
    )
    return out.reshape(*x.shape[:-1], n)


def quant_matmul(
    x: Array,
    w: Array,
    bias: Optional[Array] = None,
    ln_scale: Optional[Array] = None,
    ln_bias: Optional[Array] = None,
    ln_eps: float = 1e-6,
    act: Optional[str] = None,
    residual: Optional[Array] = None,
    out_dtype=jnp.bfloat16,
) -> Array:
    """[LayerNorm ->] dynamic-int8-quant -> int8 matmul -> [bias/gelu/residual].

    x: (..., K) bf16; w: (K, N) fp32 kernel (quantized per-output-channel
    inside, LN affine folded in — see module docstring). Runs the fused
    Pallas kernel on TPU when shapes tile cleanly, else the identical-math
    XLA fallback.

    Under a registered compute mesh (ops/shard.py) with a batched input, the
    whole dispatch is wrapped in shard_map over the data axis — GSPMD cannot
    partition a pallas_call, so without this the int8 serving path would not
    run data-parallel. Block picking then sees the per-shard local M.
    """
    ln = ln_scale is not None
    if ln:
        w, bias = _fold_ln(w, bias, ln_scale, ln_bias)
    wq, w_scale = quantize_weights(w)

    from transparent_object_detection_tpu.ops.shard import (
        get_compute_mesh,
        maybe_shard_map,
    )

    mesh, axis = get_compute_mesh()
    n_shards = dict(getattr(mesh, "shape", {})).get(axis, 1) if mesh is not None else 1
    if (
        n_shards > 1
        and x.ndim >= 2
        and x.shape[0] % n_shards == 0
        and (residual is None or residual.shape[0] == x.shape[0])
    ):
        has_bias, has_res = bias is not None, residual is not None

        def local_fn(*args):
            it = iter(args)
            x_l = next(it)
            wq_l, ws_l = next(it), next(it)
            b_l = next(it) if has_bias else None
            r_l = next(it) if has_res else None
            return _qmm_dispatch(
                x_l, wq_l, ws_l, b_l, r_l,
                ln=ln, act=act, ln_eps=ln_eps, out_dtype=out_dtype,
            )

        operands = [x, wq, w_scale]
        batch_idx = {0}
        if has_bias:
            operands.append(bias)
        if has_res:
            batch_idx.add(len(operands))
            operands.append(residual)
        return maybe_shard_map(local_fn, batch_arg_indices=batch_idx)(*operands)

    return _qmm_dispatch(
        x, wq, w_scale, bias, residual,
        ln=ln, act=act, ln_eps=ln_eps, out_dtype=out_dtype,
    )
