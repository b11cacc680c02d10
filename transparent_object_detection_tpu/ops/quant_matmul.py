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
    ni == 0:  read the (bm, K) bf16 activation tile once; optional LayerNorm
              (row mean/var in VMEM), per-row absmax scale, quantize to int8
              in VMEM (Mosaic skips the x DMA on ni > 0 — block index
              unchanged)
    every ni: int8 x int8 -> int32 MXU dot (2x the bf16 rate on v5e) against
              the streamed (K, bn) weight tile; epilogue = rank-1 dequant
              (+bias) (+gelu) (+residual) in registers; write bf16

Weights are pre-quantized at trace time (per-output-channel symmetric int8;
XLA folds the one O(K*N) pass) — see quantize_weights().

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


def _qmm_kernel(
    *refs, ln: bool, has_bias: bool, act: Optional[str], residual: bool,
    ln_eps: float,
):
    """One (m-tile, n-tile) grid step; N is the inner (sequential) axis.

    Ref order: x, w, w_scale, [ln_scale, ln_bias], [bias], [residual], out,
    xq_scratch, xs_scratch.
    """
    it = iter(refs)
    x_ref = next(it)
    w_ref = next(it)
    ws_ref = next(it)
    lns_ref = next(it) if ln else None
    lnb_ref = next(it) if ln else None
    b_ref = next(it) if has_bias else None
    r_ref = next(it) if residual else None
    o_ref = next(it)
    xq_scr = next(it)
    xs_scr = next(it)

    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)
        if ln:
            mu = jnp.mean(xf, axis=1, keepdims=True)
            xc = xf - mu
            var = jnp.mean(xc * xc, axis=1, keepdims=True)
            xn = xc * jax.lax.rsqrt(var + ln_eps)
            y = xn * lns_ref[0:1, :] + lnb_ref[0:1, :]
        else:
            y = xf
        s = jnp.max(jnp.abs(y), axis=1, keepdims=True) / 127.0  # (bm, 1)
        s = jnp.maximum(s, 1e-12)
        xq_scr[...] = jnp.clip(jnp.round(y / s), -127.0, 127.0).astype(jnp.int8)
        xs_scr[:, 0:1] = s

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
    if residual:
        out = out + r_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_blocks(m: int, k: int, n: int) -> Optional[Tuple[int, int]]:
    """(bm, bn) fitting VMEM, MXU-aligned and dividing (m, n)."""
    for bm in (1024, 512, 256, 128):
        if m % bm:
            continue
        for bn in (512, 256):
            if n % bn:
                continue
            # x bf16 + xq int8 + fp32 prologue temp + double-buffered w +
            # int32 acc + bf16 out (+ residual)
            vmem = bm * k * (2 + 1 + 4) + 2 * k * bn + bm * bn * (4 + 2 + 2)
            if vmem <= 12 * 1024 * 1024:
                return bm, bn
    return None


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "ln", "act", "residual", "ln_eps"),
)
def _qmm_call(
    x2d, wq, w_scale, ln_scale, ln_bias, bias, res2d, *,
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
    if ln:
        operands += [
            ln_scale.reshape(1, k).astype(jnp.float32),
            ln_bias.reshape(1, k).astype(jnp.float32),
        ]
        in_specs += [
            pl.BlockSpec((1, k), lambda mi, ni: (0, 0)),
            pl.BlockSpec((1, k), lambda mi, ni: (0, 0)),
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


def _qmm_reference(x, wq, w_scale, ln_scale, ln_bias, bias, res, *,
                   ln, act, residual, ln_eps, out_dtype):
    """Pure-JAX twin of the kernel (CPU fallback + oracle for tests)."""
    xf = x.astype(jnp.float32)
    if ln:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xf = (xc * jax.lax.rsqrt(var + ln_eps)) * ln_scale + ln_bias
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s * w_scale
    if bias is not None:
        out = out + bias
    if act == "gelu":
        out = jax.nn.gelu(out)
    if residual:
        out = out + res.astype(jnp.float32)
    return out.astype(out_dtype)


def quant_matmul(
    x: Array,
    wq: Array,
    w_scale: Array,
    bias: Optional[Array] = None,
    ln_scale: Optional[Array] = None,
    ln_bias: Optional[Array] = None,
    ln_eps: float = 1e-6,
    act: Optional[str] = None,
    residual: Optional[Array] = None,
    out_dtype=jnp.bfloat16,
) -> Array:
    """[LayerNorm ->] dynamic-int8-quant -> int8 matmul -> [bias/gelu/residual].

    x: (..., K) bf16; wq: (K, N) int8; w_scale: (1, N) f32. Runs the fused
    Pallas kernel on TPU when shapes tile cleanly, else the identical-math
    XLA fallback.
    """
    k, n = wq.shape
    m = 1
    for d in x.shape[:-1]:
        m *= d
    ln = ln_scale is not None

    use_pallas = (
        jax.default_backend() in ("tpu", "axon") or INTERPRET
    ) and x.shape[-1] == k and k % 128 == 0 and n % 256 == 0
    blocks = _pick_blocks(m, k, n) if use_pallas else None
    if blocks is None:
        return _qmm_reference(
            x, wq, w_scale, ln_scale, ln_bias, bias, residual,
            ln=ln, act=act, residual=residual is not None, ln_eps=ln_eps,
            out_dtype=out_dtype,
        )
    bm, bn = blocks

    from transparent_object_detection_tpu.ops.attention import log_custom_flops

    log_custom_flops(2.0 * m * k * n, int8=True)
    out = _qmm_call(
        x.reshape(m, k), wq, w_scale,
        ln_scale, ln_bias, bias,
        residual.reshape(m, n) if residual is not None else None,
        out_dtype=out_dtype, bm=bm, bn=bn, ln=ln, act=act,
        residual=residual is not None, ln_eps=ln_eps,
    )
    return out.reshape(*x.shape[:-1], n)
