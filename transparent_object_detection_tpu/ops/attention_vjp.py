"""Pallas flash-attention forward-with-residuals and backward kernels.

Implements the standard flash backward: the forward additionally emits the
per-query logsumexp; the backward recomputes each (q-block, k-block) score
tile from q/k/lse and accumulates

    dv += P^T dO          dS = P * (dP - D) * scale,  D_i = sum_d dO_id O_id
    dp  = dO V^T          dq += dS K,   dk += dS^T Q

entirely in VMEM — never materializing an N x N matrix. Two variants:
  * 3D single-head (B, N, D) with independent q/k and v widths
    (the SelfAttention block: dq = C/8, dv = C).
  * packed multi-head (B, N, H*dh): heads are grid dims slicing the channel
    axis (the TEB layout), uniform dh across q/k/v.

Accumulation runs in fp32 scratch across the sequential innermost grid axis;
lse/D ride as (…, N, 1) fp32 arrays (lane dim 1 == full array dim satisfies
the TPU block-tiling rule).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Set True to run these kernels through the Pallas interpreter (CPU tests).
INTERPRET = False


# ---------------------------------------------------------------------------
# forward with logsumexp residual
# ---------------------------------------------------------------------------


def _fwd_lse_body(q, k_blk, v_blk, m_scr, l_scr, acc_scr, scale):
    # bf16 matmul inputs + f32 accumulation (full MXU rate); f32 softmax stats
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new


def _fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                    *, scale: float, kv_axis: int):
    ki = pl.program_id(kv_axis)
    nk = pl.num_programs(kv_axis)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    _fwd_lse_body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc_scr, scale)

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_scr[:, 0:1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # lse block may be (1, bq, 1) or (1, 1, bq, 1); reshape explicitly
        lse_ref[...] = (m_scr[:, 0:1] + jnp.log(l)).reshape(lse_ref.shape)


def flash_fwd_lse(
    q: Array, k: Array, v: Array, scale: float, block_q: int, block_k: int,
    num_heads: int = 1,
) -> Tuple[Array, Array]:
    """Forward pass returning (out, lse). lse is (B, N, 1) fp32 for
    num_heads == 1, else (B, H, N, 1)."""
    b, n, cq = q.shape
    cv = v.shape[-1]
    if num_heads == 1:
        grid = (b, n // block_q, n // block_k)
        kernel = functools.partial(_fwd_lse_kernel, scale=scale, kv_axis=2)
        in_specs = [
            pl.BlockSpec((1, block_q, cq), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, cq), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, cv), lambda bi, qi, ki: (bi, ki, 0)),
        ]
        out_specs = (
            pl.BlockSpec((1, block_q, cv), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bi, qi, ki: (bi, qi, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((b, n, cv), q.dtype),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        )
        dims = ("parallel", "parallel", "arbitrary")
        d_acc = cv
    else:
        d = cq // num_heads
        grid = (b, num_heads, n // block_q, n // block_k)
        kernel = functools.partial(_fwd_lse_kernel, scale=scale, kv_axis=3)
        in_specs = [
            pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
        ]
        out_specs = (
            pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((b, n, cq), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, n, 1), jnp.float32),
        )
        dims = ("parallel", "parallel", "parallel", "arbitrary")
        d_acc = d

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_acc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
        interpret=INTERPRET,
    )(q, k, v)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _recompute_p_ds(q, k_blk, v_blk, do, lse, dcap, scale):
    """Shared tile math: P = exp(S - lse); dS = P * (dP - D) * scale.

    Inputs stay in their storage dtype (bf16 matmuls, f32 accumulation);
    p/ds come back in f32 — callers cast at their matmul sites."""
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    p = jnp.exp(s - lse)  # (bq, bk) f32
    dp = jax.lax.dot_general(
        do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dcap) * scale
    return p, ds


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dq_ref, dq_scr,
                   *, scale: float, kv_axis: int):
    ki = pl.program_id(kv_axis)
    nk = pl.num_programs(kv_axis)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[...].reshape(-1, 1)  # (bq, 1) f32, any block rank
    dcap = d_ref[...].reshape(-1, 1)

    _, ds = _recompute_p_ds(q, k_blk, v_blk, do, lse, dcap, scale)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr, *, scale: float, q_axis: int):
    qi = pl.program_id(q_axis)
    nq = pl.num_programs(q_axis)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[...].reshape(-1, 1)
    dcap = d_ref[...].reshape(-1, 1)

    p, ds = _recompute_p_ds(q, k_blk, v_blk, do, lse, dcap, scale)
    # dv += P^T dO ; dk += dS^T Q   (contract over the q-block axis)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def flash_bwd(
    q: Array,
    k: Array,
    v: Array,
    do: Array,
    lse: Array,
    dcap: Array,
    scale: float,
    block_q: int,
    block_k: int,
    num_heads: int = 1,
) -> Tuple[Array, Array, Array]:
    """Backward pass. dcap = D = rowsum(dO * O): (B, N, 1) fp32 for one head,
    (B, H, N, 1) for packed heads. Returns (dq, dk, dv) in input dtypes."""
    b, n, cq = q.shape
    cv = v.shape[-1]

    if num_heads == 1:
        lse_spec3 = lambda: pl.BlockSpec((1, block_q, 1), lambda bi, qi, ki: (bi, qi, 0))
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, scale=scale, kv_axis=2),
            grid=(b, n // block_q, n // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, cq), lambda bi, qi, ki: (bi, qi, 0)),
                pl.BlockSpec((1, block_k, cq), lambda bi, qi, ki: (bi, ki, 0)),
                pl.BlockSpec((1, block_k, cv), lambda bi, qi, ki: (bi, ki, 0)),
                pl.BlockSpec((1, block_q, cv), lambda bi, qi, ki: (bi, qi, 0)),
                lse_spec3(),
                lse_spec3(),
            ],
            out_specs=pl.BlockSpec((1, block_q, cq), lambda bi, qi, ki: (bi, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b, n, cq), q.dtype),
            scratch_shapes=[pltpu.VMEM((block_q, cq), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
            interpret=INTERPRET,
        )(q, k, v, do, lse, dcap)

        lse_spec_kv = lambda: pl.BlockSpec((1, block_q, 1), lambda bi, ki, qi: (bi, qi, 0))
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel, scale=scale, q_axis=2),
            grid=(b, n // block_k, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, cq), lambda bi, ki, qi: (bi, qi, 0)),
                pl.BlockSpec((1, block_k, cq), lambda bi, ki, qi: (bi, ki, 0)),
                pl.BlockSpec((1, block_k, cv), lambda bi, ki, qi: (bi, ki, 0)),
                pl.BlockSpec((1, block_q, cv), lambda bi, ki, qi: (bi, qi, 0)),
                lse_spec_kv(),
                lse_spec_kv(),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, cq), lambda bi, ki, qi: (bi, ki, 0)),
                pl.BlockSpec((1, block_k, cv), lambda bi, ki, qi: (bi, ki, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, n, cq), k.dtype),
                jax.ShapeDtypeStruct((b, n, cv), v.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, cq), jnp.float32),
                pltpu.VMEM((block_k, cv), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
            interpret=INTERPRET,
        )(q, k, v, do, lse, dcap)
        return dq, dk, dv

    d = cq // num_heads
    lse_spec_q = lambda: pl.BlockSpec(
        (1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
    )
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_axis=3),
        grid=(b, num_heads, n // block_q, n // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            lse_spec_q(),
            lse_spec_q(),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, n, cq), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, dcap)

    lse_spec_kv = lambda: pl.BlockSpec(
        (1, 1, block_q, 1), lambda bi, hi, ki, qi: (bi, hi, qi, 0)
    )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_axis=3),
        grid=(b, num_heads, n // block_k, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, hi, ki, qi: (bi, qi, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, ki, qi: (bi, ki, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, ki, qi: (bi, ki, hi)),
            pl.BlockSpec((1, block_q, d), lambda bi, hi, ki, qi: (bi, qi, hi)),
            lse_spec_kv(),
            lse_spec_kv(),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bi, hi, ki, qi: (bi, ki, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, ki, qi: (bi, ki, hi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, cq), k.dtype),
            jax.ShapeDtypeStruct((b, n, cq), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, dcap)
    return dq, dk, dv


def compute_dcap(o: Array, do: Array, num_heads: int = 1) -> Array:
    """D = rowsum(dO * O): (B, N, 1) fp32, or (B, H, N, 1) for packed heads."""
    prod = (do.astype(jnp.float32) * o.astype(jnp.float32))
    if num_heads == 1:
        return prod.sum(axis=-1, keepdims=True)
    b, n, c = o.shape
    per_head = prod.reshape(b, n, num_heads, c // num_heads).sum(axis=-1)  # (B, N, H)
    return per_head.transpose(0, 2, 1)[..., None]  # (B, H, N, 1)
