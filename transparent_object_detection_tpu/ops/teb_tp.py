"""Tensor-parallel TransformerEncoderBlock serving — Megatron-style
shard_map over a (data, model) mesh.

Why this exists: the phi='l'/'x' scales cannot serve on one chip (phi='l'
640² needs ~36.7 GB HBM at batch 4 vs 15.75 GB on a v5e — docs/ROADMAP.md),
and the weight/activation mass is concentrated in the neck TEB projections
(reference model/blocks.py:257-289 — the fp32 Linear stack this framework
re-designs). parallel/tp.py already defines the Megatron shardings and the
TRAINING path uses them through GSPMD; serving cannot, because the int8/flash
Pallas kernels are not GSPMD-partitionable. This module is the serving
equivalent: ONE shard_map spanning the whole TEB body so that

  * qkv / mlp1 kernels run COLUMN-parallel (each rank computes a contiguous
    channel slice of the projection output — the (B, N, 3C) qkv and
    (B, N, 4C) gelu intermediates, the largest tensors in the block, are
    materialized at 1/tp width per chip);
  * attention runs per-head-group LOCALLY on each model rank when the head
    count divides tp (column-sharded q/k/v == contiguous head groups), with
    an exact all-gather fallback for ragged head counts;
  * attn_out / mlp2 run ROW-parallel: each rank contributes a partial
    (B, N, C) product, reduced with one psum over the model axis (ICI);
    bias + residual apply after the reduction;
  * LayerNorms run replicated on the full channel axis (tokens are
    model-replicated), identical math to the single-device path.

The qkv weights must be TP-CANONICALIZED first (parallel/tp.py
canonicalize_qkv_for_tp): the stored [q|k|v] column layout is permuted to
rank-major [q_0|k_0|v_0|q_1|k_1|v_1|...] so a contiguous model-axis shard of
the 3C axis is exactly rank r's (q_r, k_r, v_r). inference.Predictor does
this automatically; applying a tp_serving model with raw weights is a math
error, so this module is only reachable through the Predictor/serve_mesh
entry points.

Numerics: identical function to the single-device TEB up to (a) fp reduction
order across the psum split and (b), on the int8 path, per-rank dynamic
activation scales over the LOCAL K-slice of the row-parallel matmuls (same
quantization-noise class; the column-parallel matmuls see the full K and
quantize identically). The dp×tp serving dryrun matches a single-device fp32
oracle at 1e-4 (__graft_entry__.py).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def _layernorm(x: Array, scale: Array, bias: Array, eps: float, norm_dtype) -> Array:
    """Explicit LayerNorm matching flax nn.LayerNorm (models/blocks.py bf16
    branch): statistics + affine in norm_dtype."""
    xf = x.astype(norm_dtype)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(norm_dtype) + bias.astype(norm_dtype)


def tp_mesh_info():
    """(mesh, data_axis, tp) of the registered compute mesh; tp == 1 when no
    mesh / no 'model' axis is registered."""
    from transparent_object_detection_tpu.ops.shard import get_compute_mesh

    mesh, data_axis = get_compute_mesh()
    if mesh is None:
        return None, data_axis, 1
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return mesh, data_axis, sizes.get("model", 1)


def teb_tp_forward(
    tokens: Array,
    p: Dict[str, Any],
    *,
    heads: int,
    mlp_ratio: int,
    dtype,
    norm_dtype,
    attention_impl,
    int8_dense: bool,
    int8_attn: bool,
    ln_eps: float = 1e-6,
) -> Array:
    """tokens: (B, N, C) -> (B, N, C), TEB body under (data, model) shard_map.

    p holds the twin-declared parameters: ln1_s/ln1_b/ln2_s/ln2_b (C,),
    qkv_w (C, 3C) TP-CANONICALIZED / qkv_b (3C,) canonicalized,
    ao_w (C, C) / ao_b (C,), m1_w (C, rC) / m1_b (rC,), m2_w (rC, C) /
    m2_b (C,).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from transparent_object_detection_tpu.ops.shard import local_compute

    mesh, data_axis, tp = tp_mesh_info()
    if mesh is None or tp <= 1:
        raise RuntimeError(
            "tp_serving TEB requires a registered (data, model) compute mesh "
            "with model-axis size > 1 — build it via FOCUS.serve_mesh(tp=...) "
            "or Predictor(mesh=make_2d_mesh(tp)). Never apply a tp_serving "
            "model outside the Predictor: its qkv weights are TP-canonicalized."
        )
    b, n, c = tokens.shape
    if c % tp or (c * mlp_ratio) % tp:
        raise ValueError(
            f"TEB channel width {c} (mlp {c * mlp_ratio}) not divisible by "
            f"tp={tp}"
        )
    cl = c // tp
    dh = c // heads
    scale = 1.0 / math.sqrt(dh)
    head_local = heads % tp == 0
    fp32 = jnp.float32

    def local_fn(
        tok, qkv_w, qkv_b, ao_w, ao_b, m1_w, m1_b, m2_w, m2_b,
        ln1_s, ln1_b, ln2_s, ln2_b,
    ):
        from transparent_object_detection_tpu.ops.attention import attention
        from transparent_object_detection_tpu.ops.quant_matmul import quant_matmul

        def col_parallel(x, w, bias, lns, lnb, act=None):
            """[LN ->] x @ w_local (+bias_local) — full K, local N."""
            if int8_dense:
                return quant_matmul(
                    x, w, bias=bias, ln_scale=lns, ln_bias=lnb, act=act,
                    ln_eps=ln_eps, out_dtype=dtype,
                )
            y = _layernorm(x, lns, lnb, ln_eps, norm_dtype).astype(dtype)
            out = jnp.dot(y, w.astype(dtype)) + bias.astype(dtype)
            if act == "gelu":
                out = jax.nn.gelu(out)
            return out

        def row_parallel(x, w):
            """x_local @ w_local -> fp32 PARTIAL product (bias/residual are
            applied by the caller after the psum)."""
            if int8_dense:
                return quant_matmul(x, w, out_dtype=fp32)
            return jax.lax.dot_general(
                x.astype(dtype), w.astype(dtype),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=fp32,
            )

        # ---- attention sub-block -------------------------------------
        qkv_l = col_parallel(tok, qkv_w, qkv_b, ln1_s, ln1_b)  # (b, n, 3cl)
        if head_local:
            # canonicalized layout: local columns are (q_r | k_r | v_r) ==
            # this rank's heads/tp contiguous heads; attention is local,
            # zero collectives
            q_l, k_l, v_l = jnp.split(qkv_l, 3, axis=-1)
            o_l = attention(
                q_l, k_l, v_l, scale=scale, impl=attention_impl,
                num_heads=heads // tp, int8=int8_attn,
            )
        else:
            # ragged head count (e.g. 6 heads over tp=4): reconstruct the
            # full q/k/v by all-gathering the rank sections, run attention
            # with the EXACT single-device head grouping, keep the local
            # channel slice of the output for the row-parallel attn_out.
            # Costs one (b, n, 3c) gather + replicated attention compute —
            # only sub-'l' scales hit this (phi 'l'/'x' widths are all
            # 8-head divisible).
            bl = tok.shape[0]  # LOCAL batch (b / dp inside the shard_map)
            gathered = jax.lax.all_gather(qkv_l, "model")  # (tp, bl, n, 3cl)
            sections = jnp.split(gathered, 3, axis=-1)  # 3 x (tp, bl, n, cl)
            q, k, v = (
                jnp.moveaxis(s, 0, -2).reshape(bl, n, c) for s in sections
            )
            o = attention(
                q, k, v, scale=scale, impl=attention_impl,
                num_heads=heads, int8=int8_attn,
            )
            r = jax.lax.axis_index("model")
            o_l = jax.lax.dynamic_slice_in_dim(o, r * cl, cl, axis=-1)
        part = row_parallel(o_l, ao_w)  # (b, n, c) fp32 partial
        attn = jax.lax.psum(part, "model") + ao_b.astype(fp32)
        tok = (tok.astype(fp32) + attn).astype(dtype)

        # ---- MLP sub-block -------------------------------------------
        z_l = col_parallel(tok, m1_w, m1_b, ln2_s, ln2_b, act="gelu")
        part2 = row_parallel(z_l, m2_w)
        mlp = jax.lax.psum(part2, "model") + m2_b.astype(fp32)
        return (tok.astype(fp32) + mlp).astype(dtype)

    dp = P(data_axis)
    col_w, col_b = P(None, "model"), P("model")
    row_w, repl = P("model", None), P()
    with local_compute():
        return shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                dp, col_w, col_b, row_w, repl, col_w, col_b, row_w, repl,
                repl, repl, repl, repl,
            ),
            out_specs=dp,
            check_vma=False,
        )(
            tokens,
            p["qkv_w"], p["qkv_b"], p["ao_w"], p["ao_b"],
            p["m1_w"], p["m1_b"], p["m2_w"], p["m2_b"],
            p["ln1_s"], p["ln1_b"], p["ln2_s"], p["ln2_b"],
        )
