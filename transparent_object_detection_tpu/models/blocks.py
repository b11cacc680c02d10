"""Primitive network blocks — flax.linen, NHWC, bf16-compute/fp32-params.

TPU-native rebuild of reference model/blocks.py (288 LoC, PyTorch NCHW):
  ConvBNAct                <- Conv (blocks.py:22-58) + autopad (:6-19)
  Bottleneck               <- blocks.py:61-82
  C2f                      <- blocks.py:85-116
  SPPF                     <- blocks.py:119-142
  dfl_expectation          <- DFL (blocks.py:145-157), as an einsum, no conv
  CBAM                     <- blocks.py:190-223
  SelfAttention            <- blocks.py:226-254
  TransformerEncoderBlock  <- blocks.py:257-289 (repaired:真 batched MHA —
                              the reference feeds batch-first tensors to a
                              seq-first nn.MultiheadAttention, bug B2)
  fuse_conv_bn             <- blocks.py:160-187 + base.py:26-33 (repaired:
                              the reference's fuse() calls a nonexistent
                              method, bug B1) — here a pure pytree transform.

Layout rationale: NHWC keeps the channel axis last (lane dimension), which
is the native layout for TPU convolutions; all convs are bias-free + BN +
SiLU so XLA fuses the elementwise tail into the conv epilogue.
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
Dtype = Any


def _int8_1x1_profitable(m: int, cin: int, cout: int) -> bool:
    """Measured per-shape routing for the fused-int8 1x1 conv path
    (v5e sweep, benchmarks/bench_conv1x1.py, phi='s' 640 batch 32).

    The int8 kernel wins where K is wide enough that the int8 MXU rate
    dominates the per-m-tile quantize prologue (cin>=1536 with cout>=1024:
    the C2f cv2 / SPPF cv2 / FusionNode reduce family, +8-10%), and on the
    large-M 512->256 shape where XLA's bf16 path underperforms ~2.4x
    (dark2 cv2). Bandwidth-bound low-K shapes (256->256), mid squares
    (512->512, 1024->1024) and the 1536->512 reduce measured neutral to
    slower, so they stay on the fused bf16 conv."""
    if cin >= 1536 and cout >= 1024:
        return True
    if (
        cin == 512 and cout == 256 and m >= 100_000
        and os.environ.get("TOD_INT8_1X1_NARROW", "0") == "1"
    ):
        # isolated-matmul microbench showed 2.4x here, but IN-MODEL the
        # bf16 conv fuses with its BN/SiLU/concat neighbours and wins —
        # e2e measured 137.4 -> ~133 imgs/s with this clause on. Kept
        # behind an env flag for future re-measurement only.
        return True
    return False


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-output padding for odd kernels incl. dilation (blocks.py:6-19)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU (reference Conv, blocks.py:22-58).

    Padding is explicit-symmetric (k//2 each side) rather than XLA 'SAME' so
    stride-2 feature maps align with the reference's grid — required for
    checkpoint-importing torch weights without a one-pixel shift.

    Quantization: XLA's int8 conv_general_dilated measured SLOWER than bf16
    on v5e (45-92 TOPS vs 52-126 TF/s across the phi='s' backbone conv
    shapes — docs/ROADMAP.md), so convs as *convs* stay bf16. But a 1x1
    stride-1 conv is a matmul, and `int8=True` (serving only) routes the
    eligible ones through the fused int8 Pallas kernel instead — see the
    field comment below.
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    groups: int = 1
    dilation: int = 1
    act: bool = True
    dtype: Dtype = jnp.bfloat16
    # Serving-only: run an eligible 1x1 stride-1 conv as ONE fused Pallas
    # launch — conv-BN folded at trace time, dynamic int8 quantize, int8 MXU
    # matmul, bias+SiLU epilogue (ops/quant_matmul.py). r3 measurement:
    # XLA's int8 *conv* path was slower than bf16 (r2), but a 1x1 conv IS a
    # (B*H*W, Cin) x (Cin, Cout) matmul, and the fused kernel beats the
    # bf16 form on the model's big 1x1 shapes. Ineligible convs (3x3,
    # strided, grouped, narrow channels) stay bf16.
    int8: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if (
            self.int8 and not train and self.kernel_size == 1
            and self.strides == 1 and self.groups == 1 and self.dilation == 1
            and x.shape[-1] % 128 == 0 and self.features % 256 == 0
            # token count must tile the kernel grid; otherwise the dispatch
            # would hit the XLA-quant fallback, which is SLOWER than bf16
            # (extra HBM passes) — stay on the bf16 conv instead.
            and math.prod(x.shape[:-1]) % 256 == 0
            # measured per-shape routing: only take shapes the kernel wins
            and _int8_1x1_profitable(
                math.prod(x.shape[:-1]), x.shape[-1], self.features
            )
        ):
            from transparent_object_detection_tpu.ops.quant_matmul import (
                quant_matmul,
            )

            cin = x.shape[-1]
            kernel = _ConvParams(self.features, 1, cin, name="conv")()
            scale, bias, mean, var = _BNParams(self.features, name="bn")()
            # fold inference-mode BN into the projection:
            #   BN(x@W) = (x@W - mean) * g + bias,  g = scale/sqrt(var+eps)
            g = scale * jax.lax.rsqrt(var + 1e-5)
            w_eff = kernel.reshape(cin, self.features) * g[None, :]
            b_eff = bias - mean * g
            out = quant_matmul(
                x, w_eff, bias=b_eff, act="silu" if self.act else None,
                out_dtype=self.dtype,
            )
            return out

        p = autopad(self.kernel_size, None, self.dilation)
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,  # normalize in fp32; output cast below
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        x = x.astype(self.dtype)
        if self.act:
            x = jax.nn.silu(x)
        return x


class Bottleneck(nn.Module):
    """Two stacked convs with optional residual add (blocks.py:61-82)."""

    features: int
    shortcut: bool = True
    groups: int = 1
    kernels: Tuple[int, int] = (3, 3)
    expansion: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_hidden = int(self.features * self.expansion)
        y = ConvBNAct(c_hidden, self.kernels[0], dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNAct(
            self.features, self.kernels[1], groups=self.groups, dtype=self.dtype, name="cv2"
        )(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck, 2-conv variant (blocks.py:85-116).

    1x1 conv -> split halves -> chain n Bottlenecks on the running half ->
    concat (2 + n) branches -> 1x1 conv.
    """

    features: int
    n: int = 1
    shortcut: bool = False
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.bfloat16
    # serving-only fused int8 path for the 1x1 cv1/cv2 (see ConvBNAct.int8)
    int8_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_hidden = int(self.features * self.expansion)
        y = ConvBNAct(
            2 * c_hidden, 1, dtype=self.dtype, int8=self.int8_1x1, name="cv1"
        )(x, train)
        parts = [y[..., :c_hidden], y[..., c_hidden:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(
                    c_hidden,
                    shortcut=self.shortcut,
                    groups=self.groups,
                    kernels=(3, 3),
                    expansion=1.0,
                    dtype=self.dtype,
                    name=f"m{i}",
                )(parts[-1], train)
            )
        return ConvBNAct(
            self.features, 1, dtype=self.dtype, int8=self.int8_1x1, name="cv2"
        )(jnp.concatenate(parts, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast variant (blocks.py:119-142)."""

    features: int
    pool_size: int = 5
    dtype: Dtype = jnp.bfloat16
    # serving-only fused int8 path for the 1x1 cv1/cv2 (see ConvBNAct.int8)
    int8_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_in = x.shape[-1]
        y = ConvBNAct(
            c_in // 2, 1, dtype=self.dtype, int8=self.int8_1x1, name="cv1"
        )(x, train)
        k = self.pool_size
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], window_shape=(k, k), strides=(1, 1), padding=((k // 2,) * 2,) * 2
                )
            )
        return ConvBNAct(
            self.features, 1, dtype=self.dtype, int8=self.int8_1x1, name="cv2"
        )(jnp.concatenate(pools, axis=-1), train)


def dfl_expectation(dist_logits: Array, reg_max: int = 16) -> Array:
    """Distribution-Focal decode: softmax over bins -> expected distance.

    The reference implements this as a frozen 1x1 conv whose weights are
    arange(ch) (blocks.py:145-157). On TPU a conv for a dot-with-iota is
    waste; an einsum fuses into the surrounding graph.

    Args:
      dist_logits: (..., 4, reg_max) raw bin logits per box side.
    Returns:
      (..., 4) expected ltrb distances.
    """
    probs = jax.nn.softmax(dist_logits.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...r,r->...", probs, proj)


class CBAM(nn.Module):
    """Convolutional Block Attention Module (blocks.py:190-223).

    Channel attention: global avg+max pool -> shared bottleneck MLP ->
    sigmoid gate. Spatial attention: per-pixel channel mean+max -> KxK conv
    -> sigmoid gate. Both gates are cheap VPU work that XLA fuses around the
    neighbouring convs.
    """

    reduction: int = 16
    kernel_size: int = 7
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = x.shape[-1]
        hidden = max(c // self.reduction, 1)
        mlp_in = nn.Dense(hidden, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")
        mlp_out = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")

        avg = jnp.mean(x, axis=(1, 2))  # (B, C)
        mx = jnp.max(x, axis=(1, 2))
        gate_c = jax.nn.sigmoid(
            mlp_out(jax.nn.relu(mlp_in(avg))) + mlp_out(jax.nn.relu(mlp_in(mx)))
        )
        x = x * gate_c[:, None, None, :]

        avg_sp = jnp.mean(x, axis=-1, keepdims=True)
        max_sp = jnp.max(x, axis=-1, keepdims=True)
        k = self.kernel_size
        gate_s = nn.Conv(
            1,
            kernel_size=(k, k),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="spatial",
        )(jnp.concatenate([avg_sp, max_sp], axis=-1))
        return x * jax.nn.sigmoid(gate_s)


class SelfAttention(nn.Module):
    """Non-local self-attention block (blocks.py:226-254).

    q/k at C/8 channels, v at C; softmax over source positions (unscaled,
    matching the reference); learnable scalar gamma (init 0) gates the
    residual. Large token maps route through the memory-efficient streaming
    attention (ops/attention.py) — the naive N² score matrix at P3
    (80x80 = 6,400 tokens) would dominate HBM traffic.
    """

    dtype: Dtype = jnp.bfloat16
    attention_impl: Optional[str] = None  # None=auto | xla | chunked | pallas
    # int8 flash attention at eval time (dq=C/8, dv=C asymmetric kernel)
    int8_attn: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from transparent_object_detection_tpu.ops.attention import attention

        b, h, w, c = x.shape
        cq = max(c // 8, 1)
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        tokens = x.reshape(b, h * w, c)
        q = dense(cq, "query")(tokens)  # (B, N, cq)
        k = dense(cq, "key")(tokens)
        v = dense(c, "value")(tokens)
        # auto dispatch: the flash path is differentiable (custom VJP with
        # flash-style recomputed backward), so training uses it too
        out = attention(
            q, k, v, scale=1.0, impl=self.attention_impl,
            int8=self.int8_attn and not train,
        )
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        out = gamma.astype(self.dtype) * out + tokens
        return out.reshape(b, h, w, c)


class QuantDense(nn.Module):
    """Dense with int8 MXU matmul — the serving quantization path.

    Parameter tree is IDENTICAL to nn.Dense (fp32 `kernel` + `bias`), so any
    bf16-trained checkpoint loads unchanged; quantization happens at trace
    time inside the forward:

      * weights: per-output-channel symmetric int8 (absmax / 127) — one
        O(weights) pass per step, negligible against the activation matmul
      * activations: dynamic per-token symmetric int8 (absmax over channels)
      * matmul: int8 x int8 -> int32 on the MXU (2x the bf16 rate on v5e),
        dequantized by the rank-1 outer product of the two scale vectors.

    Serving-only: route gradients through the bf16 path during training (the
    straight-through estimator is not implemented — the detector trains in
    bf16 and deploys int8, the production pattern this framework targets).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        w_scale = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0  # (1, F)
        wq = jnp.round(kernel / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # (..., 1)
        xq = jnp.clip(
            jnp.round(xf / jnp.maximum(x_scale, 1e-12)), -127, 127
        ).astype(jnp.int8)

        acc = jax.lax.dot_general(
            xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * x_scale * w_scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias
        return out.astype(self.dtype)


class _ConvParams(nn.Module):
    """Parameter twin of nn.Conv (bias-free; same name/shape/init) for the
    fused int8 1x1 serving path — the matmul runs in the Pallas kernel, so
    only the kernel parameter is declared here. Checkpoints interchange
    with the bf16 path."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self) -> Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_features, self.features),
            jnp.float32,
        )


class _BNParams(nn.Module):
    """Parameter twin of nn.BatchNorm (scale/bias params + mean/var
    batch_stats) for the fused int8 1x1 serving path — inference-mode BN
    folds into the projection weights at trace time."""

    features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, Array, Array, Array]:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean.value, var.value


class _LNParams(nn.Module):
    """Parameter twin of nn.LayerNorm (same names/shapes/inits) for the fused
    int8 TEB path — the LayerNorm math runs inside the Pallas kernel
    (ops/quant_matmul.py), so only the parameters are declared here.
    Checkpoints are interchangeable with the bf16 path."""

    features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter twin of nn.Dense (kernel + bias, same inits) for the fused
    int8 TEB path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> Tuple[Array, Array]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


def _pick_num_heads(channels: int, requested: int, lane_align: bool = True) -> int:
    """Head count <= requested that divides the channel width, preferring
    lane-aligned head dims.

    TPU-first rule: when some h <= requested gives head_dim = channels/h
    that is a multiple of 128 (the TPU lane count), take the largest such h —
    the packed multi-head flash kernel then grids over heads by slicing the
    channel axis with ZERO HBM transposes (ops/attention.py). E.g. the
    phi='s' neck's 1536-channel fusion TEBs run 6 heads of 256 instead of
    8 heads of 192 (which would fall to the transposing fold path on the
    hot 6,400-token map). Otherwise the largest plain divisor <= requested
    (repairs the reference 'n'-scale whose 337-channel TEB cannot host
    8-head attention, SURVEY.md §2.2). lane_align=False restores the plain
    divisor rule (torch-checkpoint parity: exact reference head grouping)."""
    if lane_align:
        for h in range(min(requested, channels), 0, -1):
            if channels % h == 0 and (channels // h) % 128 == 0:
                return h
    for h in range(min(requested, channels), 0, -1):
        if channels % h == 0:
            return h
    return 1


class TransformerEncoderBlock(nn.Module):
    """Pre-LN transformer encoder over spatial tokens (blocks.py:257-289).

    Repairs bug B2: attention runs over the H*W token axis per batch element
    (the reference's seq-first/batch-first mixup attends across the batch).
    """

    num_heads: int = 8
    mlp_ratio: int = 4
    dtype: Dtype = jnp.bfloat16
    attention_impl: Optional[str] = None  # None=auto | xla | chunked | pallas
    # LayerNorm compute dtype: fp32 by default for safety; bf16 halves the
    # LN HBM traffic on the big token maps (ModelConfig.norm_dtype knob).
    norm_dtype: Dtype = jnp.float32
    # Prefer head counts whose head_dim is a 128-lane multiple (see
    # _pick_num_heads); False restores exact reference head grouping.
    lane_align_heads: bool = True
    # int8 serving path: the four projections run as QuantDense (same param
    # tree — bf16-trained checkpoints load unchanged). Attention itself
    # stays bf16 flash unless int8_attn is also set.
    int8_dense: bool = False
    # int8 flash attention kernel at eval time (ops/attention_int8.py)
    int8_attn: bool = False
    # Tensor-parallel serving: the whole TEB body runs as ONE shard_map over
    # a (data, model) mesh — Megatron column/row-parallel projections, local
    # per-head-group attention, psum on the row-parallel outputs
    # (ops/teb_tp.py). Requires TP-CANONICALIZED qkv weights; only reachable
    # through inference.Predictor(mesh with 'model' axis) / FOCUS.serve_mesh.
    # This is how phi='l'/'x' (whose weights+activations exceed one chip's
    # HBM) serve at all.
    tp_serving: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from transparent_object_detection_tpu.ops.attention import attention

        b, h, w, c = x.shape
        n = h * w
        heads = _pick_num_heads(c, self.num_heads, self.lane_align_heads)
        dh = c // heads
        tokens = x.reshape(b, n, c)
        scale = 1.0 / math.sqrt(dh)
        int8_attn = self.int8_attn and not train

        if self.tp_serving and not train:
            from transparent_object_detection_tpu.ops.teb_tp import (
                teb_tp_forward,
            )

            ln1_s, ln1_b = _LNParams(c, name="norm1")()
            ln2_s, ln2_b = _LNParams(c, name="norm2")()
            qkv_w, qkv_b = _DenseParams(3 * c, name="qkv")(c)
            ao_w, ao_b = _DenseParams(c, name="attn_out")(c)
            m1_w, m1_b = _DenseParams(c * self.mlp_ratio, name="mlp1")(c)
            m2_w, m2_b = _DenseParams(c, name="mlp2")(c * self.mlp_ratio)
            tokens = teb_tp_forward(
                tokens,
                dict(
                    ln1_s=ln1_s, ln1_b=ln1_b, ln2_s=ln2_s, ln2_b=ln2_b,
                    qkv_w=qkv_w, qkv_b=qkv_b, ao_w=ao_w, ao_b=ao_b,
                    m1_w=m1_w, m1_b=m1_b, m2_w=m2_w, m2_b=m2_b,
                ),
                heads=heads,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                norm_dtype=self.norm_dtype,
                attention_impl=self.attention_impl,
                int8_dense=self.int8_dense and not train,
                int8_attn=int8_attn,
            )
            return tokens.reshape(b, h, w, c)

        if self.int8_dense and not train:
            # Serving-only (mirrors the int8_attn gating above): under
            # train=True the bf16 branch below runs instead — the fused
            # Pallas kernel has no VJP, and the XLA fallback would silently
            # give zero gradients through round(). The param trees of the
            # two branches are identical (param-twin modules), so routing by
            # `train` never changes the checkpoint structure.
            # Fused serving path: each projection is ONE Pallas launch doing
            # [LayerNorm ->] dynamic-int8 quantize -> int8 MXU matmul ->
            # [bias/gelu/residual] (ops/quant_matmul.py). Parameter tree is
            # identical to the bf16 branch below (param-twin modules), so
            # bf16-trained checkpoints deploy unchanged.
            from transparent_object_detection_tpu.ops.quant_matmul import (
                dequantize,
                ln_quant_out_supported,
                quant_matmul,
            )

            ln1_s, ln1_b = _LNParams(c, name="norm1")()
            ln2_s, ln2_b = _LNParams(c, name="norm2")()
            qkv_w, qkv_b = _DenseParams(3 * c, name="qkv")(c)
            ao_w, ao_b = _DenseParams(c, name="attn_out")(c)
            m1_w, m1_b = _DenseParams(c * self.mlp_ratio, name="mlp1")(c)
            m2_w, m2_b = _DenseParams(c, name="mlp2")(c * self.mlp_ratio)

            # LN handoff (attn_out -> mlp1): attn_out's full-width epilogue
            # additionally emits the LN2-NORMALIZED int8 payload + per-row
            # scales alongside the bf16 residual stream, and mlp1 ingests it
            # on the zero-prologue direct path (its LN2 affine folds into its
            # weights) — mlp1's LN+quantize prologue disappears and its
            # (tokens, C) input read halves (ops/quant_matmul.py ln_quant_out).
            # Row floor: at few rows the ln_out epilogue (LN stats + double
            # store per m-tile) doesn't amortize — batch-1 640² serving
            # (6,400 rows) measured 51.9 ms vs 48.0 without the handoff,
            # while batch-32 (204,800 rows) measured the handoff +0.7 imgs/s.
            # w4a4 mlp1 prototype (VERDICT r4 #3): int4 weights + per-row
            # dynamic int4 activations on the mlp1 projection only — the
            # i4 x i4 MXU dot measured +40% over int8 on the mlp1 shape
            # class (benchmarks/bench_int4.py). Accuracy is MEASURED, not
            # assumed: the hard-set drift gate (E2E_HARD=1 benchmarks/
            # validate_e2e.py) scores this path. Default off pending that
            # measurement; it bypasses the LN handoff (it quantizes raw
            # tokens through its own LN prologue).
            w4a4_mlp1 = (
                os.environ.get("TOD_W4A4_MLP1", "0") == "1"
                and (b * n) % 128 == 0
                and c % 128 == 0
                and (c * self.mlp_ratio) % 128 == 0
            )
            min_rows = int(os.environ.get("TOD_LN_HANDOFF_MIN_ROWS", "51200"))
            ln_handoff = (
                not w4a4_mlp1
                and os.environ.get("TOD_LN_HANDOFF", "1") == "1"
                and b * n >= min_rows
                and ln_quant_out_supported(b * n, c, c, residual=True)
            )

            def attn_out_call(o_val, o_quant=None):
                """attn_out projection + residual; returns (tokens, z_in)
                where z_in is the LN2-normalized payload for mlp1 (or None)."""
                kw = dict(bias=ao_b, residual=tokens, out_dtype=self.dtype)
                if o_quant is not None:
                    kw.update(x_quant=o_quant)
                if ln_handoff:
                    t, p, s = quant_matmul(o_val, ao_w, ln_quant_out=True, **kw)
                    return t, (p, s)
                return quant_matmul(o_val, ao_w, **kw), None

            # Full int8 handoff through the attention sub-block: the qkv
            # projection emits int8 payload + scales, attention consumes
            # them (q zero-copy via a column-offset index map, k/v cheaply
            # REquantized int8->int8 onto per-block scalars) and emits int8
            # + per-(row, head) scales for attn_out's x_quant path — the
            # (B, N, 3C) bf16 qkv and (B, N, C) bf16 o intermediates never
            # round-trip HBM (ops/attention_int8.teb_attention_handoff).
            # Default OFF — measured a NET LOSS on v5e (batch-32 phi='s'
            # serving 135.4/135.5 vs 140.9/141.0 imgs/s, 2x2 A/B): the k/v
            # requantize runs as separate XLA passes (extra HBM round trips
            # over (B, N, C) x2) and the quant_out qkv forgoes the split
            # pquant path's 237-TOPS XLA dot, which together cost more than
            # the saved qkv/o round trips. The mlp1->mlp2 handoff below has
            # no such side passes and measured +2.3 imgs/s; it stays on.
            handoff = None
            if (
                int8_attn
                and n > 1024
                and self.attention_impl in (None, "pallas")
                and os.environ.get("TOD_ATTN_HANDOFF", "0") == "1"
            ):
                from transparent_object_detection_tpu.ops.attention_int8 import (
                    teb_attention_handoff,
                )

                qkv8 = quant_matmul(
                    tokens, qkv_w, bias=qkv_b, ln_scale=ln1_s, ln_bias=ln1_b,
                    out_dtype=self.dtype, quant_out=True,
                    quant_out_align=(c, dh),
                )
                handoff = teb_attention_handoff(
                    qkv8[0], qkv8[1], heads, scale, quant_out=True,
                    out_dtype=self.dtype,
                )
                if handoff is None:
                    qkv = dequantize(qkv8[0], qkv8[1], self.dtype)
            else:
                qkv = quant_matmul(
                    tokens, qkv_w, bias=qkv_b, ln_scale=ln1_s, ln_bias=ln1_b,
                    out_dtype=self.dtype,
                )
            if handoff is not None:
                tokens, z_in = attn_out_call(None, handoff)
            else:
                # Output-side attention handoff (separable from the losing
                # input side above): the int8 flash kernel emits int8 +
                # per-(row, head) scales and attn_out ingests them via
                # x_quant — the (B, N, C) bf16 o intermediate never
                # round-trips HBM and attn_out's bf16 quantize prologue
                # becomes an int8 rescale. The int8 x/out tiles also halve
                # attn_out's VMEM footprint, unlocking taller weight-resident
                # m-tiles (ops/quant_matmul._pick_layout_prequant).
                oq = None
                if (
                    int8_attn
                    and n > 1024
                    and self.attention_impl in (None, "pallas")
                    and (c // heads) % 128 == 0
                    and os.environ.get("TOD_ATTN_QOUT", "0") == "1"
                ):
                    from transparent_object_detection_tpu.ops.attention_int8 import (
                        attention_int8_quant_out,
                    )

                    q, k, v = jnp.split(qkv, 3, axis=-1)
                    oq = attention_int8_quant_out(
                        q, k, v, scale=scale, num_heads=heads
                    )
                if oq is not None:
                    tokens, z_in = attn_out_call(None, oq)
                else:
                    # packed consumption: the flash kernels read q/k/v out
                    # of the fused projection output in place — jnp.split
                    # before a pallas_call materializes each section as a
                    # real HBM copy (ops/attention.attention_qkv)
                    from transparent_object_detection_tpu.ops.attention import (
                        attention_qkv,
                    )

                    o = attention_qkv(
                        qkv, scale=scale, impl=self.attention_impl,
                        num_heads=heads, int8=int8_attn,
                    )
                    tokens, z_in = attn_out_call(o)
            # int8 handoff: mlp1 emits int8 payload + per-(row, group)
            # scales and mlp2 consumes them directly — the (tokens, 4c)
            # gelu intermediate (the largest tensor in the block) never
            # round-trips HBM in bf16, and mlp2's quantize prologue
            # becomes a cheap int8 rescale (ops/quant_matmul.py).
            if z_in is not None:
                z8 = quant_matmul(
                    None, m1_w, bias=m1_b, ln_scale=ln2_s, ln_bias=ln2_b,
                    act="gelu", out_dtype=self.dtype, quant_out=True,
                    x_quant=z_in, x_quant_normalized=True,
                )
            elif w4a4_mlp1:
                from transparent_object_detection_tpu.ops.quant_matmul import (
                    quant_matmul_w4a4,
                )

                z8 = quant_matmul_w4a4(
                    tokens, m1_w, bias=m1_b, ln_scale=ln2_s, ln_bias=ln2_b,
                    act="gelu", out_dtype=self.dtype, quant_out=True,
                )
            else:
                z8 = quant_matmul(
                    tokens, m1_w, bias=m1_b, ln_scale=ln2_s, ln_bias=ln2_b,
                    act="gelu", out_dtype=self.dtype, quant_out=True,
                )
            tokens = quant_matmul(
                None, m2_w, bias=m2_b, residual=tokens, out_dtype=self.dtype,
                x_quant=z8,
            )
            return tokens.reshape(b, h, w, c)

        dense = lambda f, name: nn.Dense(
            f, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )

        y = nn.LayerNorm(dtype=self.norm_dtype, param_dtype=jnp.float32, name="norm1")(tokens)
        y = y.astype(self.dtype)
        qkv = dense(3 * c, "qkv")(y)
        # heads stay packed in the channel axis; the multi-head flash kernel
        # grids over them (no HBM transpose when head_dim is 128-aligned).
        # At eval the packed kernels read q/k/v straight out of the fused
        # projection output (no split copies); training needs the custom-VJP
        # split route.
        if not train:
            from transparent_object_detection_tpu.ops.attention import (
                attention_qkv,
            )

            o = attention_qkv(
                qkv, scale=scale, impl=self.attention_impl,
                num_heads=heads, int8=int8_attn,
            )
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            o = attention(
                q, k, v, scale=scale, impl=self.attention_impl,
                num_heads=heads, int8=int8_attn,
            )
        y = dense(c, "attn_out")(o)
        tokens = tokens + y

        z = nn.LayerNorm(dtype=self.norm_dtype, param_dtype=jnp.float32, name="norm2")(tokens)
        z = z.astype(self.dtype)
        z = dense(c * self.mlp_ratio, "mlp1")(z)
        z = jax.nn.gelu(z)
        z = dense(c, "mlp2")(z)
        tokens = tokens + z
        return tokens.reshape(b, h, w, c)


def fuse_conv_bn(
    params: dict, batch_stats: dict, eps: float = 1e-5
) -> Tuple[dict, dict]:
    """Fold every {conv, bn} ConvBNAct pair — a pure pytree transform.

    Inference-deploy analog of reference fuse_conv/BaseModel.fuse
    (blocks.py:160-187, base.py:26-33; repairs bug B1, which calls a
    nonexistent method). The conv kernel absorbs gamma/sqrt(var+eps); the BN
    collapses to a pure per-channel bias (scale=1, mean=0, var=1-eps), which
    XLA fuses into the conv epilogue. Tree structure is unchanged, so the
    same module applies the fused variables.

    Returns (fused_params, fused_batch_stats).
    """

    def walk(p, s):
        if not isinstance(p, dict):
            return p, s
        new_p, new_s = {}, {} if isinstance(s, dict) else s
        for key in p:
            s_val = s.get(key) if isinstance(s, dict) else None
            if key == "bn" and "conv" in p and isinstance(p[key], dict) and s_val is not None:
                gamma, beta = p[key]["scale"], p[key]["bias"]
                mean, var = s_val["mean"], s_val["var"]
                factor = gamma / jnp.sqrt(var + eps)
                new_p["conv"] = {"kernel": p["conv"]["kernel"] * factor}
                new_p["bn"] = {
                    "scale": jnp.ones_like(gamma),
                    "bias": beta - mean * factor,
                }
                new_s["bn"] = {
                    "mean": jnp.zeros_like(mean),
                    "var": jnp.ones_like(var) - eps,
                }
            elif key == "conv" and "bn" in p:
                continue  # handled with its bn partner
            else:
                np_, ns_ = walk(p[key], s_val)
                new_p[key] = np_
                if isinstance(s, dict) and key in s:
                    new_s[key] = ns_ if ns_ is not None else s[key]
        return new_p, new_s

    fused_p, fused_s = walk(params, batch_stats)
    return fused_p, fused_s
