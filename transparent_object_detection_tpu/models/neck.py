"""Attention PAN neck (reference model/neck.py:5-65, with the B3 repair).

Top-down then bottom-up feature fusion where each fusion node is
TransformerEncoderBlock -> channel-reducing 1x1 ConvBNAct -> CBAM.

The reference constructs each node's TEB at the concatenated channel width
but its CBAM at the reduced width with nothing in between (bug B3, SURVEY.md
§2.2) — the inline shape comments (neck.py:19,25,37,49) show the intended
reduced widths, so this rebuild inserts the missing reducing conv.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.models.blocks import (
    CBAM,
    ConvBNAct,
    TransformerEncoderBlock,
)

Array = jax.Array


def upsample2x_nearest(x: Array) -> Array:
    """Nearest-neighbour 2x spatial upsample (reference nn.Upsample, neck.py:17)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FusionNode(nn.Module):
    """TEB over concat features -> reduce to out_features -> CBAM."""

    out_features: int
    num_heads: int = 8
    dtype: Any = jnp.bfloat16
    norm_dtype: Any = jnp.float32
    lane_align_heads: bool = True
    int8_dense: bool = False
    int8_attn: bool = False
    # fused int8 Pallas path for the reducing 1x1 conv (serving only)
    int8_1x1: bool = False
    # tensor-parallel TEB serving over a (data, model) mesh (ops/teb_tp.py)
    tp_serving: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = TransformerEncoderBlock(
            num_heads=self.num_heads, dtype=self.dtype, norm_dtype=self.norm_dtype,
            lane_align_heads=self.lane_align_heads, int8_dense=self.int8_dense,
            int8_attn=self.int8_attn, tp_serving=self.tp_serving,
            name="teb",
        )(x, train)
        x = ConvBNAct(
            self.out_features, 1, dtype=self.dtype, int8=self.int8_1x1, name="reduce"
        )(x, train)
        return CBAM(dtype=self.dtype, name="cbam")(x, train)


class Neck(nn.Module):
    base_channels: int
    base_depth: int
    deep_mul: float
    num_heads: int = 8
    dtype: Any = jnp.bfloat16
    norm_dtype: Any = jnp.float32
    lane_align_heads: bool = True
    int8_dense: bool = False
    int8_attn: bool = False
    int8_1x1: bool = False
    tp_serving: bool = False
    # Rematerialize fusion nodes in the backward pass: the TEBs hold the
    # largest activations in the network (up to 2048ch x 80x80 tokens); remat
    # trades ~1/3 extra neck FLOPs for a large HBM saving during training
    # (the jax.checkpoint lever from the TPU playbook).
    remat: bool = False

    @nn.compact
    def __call__(
        self, feats: Tuple[Array, Array, Array], train: bool = False
    ) -> Tuple[Array, Array, Array]:
        p3, p4, p5 = feats  # 4c @ /8, 8c @ /16, 16c*dm @ /32
        c = self.base_channels
        c5 = int(c * 16 * self.deep_mul)
        dt, nh = self.dtype, self.num_heads
        node_cls = nn.remat(FusionNode, static_argnums=(2,)) if self.remat else FusionNode
        node_cls = functools.partial(
            node_cls, norm_dtype=self.norm_dtype,
            lane_align_heads=self.lane_align_heads, int8_dense=self.int8_dense,
            int8_attn=self.int8_attn, int8_1x1=self.int8_1x1,
            tp_serving=self.tp_serving,
        )

        # top-down
        h1 = node_cls(c * 8, nh, dt, name="h1")(
            jnp.concatenate([upsample2x_nearest(p5), p4], axis=-1), train
        )  # (c5 + 8c) -> 8c @ /16
        h2 = node_cls(c * 4, nh, dt, name="h2")(
            jnp.concatenate([upsample2x_nearest(h1), p3], axis=-1), train
        )  # (8c + 4c) -> 4c @ /8   == P3 out

        # bottom-up
        h3 = ConvBNAct(c * 4, 3, strides=2, dtype=dt, name="h3")(h2, train)
        h4 = node_cls(c * 8, nh, dt, name="h4")(
            jnp.concatenate([h3, h1], axis=-1), train
        )  # (4c + 8c) -> 8c @ /16  == P4 out
        h5 = ConvBNAct(c * 8, 3, strides=2, dtype=dt, name="h5")(h4, train)
        h6 = node_cls(c5, nh, dt, name="h6")(
            jnp.concatenate([h5, p5], axis=-1), train
        )  # (8c + c5) -> c5 @ /32  == P5 out

        return h2, h4, h6
