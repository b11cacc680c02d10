"""Anchor-free decoupled detection head with DFL (reference model/head.py:7-73).

Per pyramid level: a box branch (Conv3x3 -> CBAM -> Conv3x3 -> CBAM -> 1x1
to 4*reg_max DFL logits) and a cls branch (same trunk widths -> 1x1 to nc).
Train mode returns the raw per-level maps; eval mode additionally decodes to
(B, sum(HW), 4 + nc) — xywh boxes in input pixels + sigmoid class scores —
entirely on device with static shapes.

Repairs vs reference:
  * strides are build-time constants (8, 16, 32) — the reference leaves
    head.stride zeroed (bug B4, head.py:17) which silently zeroes both the
    eval decode and the prior-prob bias init.
  * DFL is an einsum (models/blocks.py:dfl_expectation), not a frozen conv.
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.models.blocks import CBAM, ConvBNAct, dfl_expectation
from transparent_object_detection_tpu.ops.geometry import make_anchors

Array = jax.Array


class BranchTower(nn.Module):
    """Conv3x3 -> CBAM -> Conv3x3 -> CBAM -> plain 1x1 conv (head.py:24-46)."""

    mid_features: int
    out_features: int
    bias_init_value: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dt = self.dtype
        x = ConvBNAct(self.mid_features, 3, dtype=dt, name="conv1")(x, train)
        x = CBAM(dtype=dt, name="cbam1")(x, train)
        x = ConvBNAct(self.mid_features, 3, dtype=dt, name="conv2")(x, train)
        x = CBAM(dtype=dt, name="cbam2")(x, train)
        return nn.Conv(
            self.out_features,
            kernel_size=(1, 1),
            use_bias=True,
            bias_init=nn.initializers.constant(self.bias_init_value),
            dtype=dt,
            param_dtype=jnp.float32,
            name="out",
        )(x)


class Head(nn.Module):
    num_classes: int
    filters: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (8, 16, 32)
    reg_max: int = 16
    dtype: Any = jnp.bfloat16

    def cls_bias(self, stride: int) -> float:
        """Prior-probability bias (head.py:63-73): log(5/nc/(640/s)^2)."""
        return math.log(max(5.0 / self.num_classes / (640.0 / stride) ** 2, 1e-10))

    @nn.compact
    def __call__(
        self, feats: Sequence[Array], train: bool = False, decode: bool = True
    ) -> Tuple[List[Array], Array]:
        c1 = max(self.filters[0], self.num_classes)
        c2 = max(self.filters[0] // 4, self.reg_max * 4)

        raw: List[Array] = []
        for i, x in enumerate(feats):
            box = BranchTower(
                c2, 4 * self.reg_max, bias_init_value=1.0, dtype=self.dtype, name=f"box{i}"
            )(x, train)
            cls = BranchTower(
                c1,
                self.num_classes,
                bias_init_value=self.cls_bias(self.strides[i]),
                dtype=self.dtype,
                name=f"cls{i}",
            )(x, train)
            raw.append(jnp.concatenate([box, cls], axis=-1))  # (B, H, W, 4*reg_max + nc)

        if train or not decode:
            return raw, jnp.zeros((), dtype=jnp.float32)
        return raw, self.decode(raw)

    def decode(self, raw: Sequence[Array]) -> Array:
        """Raw maps -> (B, sum(HW), 4 + nc): xywh in input pixels, sigmoid cls.

        Mirrors head.py:50-61: DFL expectation -> distances around the grid
        anchors -> xywh * stride, concat sigmoid class scores. Anchors are
        compile-time constants folded by XLA.
        """
        b = raw[0].shape[0]
        feat_shapes = tuple((m.shape[1], m.shape[2]) for m in raw)
        anchors, stride_t = make_anchors(feat_shapes, self.strides, 0.5)

        flat = jnp.concatenate(
            [m.reshape(b, -1, 4 * self.reg_max + self.num_classes) for m in raw], axis=1
        )
        box_logits = flat[..., : 4 * self.reg_max].astype(jnp.float32)
        cls_logits = flat[..., 4 * self.reg_max :].astype(jnp.float32)

        dist = dfl_expectation(
            box_logits.reshape(b, -1, 4, self.reg_max), self.reg_max
        )  # (B, A, 4) ltrb in grid units
        x1y1 = anchors[None] - dist[..., 0:2]
        x2y2 = anchors[None] + dist[..., 2:4]
        xywh = jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], axis=-1) * stride_t[None]
        return jnp.concatenate([xywh, jax.nn.sigmoid(cls_logits)], axis=-1)
