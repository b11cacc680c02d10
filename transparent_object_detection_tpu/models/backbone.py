"""CSP backbone with interleaved attention (reference model/backbone.py:5-59).

Five stages on an NHWC image:
  stem   Conv s2            3 -> c            /2
  dark2  Conv s2 + C2f(d)  + CBAM   -> 2c     /4
  dark3  Conv s2 + C2f(2d) + SelfAttention -> 4c   /8   (P3 out)
  dark4  Conv s2 + C2f(2d) + CBAM   -> 8c     /16  (P4 out)
  dark5  Conv s2 + C2f(d)  + SPPF   -> 16c*deep_mul  /32  (P5 out)
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.models.blocks import (
    C2f,
    CBAM,
    ConvBNAct,
    SelfAttention,
    SPPF,
)

Array = jax.Array


class Backbone(nn.Module):
    base_channels: int
    base_depth: int
    deep_mul: float
    dtype: Any = jnp.bfloat16
    # int8 flash attention in dark3's SelfAttention at eval time (serving)
    int8_attn: bool = False
    # fused int8 Pallas path for the C2f/SPPF 1x1 convs (serving only)
    int8_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array, Array]:
        c, d = self.base_channels, self.base_depth
        c5 = int(c * 16 * self.deep_mul)
        dt = self.dtype
        q = self.int8_1x1

        x = ConvBNAct(c, 3, strides=2, dtype=dt, name="stem")(x, train)

        x = ConvBNAct(c * 2, 3, strides=2, dtype=dt, name="dark2_conv")(x, train)
        x = C2f(c * 2, n=d, shortcut=True, dtype=dt, int8_1x1=q, name="dark2_c2f")(x, train)
        x = CBAM(dtype=dt, name="dark2_cbam")(x, train)

        x = ConvBNAct(c * 4, 3, strides=2, dtype=dt, name="dark3_conv")(x, train)
        x = C2f(c * 4, n=d * 2, shortcut=True, dtype=dt, int8_1x1=q, name="dark3_c2f")(x, train)
        x = SelfAttention(dtype=dt, int8_attn=self.int8_attn, name="dark3_attn")(x, train)
        feat1 = x  # (B, H/8, W/8, 4c)

        x = ConvBNAct(c * 8, 3, strides=2, dtype=dt, name="dark4_conv")(x, train)
        x = C2f(c * 8, n=d * 2, shortcut=True, dtype=dt, int8_1x1=q, name="dark4_c2f")(x, train)
        x = CBAM(dtype=dt, name="dark4_cbam")(x, train)
        feat2 = x  # (B, H/16, W/16, 8c)

        x = ConvBNAct(c5, 3, strides=2, dtype=dt, name="dark5_conv")(x, train)
        x = C2f(c5, n=d, shortcut=True, dtype=dt, int8_1x1=q, name="dark5_c2f")(x, train)
        x = SPPF(c5, pool_size=5, dtype=dt, int8_1x1=q, name="dark5_sppf")(x, train)
        feat3 = x  # (B, H/32, W/32, 16c*deep_mul)

        return feat1, feat2, feat3
