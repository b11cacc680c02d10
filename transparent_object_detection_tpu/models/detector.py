"""Full detector composition + build helpers (reference model/base.py:7-33,
scale table model.py:63-72).

`FocusModel` = Backbone -> Neck -> Head. Train mode returns raw per-level
head maps for the loss; eval mode also returns the on-device decoded
(B, sum(HW), 4+nc) tensor.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transparent_object_detection_tpu.config import ModelConfig
from transparent_object_detection_tpu.models.backbone import Backbone
from transparent_object_detection_tpu.models.head import Head
from transparent_object_detection_tpu.models.neck import Neck

Array = jax.Array


class FocusModel(nn.Module):
    """The FOCUS detector graph (reference BaseModel, model/base.py:7-24)."""

    num_classes: int = 1
    base_channels: int = 128
    base_depth: int = 2
    deep_mul: float = 0.5
    num_heads: int = 8
    reg_max: int = 16
    strides: Tuple[int, int, int] = (8, 16, 32)
    dtype: Any = jnp.bfloat16
    remat: bool = False
    norm_dtype: Any = jnp.float32
    lane_align_heads: bool = True
    # int8 TEB projections (serving); bf16-trained params load unchanged
    int8_dense: bool = False
    # int8 flash attention in the TEBs (serving)
    int8_attn: bool = False
    # fused int8 path for the big 1x1 convs (C2f/SPPF cv1+cv2, FusionNode
    # reduce) — serving only; bf16-trained params load unchanged
    int8_1x1: bool = False
    # tensor-parallel serving of the neck TEBs over a (data, model) mesh
    # (ops/teb_tp.py) — requires TP-canonicalized weights; set only by
    # inference.Predictor. This is the phi='l'/'x' serving path.
    tp_serving: bool = False

    @property
    def head_filters(self) -> Tuple[int, int, int]:
        # Feature widths entering the head (base.py:14).
        return (
            self.base_channels * 4,
            self.base_channels * 8,
            int(self.base_channels * 16 * self.deep_mul),
        )

    @nn.compact
    def __call__(
        self, images: Array, train: bool = False, decode: bool = True
    ) -> Dict[str, Any]:
        """images: (B, H, W, 3) float in [0, 1], H and W divisible by 32.

        decode=False skips the eval-mode DFL decode (e.g. validation-loss
        passes that only need the raw maps)."""
        x = images.astype(self.dtype)
        feats = Backbone(
            self.base_channels, self.base_depth, self.deep_mul, dtype=self.dtype,
            int8_attn=self.int8_attn, int8_1x1=self.int8_1x1, name="backbone"
        )(x, train)
        feats = Neck(
            self.base_channels,
            self.base_depth,
            self.deep_mul,
            num_heads=self.num_heads,
            dtype=self.dtype,
            norm_dtype=self.norm_dtype,
            lane_align_heads=self.lane_align_heads,
            int8_dense=self.int8_dense,
            int8_attn=self.int8_attn,
            int8_1x1=self.int8_1x1,
            tp_serving=self.tp_serving,
            remat=self.remat,
            name="neck",
        )(feats, train)
        raw, decoded = Head(
            num_classes=self.num_classes,
            filters=self.head_filters,
            strides=self.strides,
            reg_max=self.reg_max,
            dtype=self.dtype,
            name="head",
        )(list(feats), train, decode)
        out: Dict[str, Any] = {"raw": tuple(raw)}
        if not train and decode:
            out["decoded"] = decoded
        return out


def build_model(cfg: ModelConfig) -> FocusModel:
    """Construct a FocusModel from the canonical phi scale table."""
    return FocusModel(
        num_classes=cfg.num_classes,
        base_channels=cfg.base_channels,
        base_depth=cfg.base_depth,
        deep_mul=cfg.deep_mul,
        num_heads=cfg.num_heads,
        reg_max=cfg.reg_max,
        strides=cfg.strides,
        dtype=jnp.dtype(cfg.compute_dtype),
        remat=cfg.remat,
        norm_dtype=jnp.dtype(cfg.norm_dtype),
        lane_align_heads=cfg.lane_align_heads,
        int8_dense=cfg.int8_dense,
        int8_attn=cfg.int8_attn,
        int8_1x1=cfg.int8_1x1,
    )


def init_variables(model: FocusModel, cfg: ModelConfig, seed: int = 0):
    """Initialize {params, batch_stats} with a dummy forward at input_shape."""
    h, w = cfg.input_shape
    dummy = jnp.zeros((1, h, w, 3), dtype=jnp.float32)
    return model.init({"params": jax.random.key(seed)}, dummy, train=True)


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
