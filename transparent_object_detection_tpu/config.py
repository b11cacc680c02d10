"""Configuration system.

The reference has no programmatic config: an unloaded config.yaml, constant
blocks in train.py:43-171 / predict.py:31-85, and a phi table inside
FOCUS._create_model (model.py:63-72). This module subsumes all of those into
dataclasses with one canonical scale table, loadable from YAML/dict.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

# Canonical model-scale table, (base_channels, base_depth, deep_mul), from
# the reference phi table (model.py:63-72). This is the single source of
# truth (the reference also carries an unloaded config.yaml and a hardcoded
# (1024, 4, 1.0) in train.py:94-96 — both subsumed here).
SCALE_TABLE: Dict[str, Tuple[int, int, float]] = {
    "n": (64, 1, 0.33),
    "s": (128, 2, 0.5),
    "m": (256, 3, 0.67),
    "l": (512, 4, 1.0),
    "x": (1024, 5, 1.25),
}


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters."""

    num_classes: int = 1  # the reference ships exactly one class, "Transparent"
    phi: str = "s"
    input_shape: Tuple[int, int] = (640, 640)  # (h, w), divisible by 32
    reg_max: int = 16  # DFL bins (reference blocks.py:147)
    # bf16 compute is the TPU analog of the reference's fp16/GradScaler AMP
    # path (train.py:259-263) — no loss scaler needed on TPU.
    compute_dtype: str = "bfloat16"
    # Round attention-head counts down to a divisor of the channel count when
    # channels % 8 != 0 (repairs the reference 'n'-scale, whose 337-channel
    # TEB cannot instantiate 8-head attention; see SURVEY.md §2.2).
    num_heads: int = 8
    # Rematerialize the neck fusion nodes in the backward pass (training
    # memory vs FLOPs trade; see models/neck.py).
    remat: bool = False
    # LayerNorm compute dtype; "bfloat16" halves LN HBM traffic on the big
    # neck token maps at a small numerics cost.
    norm_dtype: str = "float32"
    # Prefer attention head counts whose head_dim is a multiple of the TPU
    # lane count (128), keeping the packed flash kernel transpose-free (e.g.
    # phi='s' 1536-channel fusion TEBs: 6 heads x 256 instead of 8 x 192).
    # Set False for exact reference head grouping (torch-checkpoint parity).
    lane_align_heads: bool = True
    # Serving quantization: run the neck TEB projections (qkv / attn_out /
    # mlp1 / mlp2 — the FLOP-dominant matmuls) as int8 MXU matmuls with
    # dynamic per-token activation scales. Parameter tree unchanged: a
    # bf16-trained checkpoint deploys as int8 directly. The bf16 FLOP
    # ceiling at phi='s' 640^2 is ~142 imgs/s/chip on v5e; int8 raises it.
    int8_dense: bool = False
    # Serving quantization for the neck TEB attention itself: int8 flash
    # kernel (ops/attention_int8.py) — q per-row scales, k/v per-block
    # scales, fixed-scale softmax weights. Eval-only; training stays on the
    # bf16 flash VJP path.
    int8_attn: bool = False
    # Serving quantization for the big 1x1 convs (C2f/SPPF cv1+cv2 and the
    # FusionNode reduce): conv-BN folded + dynamic int8 quant + int8 MXU
    # matmul + SiLU, one fused Pallas launch per conv (ops/quant_matmul.py).
    # 3x3 / strided / narrow convs stay bf16 (XLA's int8 conv path measured
    # slower than bf16 on v5e — docs/ROADMAP.md).
    int8_1x1: bool = False

    @property
    def scale(self) -> Tuple[int, int, float]:
        if self.phi not in SCALE_TABLE:
            raise ValueError(f"invalid phi {self.phi!r}; choose from {sorted(SCALE_TABLE)}")
        return SCALE_TABLE[self.phi]

    @property
    def base_channels(self) -> int:
        return self.scale[0]

    @property
    def base_depth(self) -> int:
        return self.scale[1]

    @property
    def deep_mul(self) -> float:
        return self.scale[2]

    @property
    def strides(self) -> Tuple[int, int, int]:
        # Computed at build time (repairs reference bug B4: head.py:17 leaves
        # strides zeroed; ultralytics derives them with a dummy forward).
        return (8, 16, 32)

    @property
    def feat_shapes(self) -> Tuple[Tuple[int, int], ...]:
        h, w = self.input_shape
        return tuple((h // s, w // s) for s in self.strides)

    @property
    def num_anchors(self) -> int:
        return sum(h * w for h, w in self.feat_shapes)


@dataclass(frozen=True)
class TrainConfig:
    """Training knobs (reference train.py:43-171 constant block)."""

    seed: int = 11
    # -- schedule ---------------------------------------------------------
    init_epoch: int = 0
    freeze_epoch: int = 50
    unfreeze_epoch: int = 300
    freeze_train: bool = True
    freeze_batch_size: int = 32
    unfreeze_batch_size: int = 16
    # -- optimizer --------------------------------------------------------
    init_lr: float = 1e-2
    min_lr_ratio: float = 0.01  # Min_lr = Init_lr * 0.01
    optimizer_type: str = "sgd"  # "sgd" | "adam"
    momentum: float = 0.937
    weight_decay: float = 5e-4
    lr_decay_type: str = "cos"  # "cos" | "step"
    nbs: int = 64  # nominal batch size for lr scaling (train.py:339)
    grad_clip_norm: float = 10.0  # train_step.py:59
    # -- loss -------------------------------------------------------------
    box_weight: float = 7.5
    cls_weight: float = 0.5
    dfl_weight: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    label_smoothing: float = 0.0
    # -- EMA --------------------------------------------------------------
    ema: bool = True
    ema_decay: float = 0.9999
    ema_tau: int = 2000
    # -- augmentation -----------------------------------------------------
    mosaic: bool = True
    mosaic_prob: float = 0.5
    mixup: bool = True
    mixup_prob: float = 0.5
    special_aug_ratio: float = 0.7
    max_boxes: int = 128  # padded GT slots per image (fixed-shape targets)
    # -- io / logging -----------------------------------------------------
    save_period: int = 10
    save_dir: str = "logs"
    eval_flag: bool = True
    eval_period: int = 10
    num_workers: int = 4
    train_annotation_path: str = "train.txt"
    val_annotation_path: str = "val.txt"

    @property
    def min_lr(self) -> float:
        return self.init_lr * self.min_lr_ratio

    def fit_lr(self, batch_size: int) -> Tuple[float, float]:
        """Batch-size-scaled lr with per-optimizer clamps (train.py:338-345)."""
        lr_limit_max = 1e-3 if self.optimizer_type == "adam" else 5e-2
        lr_limit_min = 3e-4 if self.optimizer_type == "adam" else 5e-4
        init_lr_fit = min(max(batch_size / self.nbs * self.init_lr, lr_limit_min), lr_limit_max)
        min_lr_fit = min(
            max(batch_size / self.nbs * self.min_lr, lr_limit_min * 1e-2), lr_limit_max * 1e-2
        )
        return init_lr_fit, min_lr_fit


@dataclass(frozen=True)
class PredictConfig:
    """Inference knobs (reference predict.py:31-85, callbacks.py:101-104)."""

    confidence: float = 0.5
    nms_iou: float = 0.4  # reference DecodeBox.non_max_suppression default
    max_detections: int = 100
    pre_nms_topk: int = 1024  # candidates kept before on-device NMS
    letterbox_image: bool = True
    nms_mode: str = "exact"  # "exact" greedy parity | "fast" YOLACT-style
    class_agnostic: bool = False


def _from_dict(cls, d: Dict[str, Any]):
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - names
    if unknown:
        raise ValueError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
    return cls(**{k: tuple(v) if isinstance(v, list) else v for k, v in d.items()})


def load_config(path: str):
    """Load {model:…, train:…, predict:…} sections from a YAML/JSON file."""
    import json

    with open(path, encoding="utf-8") as f:
        text = f.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        import yaml  # pyyaml ships with the baked-in deps

        data = yaml.safe_load(text)
    return (
        _from_dict(ModelConfig, data.get("model", {})),
        _from_dict(TrainConfig, data.get("train", {})),
        _from_dict(PredictConfig, data.get("predict", {})),
    )
