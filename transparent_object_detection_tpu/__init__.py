"""Transparent-Object-Detection, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the FOCUS transparent-object
detector (reference: mohamed22311/Transparent-Object-Detection) — an
anchor-free YOLOv8-style network (CSP backbone + attention-augmented PAN
neck + decoupled DFL head) with task-aligned assignment, CIoU+DFL+BCE loss,
mosaic/mixup data pipeline, EMA, and VOC/COCO mAP evaluation.

Design: flax.linen modules in NHWC, bf16 compute / fp32 params, jit-compiled
train and inference steps, fully on-device fixed-shape decode + NMS, data
parallelism via jax.sharding.Mesh, orbax checkpoints.

One unambiguous package (repairs the reference's model.py/model/ package
shadowing, SURVEY.md B6): everything is importable from here.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS even when a sitecustomize hook (e.g. a TPU-tunnel
    # plugin) registered backends before env processing: the env value wins
    # only if applied to the live config. Without this, JAX_PLATFORMS=cpu
    # tool runs silently land on the TPU. No-op when jax is already
    # initialized (tests set the config in conftest first).
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001 - never block package import
        pass

from transparent_object_detection_tpu.config import (  # noqa: F401
    ModelConfig,
    PredictConfig,
    TrainConfig,
    SCALE_TABLE,
    load_config,
)

_LAZY = {"FOCUS": "transparent_object_detection_tpu.api"}


def __getattr__(name):
    # Lazy top-level API import: keeps `import transparent_object_detection_tpu`
    # cheap for ops-only users and avoids import cycles.
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
