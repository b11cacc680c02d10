#!/usr/bin/env python
"""YOLOv8 -> FOCUS transfer-learning import (reference yolo.py:4-38).

Maps an ultralytics YOLOv8 torch checkpoint's backbone tensors onto this
framework's flax parameter tree (OIHW -> HWIO, BN split into params +
batch_stats), then does a shape-filtered partial merge — the semantics of
the reference's name-matched state_dict intersection, made to actually
match (the reference's own tool compares `model.N.*` torch names against
`backbone.*` names, so it copies nothing; SURVEY.md B10).

YOLOv8 backbone layout (model.0-9) corresponds 1:1 to our Backbone:
  0 stem | 1 dark2_conv | 2 dark2_c2f | 3 dark3_conv | 4 dark3_c2f
  5 dark4_conv | 6 dark4_c2f | 7 dark5_conv | 8 dark5_c2f | 9 dark5_sppf
Attention blocks (CBAM/SelfAttention) have no YOLOv8 counterpart and stay
at init, as do neck/head (shapes differ by design).

    python tools/yolo_import.py --torch-ckpt yolov8l.pt --phi n --out w/
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YOLO_TO_FOCUS = {
    "model.0": ("backbone", "stem"),
    "model.1": ("backbone", "dark2_conv"),
    "model.2": ("backbone", "dark2_c2f"),
    "model.3": ("backbone", "dark3_conv"),
    "model.4": ("backbone", "dark3_c2f"),
    "model.5": ("backbone", "dark4_conv"),
    "model.6": ("backbone", "dark4_c2f"),
    "model.7": ("backbone", "dark5_conv"),
    "model.8": ("backbone", "dark5_c2f"),
    "model.9": ("backbone", "dark5_sppf"),
}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_yolov8_state_dict(sd: Dict[str, "np.ndarray"]):
    """torch state-dict (tensor or ndarray values) -> (params, batch_stats)
    partial flax trees covering the backbone."""
    params: Dict = {}
    stats: Dict = {}
    for name, value in sd.items():
        v = np.asarray(getattr(value, "cpu", lambda: value)())
        parts = name.split(".")
        prefix = ".".join(parts[:2])
        if prefix not in YOLO_TO_FOCUS:
            continue
        base = YOLO_TO_FOCUS[prefix]
        sub = parts[2:]  # e.g. ['conv','weight'] or ['m','0','cv2','bn','bias']
        # normalize ultralytics C2f bottleneck list names m.0 -> m0
        flax_sub = []
        i = 0
        while i < len(sub):
            if sub[i] == "m" and i + 1 < len(sub) and sub[i + 1].isdigit():
                flax_sub.append(f"m{sub[i + 1]}")
                i += 2
            else:
                flax_sub.append(sub[i])
                i += 1
        *mods, last = flax_sub
        if last == "weight" and mods and mods[-1] == "conv":
            _set(params, base + tuple(mods) + ("kernel",), v.transpose(2, 3, 1, 0))
        elif mods and mods[-1] == "bn":
            if last == "weight":
                _set(params, base + tuple(mods) + ("scale",), v)
            elif last == "bias":
                _set(params, base + tuple(mods) + ("bias",), v)
            elif last == "running_mean":
                _set(stats, base + tuple(mods) + ("mean",), v)
            elif last == "running_var":
                _set(stats, base + tuple(mods) + ("var",), v)
    return params, stats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--phi", default="n", choices=list("nsmlx"))
    p.add_argument("--classes", default="model_data/coco_classes.txt")
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    args = p.parse_args()

    import torch

    from transparent_object_detection_tpu.api import FOCUS
    from transparent_object_detection_tpu.train.checkpoints import (
        CheckpointManager,
        load_weights_partial,
    )

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = convert_yolov8_state_dict(sd)

    focus = FOCUS(phi=args.phi, classes_path=args.classes,
                  input_shape=tuple(args.input_shape))
    merged, loaded, skipped = load_weights_partial(
        focus.variables, {"params": params, "batch_stats": stats}
    )
    focus.variables = merged
    print(f"transferred {len(loaded)} tensors; {len(skipped)} stay at init")
    cm = CheckpointManager(os.path.dirname(os.path.abspath(args.out)) or ".")
    path = cm.save_tree(os.path.basename(args.out), focus.variables)
    print(f"saved -> {path}")


if __name__ == "__main__":
    main()
