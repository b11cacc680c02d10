#!/usr/bin/env python
"""Reference torch FOCUS checkpoint -> flax variables importer.

Maps a `.pth` state_dict of the reference FOCUS model (BaseModel =
backbone + neck + head, /root/reference/model/{backbone,neck,head,blocks}.py)
onto this framework's parameter tree, with the shape-filtered partial-load
semantics of the reference's own weight loading (train.py:224-239 /
model.py:42): every tensor whose mapped path and shape agree is copied,
everything else stays at init and is reported.

Where the trees diverge by design (the documented repairs):
  * `neck.hN.1` CBAM weights in the reference are constructed at the
    REDUCED width while their actual input would be the concat width (bug
    B3). Our FusionNode inserts the missing reducing ConvBNAct and places
    CBAM after it — at exactly the reference CBAM's constructed width, so
    those weights import cleanly; the reduce conv itself has no reference
    counterpart and stays at init.
  * `head.dfl.conv.weight` is the frozen arange projection — implemented
    here as an einsum with no parameters (models/blocks.py:dfl_expectation).
  * nn.MultiheadAttention packs q/k/v rows in in_proj_weight; our fused qkv
    Dense packs them in columns — transposition maps one onto the other
    exactly (the head-count GROUPING may still differ when
    ModelConfig.lane_align_heads=True; build with lane_align_heads=False for
    bit-level reference attention grouping).

Layout conversions: torch Conv2d OIHW -> flax HWIO; 1x1 Conv2d used as a
linear layer (CBAM fc1/fc2, SelfAttention q/k/v) -> Dense (I, O); Linear
(O, I) -> Dense (I, O); BatchNorm splits into params {scale, bias} +
batch_stats {mean, var}; LayerNorm weight -> scale.

    python tools/focus_import.py --torch-ckpt focus.pth --phi s --out w/
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# module-prefix map: torch name prefix -> flax tree path
PREFIX_MAP: Dict[str, Tuple[str, ...]] = {
    "backbone.stem": ("backbone", "stem"),
    "backbone.dark2.0": ("backbone", "dark2_conv"),
    "backbone.dark2.1": ("backbone", "dark2_c2f"),
    "backbone.dark2.2": ("backbone", "dark2_cbam"),
    "backbone.dark3.0": ("backbone", "dark3_conv"),
    "backbone.dark3.1": ("backbone", "dark3_c2f"),
    "backbone.dark3.2": ("backbone", "dark3_attn"),
    "backbone.dark4.0": ("backbone", "dark4_conv"),
    "backbone.dark4.1": ("backbone", "dark4_c2f"),
    "backbone.dark4.2": ("backbone", "dark4_cbam"),
    "backbone.dark5.0": ("backbone", "dark5_conv"),
    "backbone.dark5.1": ("backbone", "dark5_c2f"),
    "backbone.dark5.2": ("backbone", "dark5_sppf"),
    "neck.h1.0": ("neck", "h1", "teb"),
    "neck.h1.1": ("neck", "h1", "cbam"),
    "neck.h2.0": ("neck", "h2", "teb"),
    "neck.h2.1": ("neck", "h2", "cbam"),
    "neck.h3": ("neck", "h3"),
    "neck.h4.0": ("neck", "h4", "teb"),
    "neck.h4.1": ("neck", "h4", "cbam"),
    "neck.h5": ("neck", "h5"),
    "neck.h6.0": ("neck", "h6", "teb"),
    "neck.h6.1": ("neck", "h6", "cbam"),
}

# head.{box|cls}.{level}.{seq index} -> BranchTower submodule name
_HEAD_SEQ = {"0": "conv1", "1": "cbam1", "2": "conv2", "3": "cbam2", "4": "out"}
_HEAD_RE = re.compile(r"^head\.(box|cls)\.(\d+)\.(\d+)\.(.*)$")


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _to_np(value) -> np.ndarray:
    return np.asarray(getattr(value, "cpu", lambda: value)())


def _match_prefix(name: str):
    """Longest PREFIX_MAP prefix -> (flax base path, remaining torch subpath)."""
    parts = name.split(".")
    for cut in range(len(parts), 0, -1):
        prefix = ".".join(parts[:cut])
        if prefix in PREFIX_MAP:
            return PREFIX_MAP[prefix], parts[cut:]
    return None, None


def _normalize_c2f(sub: List[str]) -> List[str]:
    """ultralytics-style bottleneck list names m.0 -> flax m0."""
    out: List[str] = []
    i = 0
    while i < len(sub):
        if sub[i] == "m" and i + 1 < len(sub) and sub[i + 1].isdigit():
            out.append(f"m{sub[i + 1]}")
            i += 2
        else:
            out.append(sub[i])
            i += 1
    return out


def _convert_leaf(base: Tuple[str, ...], sub: List[str], v: np.ndarray,
                  params: Dict, stats: Dict) -> bool:
    """Route one torch tensor into the flax params/batch_stats trees.

    Returns False for tensors that have no counterpart by design (DFL)."""
    sub = _normalize_c2f(sub)
    *mods, last = sub
    in_cbam = (base and base[-1].endswith("cbam")) or base[-1] in ("cbam1", "cbam2")
    in_teb = base and base[-1] == "teb"

    # --- transformer encoder block (neck TEBs) -----------------------------
    if in_teb:
        if sub[:1] == ["norm1"] or sub[:1] == ["norm2"]:
            field = "scale" if last == "weight" else "bias"
            _set(params, base + (sub[0], field), v)
        elif sub == ["attn", "in_proj_weight"]:
            _set(params, base + ("qkv", "kernel"), v.T)  # (3C, C) -> (C, 3C)
        elif sub == ["attn", "in_proj_bias"]:
            _set(params, base + ("qkv", "bias"), v)
        elif sub == ["attn", "out_proj", "weight"]:
            _set(params, base + ("attn_out", "kernel"), v.T)
        elif sub == ["attn", "out_proj", "bias"]:
            _set(params, base + ("attn_out", "bias"), v)
        elif sub[:2] == ["mlp", "0"]:
            _set(params, base + ("mlp1", "kernel" if last == "weight" else "bias"),
                 v.T if last == "weight" else v)
        elif sub[:2] == ["mlp", "2"]:
            _set(params, base + ("mlp2", "kernel" if last == "weight" else "bias"),
                 v.T if last == "weight" else v)
        else:
            return False
        return True

    # --- CBAM ---------------------------------------------------------------
    if in_cbam:
        if sub[0] in ("fc1", "fc2"):
            # 1x1 Conv2d-as-linear (O, I, 1, 1) -> Dense kernel (I, O)
            _set(params, base + (sub[0], "kernel"), v[:, :, 0, 0].T)
        elif sub[0] == "conv" and last == "weight":
            # spatial 7x7 conv (1, 2, k, k) -> HWIO
            _set(params, base + ("spatial", "kernel"), v.transpose(2, 3, 1, 0))
        else:
            return False
        return True

    # --- SelfAttention (dark3) ----------------------------------------------
    if base[-1] == "dark3_attn" or (base and base[-1].endswith("_attn")):
        if sub[0] in ("query", "key", "value"):
            if last == "weight":
                _set(params, base + (sub[0], "kernel"), v[:, :, 0, 0].T)
            else:
                _set(params, base + (sub[0], "bias"), v)
        elif sub == ["gamma"]:
            _set(params, base + ("gamma",), v.reshape(1))
        else:
            return False
        return True

    # --- ConvBNAct pairs and plain convs -------------------------------------
    if last == "weight" and mods and mods[-1] == "conv":
        _set(params, base + tuple(mods) + ("kernel",), v.transpose(2, 3, 1, 0))
    elif last == "weight" and mods and mods[-1] == "out":
        _set(params, base + tuple(mods) + ("kernel",), v.transpose(2, 3, 1, 0))
    elif last == "bias" and mods and mods[-1] == "out":
        _set(params, base + tuple(mods) + ("bias",), v)
    elif mods and mods[-1] in ("bn", "norm"):
        # reference Conv names its BatchNorm `norm` (blocks.py:49); ours is `bn`
        flax_mods = tuple(mods[:-1]) + ("bn",)
        if last == "weight":
            _set(params, base + flax_mods + ("scale",), v)
        elif last == "bias":
            _set(params, base + flax_mods + ("bias",), v)
        elif last == "running_mean":
            _set(stats, base + flax_mods + ("mean",), v)
        elif last == "running_var":
            _set(stats, base + flax_mods + ("var",), v)
        else:
            return False  # num_batches_tracked
    else:
        return False
    return True


def convert_focus_state_dict(sd: Dict[str, "np.ndarray"]):
    """Reference FOCUS torch state_dict -> (params, batch_stats, unmapped).

    unmapped lists torch names with no flax counterpart (DFL projection,
    num_batches_tracked counters, unknown keys)."""
    params: Dict = {}
    stats: Dict = {}
    unmapped: List[str] = []
    for name, value in sd.items():
        v = _to_np(value)
        m = _HEAD_RE.match(name)
        if m is not None:
            branch, level, seq, rest = m.groups()
            if seq not in _HEAD_SEQ:
                unmapped.append(name)
                continue
            base = ("head", f"{branch}{level}", _HEAD_SEQ[seq])
            sub = rest.split(".")
            # the final 1x1 Conv2d of the tower maps straight to 'out'
            if _HEAD_SEQ[seq] == "out":
                if sub == ["weight"]:
                    _set(params, base + ("kernel",), v.transpose(2, 3, 1, 0))
                elif sub == ["bias"]:
                    _set(params, base + ("bias",), v)
                else:
                    unmapped.append(name)
                continue
            if not _convert_leaf(base, sub, v, params, stats):
                unmapped.append(name)
            continue
        if name.startswith("head.dfl"):
            unmapped.append(name)  # frozen arange projection: einsum here
            continue
        base, sub = _match_prefix(name)
        if base is None:
            unmapped.append(name)
            continue
        if not _convert_leaf(base, list(sub), v, params, stats):
            unmapped.append(name)
    return params, stats, unmapped


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--phi", default="s", choices=list("nsmlx"))
    p.add_argument("--classes", default="model_data/coco_classes.txt")
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    p.add_argument("--strict-heads", action="store_true",
                   help="build with lane_align_heads=False (exact reference "
                        "attention grouping; slower on TPU)")
    args = p.parse_args()

    import torch

    from transparent_object_detection_tpu.api import FOCUS
    from transparent_object_detection_tpu.train.checkpoints import (
        CheckpointManager,
        load_weights_partial,
    )

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats, unmapped = convert_focus_state_dict(sd)

    focus = FOCUS(phi=args.phi, classes_path=args.classes,
                  input_shape=tuple(args.input_shape))
    merged, loaded, skipped = load_weights_partial(
        focus.variables, {"params": params, "batch_stats": stats}
    )
    focus.variables = merged
    print(f"imported {len(loaded)} tensors; {len(skipped)} shape-filtered; "
          f"{len(unmapped)} torch tensors without counterpart")
    for n in unmapped[:20]:
        print(f"  unmapped: {n}")
    cm = CheckpointManager(os.path.dirname(os.path.abspath(args.out)) or ".")
    path = cm.save_tree(os.path.basename(args.out), focus.variables)
    print(f"saved -> {path}")


if __name__ == "__main__":
    main()
