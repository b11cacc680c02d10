"""Box geometry primitives — pure jnp, shape-polymorphic, jit-safe.

TPU-native rebuild of the reference geometry helpers:
  * box format conversions        (reference: model/loss.py:119-138)
  * IoU / GIoU / DIoU / CIoU      (reference: model/loss.py:59-105)
  * box <-> ltrb distance         (reference: model/loss.py:107-117,
                                   utils/bbox_utils.py:39-58)

All functions operate on arrays whose last axis holds box coordinates and
broadcast over every leading axis, so the same code serves the assigner
(B, M, A pairings), the loss (B, A), and the NMS (B, K, K) without any
host loops.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def xywh2xyxy(x: Array) -> Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2) on the last axis."""
    cxy = x[..., 0:2]
    half = x[..., 2:4] * 0.5
    return jnp.concatenate([cxy - half, cxy + half], axis=-1)


def xyxy2xywh(x: Array) -> Array:
    """(x1, y1, x2, y2) -> (cx, cy, w, h) on the last axis."""
    lt = x[..., 0:2]
    rb = x[..., 2:4]
    return jnp.concatenate([(lt + rb) * 0.5, rb - lt], axis=-1)


def bbox_iou(
    box1: Array,
    box2: Array,
    xywh: bool = True,
    kind: str = "iou",
    eps: float = 1e-7,
) -> Array:
    """IoU-family metric between broadcastable box arrays.

    Args:
      box1, box2: (..., 4) arrays; leading axes broadcast.
      xywh: boxes are (cx, cy, w, h) if True else (x1, y1, x2, y2).
      kind: one of "iou", "giou", "diou", "ciou".
      eps: numerical-stability epsilon.

    Returns:
      (...) metric with the broadcast leading shape (last axis consumed).

    Math mirrors the reference CIoU implementation (model/loss.py:59-105),
    including the stop-gradient on the aspect-ratio weighting term alpha.
    """
    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2

    b1_x1, b1_y1, b1_x2, b1_y2 = (b1[..., i] for i in range(4))
    b2_x1, b2_y1, b2_x2, b2_y2 = (b2[..., i] for i in range(4))
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter_w = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
    inter_h = jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0)
    inter = inter_w * inter_h
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if kind == "iou":
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if kind == "giou":
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4.0
    if kind == "diou":
        return iou - rho2 / c2
    if kind == "ciou":
        v = (4.0 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1.0 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    raise ValueError(f"unknown IoU kind: {kind!r}")


def pairwise_iou(boxes1: Array, boxes2: Array, eps: float = 1e-7) -> Array:
    """Plain IoU matrix between two xyxy box sets: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Fixed-shape replacement for torchvision.ops.nms's internal pairwise IoU
    (reference call site utils/bbox_utils.py:170-175).
    """
    return bbox_iou(boxes1[..., :, None, :], boxes2[..., None, :, :], xywh=False, eps=eps)


def bbox2dist(anchor_points: Array, bbox: Array, reg_max: float) -> Array:
    """xyxy boxes -> clipped ltrb distances from anchor points.

    Mirrors reference model/loss.py:107-117 (clamp to [0, reg_max - 0.01]).
    anchor_points: (..., 2); bbox: (..., 4) -> (..., 4) ltrb.
    """
    ltrb = jnp.concatenate(
        [anchor_points - bbox[..., 0:2], bbox[..., 2:4] - anchor_points], axis=-1
    )
    return jnp.clip(ltrb, 0.0, reg_max - 0.01)


def dist2bbox(distance: Array, anchor_points: Array, xywh: bool = True) -> Array:
    """ltrb distances + anchor points -> boxes (xywh or xyxy) on the last axis.

    Mirrors reference utils/bbox_utils.py:39-58.
    """
    lt = distance[..., 0:2]
    rb = distance[..., 2:4]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def make_anchors(
    feat_shapes: Tuple[Tuple[int, int], ...],
    strides: Tuple[int, ...],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[Array, Array]:
    """Anchor-free grid centers and per-anchor strides for each pyramid level.

    Unlike the reference (utils/bbox_utils.py:14-37), which reads shapes off
    live tensors, this takes static (h, w) tuples so the result is a
    compile-time constant under jit — XLA folds it into the decode graph.

    Returns:
      anchor_points: (sum(h*w), 2) of (x + off, y + off) grid centers.
      stride_tensor: (sum(h*w), 1).
    """
    points, stride_chunks = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = (jnp.arange(w, dtype=dtype) + grid_cell_offset)[None, :].repeat(h, axis=0)
        sy = (jnp.arange(h, dtype=dtype) + grid_cell_offset)[:, None].repeat(w, axis=1)
        points.append(jnp.stack([sx, sy], axis=-1).reshape(-1, 2))
        stride_chunks.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(points, axis=0), jnp.concatenate(stride_chunks, axis=0)
