"""Vectorized on-device preprocessing (letterbox) and box un-letterboxing.

The reference letterboxes on host with PIL per image
(utils/utils.py:16-30, utils/dataloader.py:76-99) and undoes the letterbox
on host numpy (utils/bbox_utils.py:84-117). Here both directions are
static-shape jnp so they fuse into the jitted inference graph: batch resize
rides the XLA convolution/gather units and boxes never leave the device.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

GRAY = 128.0 / 255.0  # letterbox canvas fill (reference uses RGB 128)


def letterbox_batch(
    images: Array,
    input_shape: Tuple[int, int],
    method: str = "linear",
) -> Array:
    """Aspect-preserving resize + centered pad of a uniform-size batch.

    Args:
      images: (B, H, W, 3) float in [0, 1] (use .astype(float)/255 before).
      input_shape: target (h, w); static under jit.
      method: jax.image.resize method ("linear" for speed; "cubic" matches
        the reference's PIL BICUBIC most closely).

    Returns (B, h, w, 3).
    """
    b, ih, iw, c = images.shape
    h, w = input_shape
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    resized = jax.image.resize(images, (b, nh, nw, c), method=method)
    dy, dx = (h - nh) // 2, (w - nw) // 2
    canvas = jnp.full((b, h, w, c), GRAY, dtype=images.dtype)
    return jax.lax.dynamic_update_slice(canvas, resized, (0, dy, dx, 0))


def unletterbox_boxes(
    boxes: Array,
    input_shape: Tuple[int, int],
    image_shapes: Array,
    letterbox_image: bool = True,
) -> Array:
    """Map xyxy boxes from input-pixel space back to original-image pixels.

    Vectorized equivalent of DecodeBox.correct_boxes
    (utils/bbox_utils.py:84-117), but batched: image_shapes is (B, 2) of
    per-image (h, w) so a whole eval batch is corrected in one op. Returns
    xyxy (x1, y1, x2, y2) in original-image pixels — note the reference
    returns y1x1y2x2; callers here always use xyxy (repairs the axis-order
    trap consumed at callbacks.py:173).
    """
    h_in, w_in = input_shape
    ih = image_shapes[..., 0:1].astype(boxes.dtype)  # (B, 1)
    iw = image_shapes[..., 1:2].astype(boxes.dtype)

    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    if letterbox_image:
        scale = jnp.minimum(w_in / iw, h_in / ih)  # (B, 1)
        nw = (iw * scale).astype(jnp.int32).astype(boxes.dtype)
        nh = (ih * scale).astype(jnp.int32).astype(boxes.dtype)
        dx = (w_in - nw) // 2
        dy = (h_in - nh) // 2
        x1 = (x1 - dx) / scale
        x2 = (x2 - dx) / scale
        y1 = (y1 - dy) / scale
        y2 = (y2 - dy) / scale
    else:
        x1 = x1 * iw / w_in
        x2 = x2 * iw / w_in
        y1 = y1 * ih / h_in
        y2 = y2 * ih / h_in

    x1 = jnp.clip(x1, 0, iw)
    x2 = jnp.clip(x2, 0, iw)
    y1 = jnp.clip(y1, 0, ih)
    y2 = jnp.clip(y2, 0, ih)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
