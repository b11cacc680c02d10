"""Host-side (PIL) image helpers — parity path for single-image prediction.

Reference: utils/utils.py:9-30. The high-throughput path uses the
vectorized device pipeline in ops/preprocess.py instead; these helpers exist
so single-image prediction matches the reference's PIL-BICUBIC letterboxing
bit-for-behavior.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def cvt_color(image: Image.Image) -> Image.Image:
    """Ensure 3-channel RGB (reference utils/utils.py:9-14)."""
    if image.mode == "RGB":
        return image
    return image.convert("RGB")


def resize_image(
    image: Image.Image, size: Tuple[int, int], letterbox_image: bool = False
) -> Image.Image:
    """Resize to (w, h), optionally letterboxing onto a gray canvas.

    Mirrors reference utils/utils.py:16-30: BICUBIC resample, (128,128,128)
    padding, centered placement with floor-div offsets.
    """
    iw, ih = image.size
    w, h = size
    if letterbox_image:
        scale = min(w / iw, h / ih)
        nw, nh = int(iw * scale), int(ih * scale)
        image = image.resize((nw, nh), Image.BICUBIC)
        canvas = Image.new("RGB", size, (128, 128, 128))
        canvas.paste(image, ((w - nw) // 2, (h - nh) // 2))
        return canvas
    return image.resize((w, h), Image.BICUBIC)


def letterbox_params(
    image_shape: Tuple[int, int], input_shape: Tuple[int, int]
) -> Tuple[float, Tuple[int, int]]:
    """Return (scale, (dx, dy)) the letterbox applied for a (h, w) image."""
    ih, iw = image_shape
    h, w = input_shape
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    return scale, ((w - nw) // 2, (h - nh) // 2)


def image_to_array(image: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC array in [0, 1]."""
    return np.asarray(image, dtype=np.float32) / 255.0
