"""Tests for device letterbox + box un-letterboxing (ops/preprocess.py)."""
import jax.numpy as jnp
import numpy as np

from transparent_object_detection_tpu.ops import letterbox_batch, unletterbox_boxes
from transparent_object_detection_tpu.ops.preprocess import GRAY


def test_letterbox_pads_gray_wide_image():
    img = jnp.ones((1, 100, 200, 3), dtype=jnp.float32)  # wide -> pad top/bottom
    out = letterbox_batch(img, (64, 64))
    assert out.shape == (1, 64, 64, 3)
    # scale = 64/200 = 0.32 -> nh = 32, dy = 16
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [GRAY] * 3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 32, 32]), [1.0] * 3, atol=1e-5)


def test_letterbox_identity_when_square():
    img = jnp.full((2, 64, 64, 3), 0.25, dtype=jnp.float32)
    out = letterbox_batch(img, (64, 64))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_unletterbox_roundtrip():
    # Original image 100x200 (h, w), letterboxed to 64x64: scale=0.32, dy=16.
    input_shape = (64, 64)
    image_shapes = jnp.asarray([[100, 200]], dtype=jnp.float32)
    # Box at original pixels (20, 10, 180, 90) -> input pixels
    scale = 0.32
    orig = np.array([20.0, 10.0, 180.0, 90.0])
    in_pix = np.array(
        [orig[0] * scale + 0, orig[1] * scale + 16, orig[2] * scale + 0, orig[3] * scale + 16]
    )
    boxes = jnp.asarray(in_pix, dtype=jnp.float32)[None, None, :]
    back = unletterbox_boxes(boxes, input_shape, image_shapes, letterbox_image=True)
    np.testing.assert_allclose(np.asarray(back[0, 0]), orig, atol=0.5)


def test_unletterbox_plain_resize():
    input_shape = (64, 64)
    image_shapes = jnp.asarray([[128, 256]], dtype=jnp.float32)
    boxes = jnp.asarray([[[32.0, 32.0, 64.0, 64.0]]], dtype=jnp.float32)
    back = unletterbox_boxes(boxes, input_shape, image_shapes, letterbox_image=False)
    np.testing.assert_allclose(np.asarray(back[0, 0]), [128.0, 64.0, 256.0, 128.0], atol=1e-3)


def test_unletterbox_clips_to_image():
    input_shape = (64, 64)
    image_shapes = jnp.asarray([[100, 200]], dtype=jnp.float32)
    boxes = jnp.asarray([[[-5.0, 0.0, 500.0, 500.0]]], dtype=jnp.float32)
    back = unletterbox_boxes(boxes, input_shape, image_shapes, letterbox_image=True)
    b = np.asarray(back[0, 0])
    assert b[0] >= 0 and b[1] >= 0 and b[2] <= 200 and b[3] <= 100
