"""Native preprocessing kernel tests: build, correctness vs the numpy/cv2
reference paths, and a rough speed sanity check."""
import numpy as np
import pytest

from transparent_object_detection_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_letterbox_matches_python_path(rng):
    from transparent_object_detection_tpu.data.augment import letterbox_deterministic

    img = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    got = native.letterbox_u8(img, (64, 64))
    want, _ = letterbox_deterministic(img, np.zeros((0, 5)), (64, 64))
    want = want.astype(np.float32) / 255.0
    assert got.shape == (64, 64, 3)
    # interpolation differs (bilinear vs cubic) but padding + geometry match
    np.testing.assert_allclose(got[0, 0], [128 / 255.0] * 3, atol=1e-6)  # pad rows
    # content region aligned: mean brightness close
    assert abs(float(got[8:56].mean()) - float(want[8:56].mean())) < 0.02


def test_letterbox_batch(rng):
    imgs = rng.integers(0, 255, size=(4, 100, 80, 3), dtype=np.uint8)
    out = native.letterbox_batch_u8(imgs, (64, 64))
    assert out.shape == (4, 64, 64, 3)
    single = native.letterbox_u8(imgs[2], (64, 64))
    np.testing.assert_allclose(out[2], single, atol=1e-6)


def test_letterbox_identity_roundtrip(rng):
    img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    out = native.letterbox_u8(img, (64, 64))
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-5)


def test_hsv_jitter_identity_gains(rng):
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    out = native.hsv_jitter_u8(img.copy(), 1.0, 1.0, 1.0)
    # identity gains: only HSV<->RGB roundtrip error remains
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_hsv_jitter_value_gain_brightens():
    img = np.full((16, 16, 3), 100, dtype=np.uint8)
    out = native.hsv_jitter_u8(img.copy(), 1.0, 1.0, 1.4)
    assert out.mean() > 130


def test_mosaic4_native_matches_numpy_fallback(rng):
    """The fused mosaic kernel reproduces the cv2/numpy path: identical RNG
    stream (same boxes), pixel field within bilinear rounding tolerance."""
    from transparent_object_detection_tpu.data import augment, native

    if not native.available():
        pytest.skip("no native toolchain")

    imgs = [
        rng.integers(0, 255, size=(np.random.randint(40, 90), np.random.randint(40, 90), 3)).astype(np.uint8)
        for _ in range(4)
    ]
    boxes = [
        np.asarray([[5, 5, 30, 30, 0]], dtype=np.float32) for _ in range(4)
    ]

    import os

    os.environ["TOD_NATIVE_MOSAIC"] = "1"
    try:
        out_n, boxes_n = augment.mosaic4(imgs, boxes, (96, 96), np.random.default_rng(5))
    finally:
        os.environ.pop("TOD_NATIVE_MOSAIC", None)

    # numpy/cv2 path (the default) with the same RNG stream
    out_p, boxes_p = augment.mosaic4(imgs, boxes, (96, 96), np.random.default_rng(5))

    np.testing.assert_allclose(boxes_n, boxes_p, atol=1e-5)
    # pixel parity: bilinear fixed-point (cv2) vs float (native) plus the
    # HSV round trip -> small per-pixel differences allowed
    diff = np.abs(out_n.astype(np.int16) - out_p.astype(np.int16))
    assert float(diff.mean()) < 3.0, float(diff.mean())
    assert np.mean(diff > 16) < 0.02  # <2% of pixels off by >16
