"""Native C++ batch decoder tests: build, decode parity vs PIL, crop/resize
math vs a numpy reference, thread safety, failure handling."""

import os

import numpy as np
import pytest
from PIL import Image

from pytorch_glow_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason=f"native loader unavailable: {nl.build_error()}"
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = {}
    # PNG: lossless -> exact decode comparison possible.
    a = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    p = str(d / "a.png")
    Image.fromarray(a).save(p)
    paths["png"] = (p, a)
    # JPEG: same libjpeg underneath -> decode should match PIL's.
    b = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    p = str(d / "b.jpg")
    Image.fromarray(b).save(p, quality=95)
    paths["jpg"] = (p, b)
    return paths


def _numpy_crop_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Reference for the native half-pixel-center bilinear (no antialias)."""
    h, w, _ = img.shape
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    crop = img[y0 : y0 + s, x0 : x0 + s].astype(np.float32)
    scale = s / size
    fy = (np.arange(size) + 0.5) * scale - 0.5
    fx = (np.arange(size) + 0.5) * scale - 0.5
    iy = np.floor(fy).astype(int)
    ix = np.floor(fx).astype(int)
    wy = (fy - iy)[:, None, None]
    wx = (fx - ix)[None, :, None]
    y_lo, y_hi = np.clip(iy, 0, s - 1), np.clip(iy + 1, 0, s - 1)
    x_lo, x_hi = np.clip(ix, 0, s - 1), np.clip(ix + 1, 0, s - 1)
    v = ((1 - wy) * ((1 - wx) * crop[np.ix_(y_lo, x_lo)] + wx * crop[np.ix_(y_lo, x_hi)])
         + wy * ((1 - wx) * crop[np.ix_(y_hi, x_lo)] + wx * crop[np.ix_(y_hi, x_hi)]))
    return np.clip(np.round(v), 0, 255).astype(np.uint8)


def test_png_decode_exact(image_dir):
    p, truth = image_dir["png"]
    size = min(truth.shape[:2])
    out = nl.decode_batch([p], size=size)
    expected = _numpy_crop_resize(truth, size)
    # identity-scale resize => pure center crop => exact.
    np.testing.assert_array_equal(out[0], expected)


def test_jpeg_decode_matches_pil(image_dir):
    p, _ = image_dir["jpg"]
    pil = np.asarray(Image.open(p).convert("RGB"))
    size = min(pil.shape[:2])
    out = nl.decode_batch([p], size=size)
    expected = _numpy_crop_resize(pil, size)
    # Same libjpeg under both; allow +-1 for IDCT implementation drift.
    assert np.abs(out[0].astype(int) - expected.astype(int)).max() <= 1


@pytest.mark.parametrize("size", [16, 31])
def test_resize_matches_numpy_reference(image_dir, size):
    p, truth = image_dir["png"]
    out = nl.decode_batch([p], size=size)
    expected = _numpy_crop_resize(truth, size)
    assert np.abs(out[0].astype(int) - expected.astype(int)).max() <= 1


def test_batch_multithreaded(image_dir):
    paths = [image_dir["png"][0], image_dir["jpg"][0]] * 8
    out = nl.decode_batch(paths, size=24, threads=4)
    assert out.shape == (16, 24, 24, 3)
    # All copies of the same file decode identically.
    np.testing.assert_array_equal(out[0], out[2])
    np.testing.assert_array_equal(out[1], out[3])


def test_missing_file_zero_filled(image_dir):
    good = image_dir["png"][0]
    with pytest.warns(UserWarning, match="decode failed"):
        out = nl.decode_batch([good, "/nonexistent/x.jpg"], size=16)
    assert out[1].sum() == 0 and out[0].sum() > 0


def test_image_dims(image_dir):
    p, truth = image_dir["png"]
    assert nl.image_dims(p) == (truth.shape[1], truth.shape[0])


def test_decode_pool_matches_sync(image_dir):
    """Async pool results are identical to the one-shot API, including
    out-of-order waits and many in-flight jobs on one persistent pool."""
    paths = [image_dir["png"][0], image_dir["jpg"][0]] * 4
    want = nl.decode_batch(paths, size=20)
    pool = nl.DecodePool(size=20, threads=3)
    try:
        jobs = [pool.submit(paths) for _ in range(5)]
        for j in reversed(jobs):  # wait newest-first
            np.testing.assert_array_equal(pool.wait(j), want)
    finally:
        pool.close()


def test_decode_pool_failure_and_close_drains(image_dir):
    good = image_dir["png"][0]
    pool = nl.DecodePool(size=16, threads=2)
    job = pool.submit([good, "/nonexistent/x.jpg"])
    with pytest.warns(UserWarning, match="failed"):
        out = pool.wait(job)
    assert out[1].sum() == 0 and out[0].sum() > 0
    pool.submit([good])  # left in flight: close() must drain, not crash
    pool.close()
    pool.close()  # idempotent
