"""Sliced Wasserstein distance (utils/swd.py): the offline sample-quality
metric.  Properties: zero on identical sets, deterministic under seed,
discriminative (same-distribution pairs score far below cross-distribution
pairs), and the Laplacian pyramid is a lossless analysis/synthesis pair."""

import numpy as np
import pytest

from pytorch_glow_tpu.utils import swd


def _noise(seed, n=24, size=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size, size, 3)).astype(np.uint8)


def _smooth(seed, n=24, size=32):
    """Low-frequency images: random linear gradients + a blurred blob."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    imgs = []
    for _ in range(n):
        a, b, c = rng.uniform(-1, 1, 3)
        img = a * yy + b * xx + c
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        imgs.append(np.stack([img] * 3, -1) * 255)
    return np.asarray(imgs, np.uint8)


def test_identical_sets_score_zero():
    x = _noise(0)
    out = swd.sliced_wasserstein(x, x, seed=3)
    assert out["swd_avg"] == pytest.approx(0.0, abs=1e-6)
    assert set(out) == {"swd_32", "swd_16", "swd_avg"}


def test_deterministic_under_seed():
    a, b = _noise(1), _noise(2)
    o1 = swd.sliced_wasserstein(a, b, seed=7)
    o2 = swd.sliced_wasserstein(a, b, seed=7)
    o3 = swd.sliced_wasserstein(a, b, seed=8)
    assert o1 == o2
    assert o1 != o3  # different projections/patches, same ballpark
    assert o3["swd_avg"] == pytest.approx(o1["swd_avg"], rel=0.5)


def test_discriminates_distributions():
    """noise-vs-noise and smooth-vs-smooth must score far below
    noise-vs-smooth at every pyramid level."""
    nn = swd.sliced_wasserstein(_noise(1, n=64), _noise(2, n=64), seed=0)
    ss = swd.sliced_wasserstein(_smooth(1, n=64), _smooth(2, n=64), seed=0)
    cross = swd.sliced_wasserstein(_noise(1, n=64), _smooth(2, n=64), seed=0)
    for k in ("swd_32", "swd_16", "swd_avg"):
        assert cross[k] > 3 * nn[k], (k, cross[k], nn[k])
        assert cross[k] > 3 * ss[k], (k, cross[k], ss[k])


def test_pyramid_is_lossless():
    """detail bands + expanded base reconstruct the input exactly."""
    x = _noise(5, n=2, size=64).astype(np.float32)
    levels = swd.laplacian_pyramid(x, min_size=16)
    assert [lv.shape[1] for lv in levels] == [64, 32, 16]
    recon = levels[-1]
    for detail in reversed(levels[:-1]):
        recon = swd._pyr_up(recon) + detail
    np.testing.assert_allclose(recon, x, atol=1e-4)


def test_unequal_set_sizes_subsample():
    a = _noise(1, n=32)
    b = _noise(2, n=8)
    out = swd.sliced_wasserstein(a, b, seed=0)
    assert np.isfinite(out["swd_avg"])


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        swd.sliced_wasserstein(_noise(0, size=32), _noise(1, size=16))
