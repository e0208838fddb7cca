"""Unit tests for the numerics core (SURVEY.md §4: invertibility is THE invariant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_glow_tpu.ops import invconv_xla as ic
from pytorch_glow_tpu.ops.math import (
    bits_per_dim,
    gaussian_likelihood,
    gaussian_logp,
    gaussian_sample,
    num_dims,
)
from pytorch_glow_tpu.ops.reshape import (
    cat_channel,
    split_channel,
    squeeze2d,
    unsqueeze2d,
)


def test_squeeze_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    z = squeeze2d(x, 2)
    assert z.shape == (2, 4, 4, 12)
    np.testing.assert_array_equal(np.asarray(unsqueeze2d(z, 2)), np.asarray(x))


def test_squeeze_matches_reference_channel_order():
    """out[b,h,w, c*4+s1*2+s2] == x[b, 2h+s1, 2w+s2, c] (torch NCHW ordering)."""
    x = jax.random.normal(jax.random.key(1), (1, 4, 4, 3))
    z = np.asarray(squeeze2d(x, 2))
    xn = np.asarray(x)
    for c in range(3):
        for s1 in range(2):
            for s2 in range(2):
                np.testing.assert_array_equal(
                    z[0, :, :, c * 4 + s1 * 2 + s2], xn[0, s1::2, s2::2, c]
                )


@pytest.mark.parametrize("mode", ["simple", "cross"])
def test_split_cat_roundtrip(mode):
    x = jax.random.normal(jax.random.key(2), (2, 4, 4, 6))
    a, b = split_channel(x, mode)
    assert a.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(cat_channel(a, b, mode)), np.asarray(x))


def test_gaussian_logp_matches_scipy_formula():
    rng = jax.random.key(3)
    x = jax.random.normal(rng, (4, 2, 2, 3))
    mean = jnp.full_like(x, 0.3)
    logs = jnp.full_like(x, -0.2)
    lik = gaussian_likelihood(mean, logs, x)
    expected = -0.5 * (
        np.log(2 * np.pi) + 2 * (-0.2) + (np.asarray(x) - 0.3) ** 2 / np.exp(-0.4)
    )
    np.testing.assert_allclose(np.asarray(lik), expected, rtol=1e-5)
    lp = gaussian_logp(mean, logs, x)
    assert lp.shape == (4,)
    np.testing.assert_allclose(np.asarray(lp), expected.reshape(4, -1).sum(-1), rtol=1e-5)


def test_gaussian_sample_temperature_zero_is_mean():
    mean = jnp.ones((2, 2, 2, 2)) * 0.7
    logs = jnp.zeros_like(mean)
    s = gaussian_sample(jax.random.key(0), mean, logs, 0.0)
    np.testing.assert_allclose(np.asarray(s), 0.7, rtol=1e-6)


def test_bits_per_dim():
    dims = num_dims((8, 32, 32, 3))
    assert dims == 32 * 32 * 3
    obj = jnp.array([-dims * np.log(2.0)])
    np.testing.assert_allclose(np.asarray(bits_per_dim(obj, dims)), [1.0], rtol=1e-6)


# ---------------------------------------------------------------------------
# LU-parameterized invertible 1x1 conv math
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("c", [4, 12, 48])
def test_lu_init_reconstructs_rotation(c):
    rng = jax.random.key(42)
    p = ic.lu_init(rng, c)
    w = np.asarray(ic.lu_assemble(p))
    # Same rng stream -> the rotation lu_init decomposed.
    w0 = np.asarray(ic.random_rotation(rng, c))
    np.testing.assert_allclose(w, w0, atol=1e-4)
    # Rotation: |det| = 1 -> sum(log_s) ~ 0.
    np.testing.assert_allclose(float(ic.lu_logdet(p)), 0.0, atol=1e-4)


@pytest.mark.parametrize("c", [4, 12])
def test_lu_logdet_matches_slogdet(c):
    p = ic.lu_init(jax.random.key(7), c)
    # Perturb log_s so the determinant is nontrivial.
    p = p._replace(log_s=p.log_s + 0.3)
    w = ic.lu_assemble(p)
    sign, logabs = np.linalg.slogdet(np.asarray(w, dtype=np.float64))
    np.testing.assert_allclose(float(ic.lu_logdet(p)), logabs, rtol=1e-4)


def test_lu_inverse_roundtrip():
    c = 12
    p = ic.lu_init(jax.random.key(9), c)
    p = p._replace(
        l_raw=p.l_raw + 0.01 * jax.random.normal(jax.random.key(1), (c, c)),
        log_s=p.log_s + 0.1,
    )
    w = np.asarray(ic.lu_assemble(p))
    w_inv = np.asarray(ic.lu_inverse(p))
    np.testing.assert_allclose(w @ w_inv, np.eye(c), atol=1e-4)


def test_mix_channels_is_matmul():
    x = jax.random.normal(jax.random.key(5), (2, 3, 3, 4))
    w = jax.random.normal(jax.random.key(6), (4, 4))
    y = ic.mix_channels(x, w)
    expected = np.einsum("bhwi,ji->bhwj", np.asarray(x), np.asarray(w))
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)
    # Invert through mix with w^{-1}.
    x_rec = ic.mix_channels(y, jnp.linalg.inv(w))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
