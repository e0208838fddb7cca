"""Per-layer invertibility + logdet-vs-autodiff-Jacobian tests (SURVEY.md §4).

Every bijective layer must satisfy reverse(forward(x)) ~= x, and its
analytic logdet must equal log|det d(forward)/dx| computed by autodiff on
tiny shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_glow_tpu.models import layers as L


def _jac_logdet(fn, x):
    """Brute-force log|det J| of a flattened bijection on ONE example."""
    flat = x.reshape(-1)

    def flat_fn(v):
        return fn(v.reshape(x.shape)).reshape(-1)

    j = jax.jacfwd(flat_fn)(flat)
    _, logdet = jnp.linalg.slogdet(j)
    return logdet


def test_actnorm_roundtrip_and_logdet():
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (4, 3, 3, 6))
    params = {
        "bias": jax.random.normal(jax.random.key(1), (6,)) * 0.2,
        "logs": jax.random.normal(jax.random.key(2), (6,)) * 0.2,
    }
    y, logdet, _ = L.actnorm_forward(params, x, jnp.zeros(4))
    x_rec = L.actnorm_reverse(params, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    expected = 9 * float(jnp.sum(params["logs"]))
    np.testing.assert_allclose(np.asarray(logdet), expected, rtol=1e-5)


def test_actnorm_ddi_whitens():
    x = 3.0 + 2.0 * jax.random.normal(jax.random.key(3), (64, 4, 4, 5))
    y, _, new_params = L.actnorm_forward(L.actnorm_init(5), x, jnp.zeros(64), ddi=True)
    assert new_params is not None
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1, 2))), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1, 2))), 1.0, atol=1e-3)


@pytest.mark.parametrize("mode,lu", [("invconv", True), ("invconv", False),
                                     ("shuffle", False), ("reverse", False)])
def test_permutation_roundtrip(mode, lu):
    c = 8
    kind = L.permutation_kind(mode, lu)
    params = L.permutation_init(jax.random.key(4), c, mode, lu)
    x = jax.random.normal(jax.random.key(5), (2, 3, 3, c))
    y, logdet = L.permutation_forward(params, x, jnp.zeros(2), kind)
    x_rec = L.permutation_reverse(params, y, kind)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    if kind == "fixed":
        np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-6)


@pytest.mark.parametrize("lu", [True, False])
def test_invconv_logdet_matches_jacobian(lu):
    c = 4
    kind = L.permutation_kind("invconv", lu)
    params = L.permutation_init(jax.random.key(6), c, "invconv", lu)
    x = jax.random.normal(jax.random.key(7), (1, 2, 2, c))

    def fwd(x1):
        y, _ = L.permutation_forward(params, x1[None], None, kind)
        return y[0]

    y, logdet = L.permutation_forward(params, x, jnp.zeros(1), kind)
    jac_ld = _jac_logdet(fwd, x[0])
    np.testing.assert_allclose(float(logdet[0]), float(jac_ld), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("mode", ["additive", "affine"])
def test_coupling_roundtrip_and_logdet(mode):
    c, hidden = 6, 16
    c_out = c // 2 if mode == "additive" else c
    params = L.coupling_net_init(jax.random.key(8), c // 2, hidden, c_out)
    # Perturb the zero-init output conv so the coupling is non-trivial.
    params["conv3"]["w"] = 0.1 * jax.random.normal(jax.random.key(9), params["conv3"]["w"].shape)
    params["conv3"]["b"] = 0.1 * jax.random.normal(jax.random.key(10), params["conv3"]["b"].shape)
    x = jax.random.normal(jax.random.key(11), (2, 4, 4, c))
    y, logdet, _ = L.coupling_forward(params, x, jnp.zeros(2), mode)
    x_rec = L.coupling_reverse(params, y, mode)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    if mode == "additive":
        np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-6)
    else:

        def fwd(x1):
            y1, _, _ = L.coupling_forward(params, x1[None], None, mode)
            return y1[0]

        jac_ld = _jac_logdet(fwd, x[0])
        np.testing.assert_allclose(float(logdet[0]), float(jac_ld), rtol=1e-3, atol=1e-4)


def test_coupling_identity_at_init():
    """Zero-init output conv => coupling is the identity map at init."""
    c, hidden = 6, 16
    params = L.coupling_net_init(jax.random.key(12), c // 2, hidden, c)
    x = jax.random.normal(jax.random.key(13), (2, 4, 4, c))
    y, logdet, _ = L.coupling_forward(params, x, jnp.zeros(2), "affine")
    # affine with zero net: shift=0, scale=sigmoid(2) -> NOT identity scale;
    # reference convention: scale=sigmoid(0+2)~0.88 applied uniformly.
    scale = float(jax.nn.sigmoid(jnp.array(2.0)))
    z1, z2 = np.split(np.asarray(x), 2, axis=-1)
    y1, y2 = np.split(np.asarray(y), 2, axis=-1)
    np.testing.assert_allclose(y1, z1, atol=1e-6)
    np.testing.assert_allclose(y2, z2 * scale, atol=1e-5)


def test_split2d_roundtrip_exact_and_sampled():
    c = 8
    params = L.split2d_init(c)
    x = jax.random.normal(jax.random.key(14), (2, 4, 4, c))
    z1, logdet, z2 = L.split2d_forward(params, x, jnp.zeros(2))
    assert z1.shape == (2, 4, 4, 4) and z2.shape == (2, 4, 4, 4)
    # Exact reattach.
    x_rec = L.split2d_reverse(params, z1, None, z2=z2)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-6)
    # Sampled path has the right shape and is finite.
    x_s = L.split2d_reverse(params, z1, jax.random.key(15), temperature=0.7)
    assert x_s.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(x_s)))


def test_conv2d_zeros_outputs_zero_at_init():
    params = L.conv2d_zeros_init(4, 8)
    x = jax.random.normal(jax.random.key(16), (2, 5, 5, 4))
    y = L.conv2d_zeros_forward(params, x)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-7)
