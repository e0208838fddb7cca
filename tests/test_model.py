"""Model-level tests: round-trip, DDI, objective sanity, sampling, logdet-vs-Jacobian."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import glow

TINY = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)


@pytest.fixture(scope="module")
def tiny_params():
    return glow.init_glow(jax.random.key(0), TINY)


@pytest.fixture(scope="module")
def tiny_batch():
    return jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))


def test_latent_shapes():
    cfg = GlowConfig(image_shape=(32, 32, 3), K=8, L=3)
    assert cfg.latent_shapes() == [(16, 16, 12), (8, 8, 24), (4, 4, 48)]
    assert cfg.final_latent_shape == (4, 4, 48)


def test_encode_decode_exact_roundtrip(tiny_params, tiny_batch):
    x_rec = glow.reconstruct(tiny_params, tiny_batch, TINY)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(tiny_batch), atol=1e-4)


def test_roundtrip_after_ddi(tiny_params, tiny_batch):
    params = glow.ddi_init(tiny_params, tiny_batch, TINY)
    x_rec = glow.reconstruct(params, tiny_batch, TINY)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(tiny_batch), atol=1e-4)


def test_ddi_normalizes_first_actnorm(tiny_params, tiny_batch):
    params = glow.ddi_init(tiny_params, tiny_batch, TINY)
    # After DDI, the first level's first actnorm output on this batch is
    # whitened per channel.
    from pytorch_glow_tpu.models import layers as L
    from pytorch_glow_tpu.ops.reshape import squeeze2d

    x = squeeze2d(tiny_batch, 2)
    an0 = jax.tree.map(lambda a: a[0], params["levels"][0]["steps"]["actnorm"])
    y, _, _ = L.actnorm_forward(an0, x, None)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1, 2))), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1, 2))), 1.0, atol=1e-2)


def test_log_prob_finite_and_plausible(tiny_params, tiny_batch):
    params = glow.ddi_init(tiny_params, tiny_batch, TINY)
    out = glow.log_prob(params, tiny_batch, TINY)
    assert out["nll"].shape == (4,)
    assert bool(jnp.all(jnp.isfinite(out["nll"])))
    # bits/dim for a fresh model on uniform noise should be O(1..20).
    assert float(jnp.mean(out["nll"])) < 30.0


def test_model_logdet_matches_jacobian():
    """Full-model analytic logdet == autodiff log|det J| on a micro config."""
    cfg = GlowConfig(image_shape=(4, 4, 2), hidden_channels=8, K=1, L=1)
    params = glow.init_glow(jax.random.key(2), cfg)
    x = jax.random.uniform(jax.random.key(3), (1, 4, 4, 2))
    params = glow.ddi_init(params, x, cfg)

    z, logdet, _, _ = glow.encode(params, x, cfg)

    def flat_encode(v):
        z1, _, _, _ = glow.encode(params, v.reshape(x.shape), cfg)
        return z1.reshape(-1)

    j = jax.jacfwd(flat_encode)(x.reshape(-1))
    _, jac_ld = jnp.linalg.slogdet(j)
    np.testing.assert_allclose(float(logdet[0]), float(jac_ld), rtol=1e-3, atol=1e-3)


def test_sample_shapes_and_finiteness(tiny_params):
    imgs = glow.sample(tiny_params, jax.random.key(4), TINY, n=3, temperature=0.7)
    assert imgs.shape == (3, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(imgs)))
    u8 = glow.postprocess(imgs, TINY)
    assert u8.dtype == jnp.uint8


def test_sample_deterministic_under_fixed_key(tiny_params):
    a = glow.sample(tiny_params, jax.random.key(5), TINY, n=2)
    b = glow.sample(tiny_params, jax.random.key(5), TINY, n=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_identity_at_init_objective(tiny_params, tiny_batch):
    """At init (before DDI) the net is near-identity modulo permutations and
    the sigmoid(2) coupling scale; encode must still round-trip."""
    z, logdet, z_splits, _ = glow.encode(tiny_params, tiny_batch, TINY)
    x_rec = glow.decode(tiny_params, z, TINY, z_splits=z_splits)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(tiny_batch), atol=1e-4)


def test_loss_fn_and_grads(tiny_params, tiny_batch):
    from pytorch_glow_tpu.utils.tree import merge, partition

    params = glow.ddi_init(tiny_params, tiny_batch, TINY)
    trainable, frozen = partition(params)

    def loss_on_trainable(tr, x, rng):
        return glow.loss_fn(merge(tr, frozen), x, TINY, rng=rng)

    (loss, metrics), grads = jax.value_and_grad(loss_on_trainable, has_aux=True)(
        trainable, tiny_batch, jax.random.key(6)
    )
    assert jnp.isfinite(loss)
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # Some gradient must be nonzero.
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_y_conditional_model():
    cfg = GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
        y_condition=True, y_classes=10, y_multi_class=False,
    )
    params = glow.init_glow(jax.random.key(7), cfg)
    x = jax.random.uniform(jax.random.key(8), (4, 8, 8, 3))
    y = jax.nn.one_hot(jnp.array([1, 3, 5, 7]), 10)
    out = glow.log_prob(params, x, cfg, y_onehot=y)
    assert out["y_logits"].shape == (4, 10)
    loss, metrics = glow.loss_fn(params, x, cfg, y_onehot=y)
    assert jnp.isfinite(loss) and "loss_class" in metrics
    imgs = glow.sample(params, jax.random.key(9), cfg, n=4, y_onehot=y)
    assert imgs.shape == (4, 8, 8, 3)


def test_preprocess_postprocess_roundtrip():
    cfg = GlowConfig(image_shape=(4, 4, 3))
    u8 = jnp.arange(48, dtype=jnp.uint8).reshape(1, 4, 4, 3)
    x = glow.preprocess(u8, cfg)
    assert float(jnp.max(x)) < 1.0
    back = glow.postprocess(x, cfg)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u8))


@pytest.mark.parametrize("perm", ["shuffle", "reverse"])
def test_alternative_permutations_roundtrip(perm):
    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
                     flow_permutation=perm)
    params = glow.init_glow(jax.random.key(10), cfg)
    x = jax.random.uniform(jax.random.key(11), (2, 8, 8, 3))
    x_rec = glow.reconstruct(params, x, cfg)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_additive_coupling_roundtrip():
    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
                     flow_coupling="additive")
    params = glow.init_glow(jax.random.key(12), cfg)
    x = jax.random.uniform(jax.random.key(13), (2, 8, 8, 3))
    x_rec = glow.reconstruct(params, x, cfg)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_n_bits_5_objective_and_roundtrip():
    """celebahq256 runs 5-bit images: preprocessing quantizes to 32 bins and
    the discretization term uses log(32)."""
    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2, n_bits_x=5)
    assert cfg.n_bins == 32.0
    u8 = jnp.arange(192, dtype=jnp.uint8).reshape(1, 8, 8, 3)
    x = glow.preprocess(u8, cfg)
    assert float(jnp.max(x)) < 1.0
    # 5-bit postprocess returns multiples of 8 in uint8 space.
    back = np.asarray(glow.postprocess(x, cfg))
    assert set(np.unique(back % 8)) == {0}
    params = glow.init_glow(jax.random.key(20), cfg)
    out = glow.log_prob(params, x, cfg)
    assert bool(jnp.isfinite(out["nll"][0]))


def test_deep_multiscale_L4():
    """Four levels -> three stacked Split2d factorizations."""
    cfg = GlowConfig(image_shape=(16, 16, 3), hidden_channels=16, K=1, L=4)
    assert cfg.final_latent_shape == (1, 1, 96)
    params = glow.init_glow(jax.random.key(21), cfg)
    x = jax.random.uniform(jax.random.key(22), (2, 16, 16, 3))
    z, logdet, z_splits, _ = glow.encode(params, x, cfg)
    assert z.shape == (2, 1, 1, 96) and len(z_splits) == 3
    x_rec = glow.decode(params, z, cfg, z_splits=z_splits)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    imgs = glow.sample(params, jax.random.key(23), cfg, n=2, temperature=0.5)
    assert imgs.shape == (2, 16, 16, 3)


def test_bf16_training_grads():
    """bf16 coupling compute must be trainable (CPU-runnable guard for the
    dtype path the TPU presets use; caught a mixed-dtype transpose-conv
    regression that f32-only tests missed)."""
    from pytorch_glow_tpu.utils.tree import merge, partition

    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
                     compute_dtype="bfloat16", invconv_precision="high")
    params = glow.init_glow(jax.random.key(30), cfg)
    x = jax.random.uniform(jax.random.key(31), (4, 8, 8, 3))
    params = glow.ddi_init(params, x, cfg)
    trainable, frozen = partition(params)

    def loss(tr):
        l, _ = glow.loss_fn(merge(tr, frozen), x, cfg, rng=jax.random.key(32))
        return l

    val, grads = jax.jit(jax.value_and_grad(loss))(trainable)
    assert bool(jnp.isfinite(val))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))
