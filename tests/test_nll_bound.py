"""Valid discrete-NLL bounds (glow.nll_bound): ELBO/IWAE over dequantization
noise draws — what flow papers actually report, vs the noise-free bin-corner
convention the lineage evaluates (kept as the cheap relative metric)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import glow
from pytorch_glow_tpu.ops.math import bits_per_dim, num_dims

CFG = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)


def _setup(cfg=CFG):
    params = glow.init_glow(jax.random.key(0), cfg)
    x_u8 = jax.random.randint(jax.random.key(1), (8, *cfg.image_shape), 0, 256, jnp.uint8)
    x = glow.preprocess(x_u8, cfg)
    params = glow.ddi_init(params, glow.dequantize(jax.random.key(2), x, cfg), cfg)
    return params, x


def test_iwae_bound_never_looser_than_elbo():
    params, x = _setup()
    k = jax.random.key(3)
    elbo = np.asarray(glow.nll_bound(params, x, CFG, k, samples=4, bound="elbo"))
    iwae = np.asarray(glow.nll_bound(params, x, CFG, k, samples=4, bound="iwae"))
    # logsumexp - log k >= mean, per sample, deterministically.
    assert np.all(iwae <= elbo + 1e-4), (iwae, elbo)
    assert np.isfinite(elbo).all() and np.isfinite(iwae).all()


def test_single_sample_elbo_matches_log_prob_draw():
    params, x = _setup()
    k = jax.random.key(4)
    got = np.asarray(glow.nll_bound(params, x, CFG, k, samples=1))
    r = jax.random.split(k, 1)[0]
    out = glow.log_prob(params, x, CFG, rng=r)
    want = np.asarray(bits_per_dim(out["objective"], num_dims((x.shape[0], *CFG.image_shape))))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bound_deterministic_under_fixed_rng_and_works_with_vardeq():
    vd = dataclasses.replace(
        CFG, dequant="variational", vardeq_steps=2, vardeq_width=16,
        vardeq_context_width=8,
    )
    params, x = _setup(vd)
    k = jax.random.key(5)
    a = np.asarray(glow.nll_bound(params, x, vd, k, samples=3, bound="iwae"))
    b = np.asarray(glow.nll_bound(params, x, vd, k, samples=3, bound="iwae"))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    # At the q-flow's zero-init the variational bound must coincide with the
    # uniform bound in distribution; with identical keys the noise pipelines
    # differ slightly (logit/sigmoid round-trip), so compare means loosely.
    uni = np.asarray(
        glow.nll_bound({k_: v for k_, v in params.items() if k_ != "vardeq"},
                       x, CFG, k, samples=3, bound="iwae")
    )
    assert abs(float(a.mean() - uni.mean())) < 0.05


def test_inferer_nll_bound_api():
    from pytorch_glow_tpu.inference import Inferer

    params, x = _setup()
    inf = Inferer(params, CFG)
    out = inf.nll_bound(np.asarray(x), samples=2, bound="iwae")
    assert out.shape == (x.shape[0],) and np.isfinite(out).all()


def test_nll_bound_rejects_nonbounding_dequant():
    """gaussian/none dequantization has no bounded q folded into the
    objective -- the 'bound' would not bound the discrete NLL; refuse."""
    import dataclasses

    import pytest

    cfg_g = dataclasses.replace(CFG, dequant="gaussian")
    params = glow.init_glow(jax.random.key(0), cfg_g)
    x = jax.random.uniform(jax.random.key(1), (2, *cfg_g.image_shape))
    with pytest.raises(ValueError, match="valid discrete-NLL bound"):
        glow.nll_bound(params, x, cfg_g, jax.random.key(2))
