"""Cross-framework parity: JAX/TPU Glow vs an independent torch-CPU
re-derivation on IDENTICAL weights (SURVEY.md §4, §7 step 5; north-star
"float-tolerance output parity vs PyTorch on identical weights")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_ref
from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import glow


def _nontrivial_params(cfg, seed=0):
    """Init + DDI + randomize every zero-init conv so nothing is identity."""
    params = glow.init_glow(jax.random.key(seed), cfg)
    x = jax.random.uniform(jax.random.key(seed + 1), (8, *cfg.image_shape))
    params = glow.ddi_init(params, x, cfg)

    rng = np.random.default_rng(seed + 2)

    def perturb(path, leaf):
        name = str(path[-1])
        if any(k in name for k in ("w", "b", "logs")) and leaf.dtype == jnp.float32:
            return leaf + jnp.asarray(
                0.05 * rng.standard_normal(leaf.shape), jnp.float32
            )
        return leaf

    # Perturb only the conv2d_zeros leaves (conv3 of couplings, split priors,
    # learn_top) so couplings/priors are non-trivial but still invertible.
    def walk(tree, path=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "conv3" or k == "prior_conv" or k == "learn_top":
                    out[k] = jax.tree_util.tree_map_with_path(perturb, v)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        if isinstance(tree, list):
            return [walk(v, path) for v in tree]
        return tree

    return walk(params), x


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).float().permute(0, 3, 1, 2)


CONFIGS = [
    GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2),
    GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
               flow_coupling="additive"),
    GlowConfig(image_shape=(8, 8, 2), hidden_channels=12, K=3, L=1,
               lu_decomposed=False),
    GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
               flow_permutation="shuffle"),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=["affine-lu", "additive", "plain-w", "shuffle"])
def test_encode_objective_parity(cfg):
    params, xj = _nontrivial_params(cfg)
    x = jax.random.uniform(jax.random.key(9), (4, *cfg.image_shape))

    zj, ldj, splits_j, _ = glow.encode(params, x, cfg)
    out_j = glow.log_prob(params, x, cfg)

    zt, ldt, splits_t = torch_ref.encode(params, cfg, _nchw(x))
    _, obj_t, nll_t = torch_ref.log_prob(params, cfg, _nchw(x))

    # latents match (convert torch NCHW -> NHWC)
    np.testing.assert_allclose(
        np.asarray(zj), zt.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    for a, b in zip(splits_j, splits_t):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=2e-4
        )
    # bits/dim matches to float tolerance
    np.testing.assert_allclose(
        np.asarray(out_j["nll"]), nll_t.numpy(), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("cfg", CONFIGS, ids=["affine-lu", "additive", "plain-w", "shuffle"])
def test_decode_parity_and_roundtrip(cfg):
    params, _ = _nontrivial_params(cfg, seed=5)
    x = jax.random.uniform(jax.random.key(11), (2, *cfg.image_shape))

    zj, _, splits_j, _ = glow.encode(params, x, cfg)
    xj = glow.decode(params, zj, cfg, z_splits=splits_j)

    zt = torch.from_numpy(np.asarray(zj)).permute(0, 3, 1, 2)
    splits_t = [torch.from_numpy(np.asarray(s)).permute(0, 3, 1, 2) for s in splits_j]
    xt = torch_ref.decode(params, cfg, zt, splits_t)

    np.testing.assert_allclose(np.asarray(xj), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(
        xt.permute(0, 2, 3, 1).numpy(), np.asarray(x), atol=1e-4
    )


def test_sampled_latent_decode_parity():
    """Both frameworks must decode the SAME latent to the same image."""
    cfg = CONFIGS[0]
    params, _ = _nontrivial_params(cfg, seed=7)
    hf, wf, cf = cfg.final_latent_shape
    z = 0.7 * jax.random.normal(jax.random.key(13), (2, hf, wf, cf))
    # Split halves at prior means: temperature 0.
    xj = glow.decode(params, z, cfg, rng=jax.random.key(0), temperature=0.0)

    # torch: replicate T=0 split sampling (z2 = prior mean).
    zt = torch.from_numpy(np.asarray(z)).permute(0, 3, 1, 2)
    kind = torch_ref.perm_kind(cfg)
    zcur = zt
    for i in range(cfg.L - 1, -1, -1):
        level = params["levels"][i]
        if level["split"] is not None:
            mean, logs = torch_ref.split2d_prior(level["split"], zcur)
            zcur = torch_ref.cat_ch(zcur, mean, "simple")
        for k in range(cfg.K - 1, -1, -1):
            sp = torch_ref.step_params_at(level["steps"], k)
            zcur = torch_ref.coupling_rev(sp["coupling"], zcur, cfg.flow_coupling)
            zcur = torch_ref.invconv_rev(sp["perm"], zcur, kind)
            zcur = torch_ref.actnorm_rev(sp["actnorm"], zcur)
        zcur = torch_ref.unsqueeze(zcur)

    np.testing.assert_allclose(
        np.asarray(xj), zcur.permute(0, 2, 3, 1).numpy(), atol=3e-4
    )


def test_y_conditional_parity():
    """Class-conditional prior + classifier head match torch on identical
    weights (reference y_condition path)."""
    cfg = GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
        y_condition=True, y_classes=7, y_multi_class=False,
    )
    params, _ = _nontrivial_params(cfg, seed=21)
    # Give the conditional projections non-zero weights.
    rng = np.random.default_rng(5)
    for key in ("project_ycond", "project_class"):
        for f in ("w", "b", "logs"):
            params["top"][key][f] = jnp.asarray(
                0.05 * rng.standard_normal(params["top"][key][f].shape),
                jnp.float32,
            )
    x = jax.random.uniform(jax.random.key(30), (4, *cfg.image_shape))
    y = jax.nn.one_hot(jnp.array([0, 2, 4, 6]), 7)

    out_j = glow.log_prob(params, x, cfg, y_onehot=y)
    _, _, nll_t = torch_ref.log_prob(
        params, cfg, _nchw(x), torch.from_numpy(np.asarray(y)).float()
    )
    np.testing.assert_allclose(
        np.asarray(out_j["nll"]), nll_t.numpy(), rtol=2e-4, atol=2e-4
    )
    logits_t = torch_ref.classify(
        params, torch.from_numpy(np.asarray(out_j["z"])).permute(0, 3, 1, 2)
    )
    np.testing.assert_allclose(
        np.asarray(out_j["y_logits"]), logits_t.numpy(), atol=2e-4
    )
