"""Fused flow-step Pallas kernel: parity vs the XLA layer math, exact
round-trip, gradients, and GSPMD behavior (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_glow_tpu.config import GlowConfig, MeshConfig
from pytorch_glow_tpu.models import glow
from pytorch_glow_tpu.models import layers as L
from pytorch_glow_tpu.models.glow import _fused_ref_forward
from pytorch_glow_tpu.ops import flowstep_pallas as fsp

CFG = GlowConfig(
    image_shape=(8, 8, 3), hidden_channels=32, K=2, L=2,
    compute_dtype="bfloat16", flowstep_impl="pallas",
)
CFG_XLA = dataclasses.replace(CFG, flowstep_impl="xla")


def _step_params(c: int, cfg=CFG, seed: int = 0):
    return glow._flow_step_init(jax.random.key(seed), c, cfg)


@pytest.mark.parametrize("mode", ["affine", "additive"])
@pytest.mark.parametrize("c,h,w", [(12, 4, 4), (8, 6, 6), (24, 2, 2)])
def test_step_forward_matches_xla(mode, c, h, w):
    cfg = dataclasses.replace(CFG, flow_coupling=mode)
    sp = _step_params(c, cfg)
    # Fill actnorms with non-trivial values (DDI substitute).
    sp = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(1), a.shape, a.dtype)
        if a.dtype == jnp.float32 else a,
        sp,
    )
    z = jax.random.normal(jax.random.key(2), (6, h, w, c), jnp.float32)
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)

    zn, ld = fsp.step_forward(sp, z, kind, mode == "affine")
    zr, lr = _fused_ref_forward(sp, z, kind, mode)
    np.testing.assert_allclose(np.asarray(zn), np.asarray(zr), atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lr), atol=2e-1, rtol=2e-2)


@pytest.mark.parametrize("kind_cfg", [
    {},  # lu invconv (default)
    {"lu_decomposed": False},
    {"flow_permutation": "shuffle"},
    {"flow_permutation": "reverse"},
])
def test_step_roundtrip_exact(kind_cfg):
    cfg = dataclasses.replace(CFG, **kind_cfg)
    sp = _step_params(12, cfg)
    z = jax.random.normal(jax.random.key(3), (4, 4, 4, 12), jnp.float32)
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    zn, _ = fsp.step_forward(sp, z, kind, True)
    z_rec = fsp.step_reverse(sp, zn, kind, True)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), atol=2e-5)


def test_model_log_prob_matches_xla_impl():
    """Full model: fused-kernel impl tracks the bf16 XLA impl closely."""
    params = glow.init_glow(jax.random.key(0), CFG_XLA)
    x = jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))
    params = glow.ddi_init(params, x, CFG_XLA)
    out_p = glow.log_prob(params, x, CFG)
    out_x = glow.log_prob(params, x, CFG_XLA)
    np.testing.assert_allclose(
        np.asarray(out_p["nll"]), np.asarray(out_x["nll"]), rtol=2e-2
    )


def test_model_reconstruct_exact_under_fused():
    """decode(encode(x)) stays exact when BOTH directions use the kernel."""
    params = glow.init_glow(jax.random.key(0), CFG_XLA)
    x = jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))
    params = glow.ddi_init(params, x, CFG_XLA)
    rec = glow.reconstruct(params, x, CFG)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-4)


def test_sample_runs_under_fused():
    params = glow.init_glow(jax.random.key(0), CFG_XLA)
    imgs = glow.sample(params, jax.random.key(1), CFG, n=3, temperature=0.7)
    assert imgs.shape == (3, 8, 8, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_gradients_flow_through_fused_forward():
    """value_and_grad through the kernel (custom_vjp -> XLA math) tracks the
    pure-XLA gradients."""
    params = glow.init_glow(jax.random.key(0), CFG_XLA)
    x = jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))
    params = glow.ddi_init(params, x, CFG_XLA)

    from pytorch_glow_tpu.utils.tree import merge, partition

    trainable, frozen = partition(params)

    def loss(tr, cfg):
        return jnp.mean(glow.log_prob(merge(tr, frozen), x, cfg)["nll"])

    lp, gp = jax.value_and_grad(lambda p: loss(p, CFG))(trainable)
    lx, gx = jax.value_and_grad(lambda p: loss(p, CFG_XLA))(trainable)
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-2)
    for path, leaf in jax.tree_util.tree_leaves_with_path(gp):
        ref = dict(jax.tree_util.tree_leaves_with_path(gx))[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), atol=5e-2, rtol=5e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_under_data_parallel_mesh(eight_devices):
    """log_prob with the fused kernel on an 8-device DP mesh == unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    params = glow.init_glow(jax.random.key(0), CFG_XLA)
    x = jax.random.uniform(jax.random.key(1), (16, 8, 8, 3))
    params = glow.ddi_init(params, x, CFG_XLA)
    local = jax.jit(lambda p, x: glow.log_prob(p, x, CFG)["nll"])(params, x)

    ps = meshlib.shard_params(mesh, params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    sharded = jax.jit(lambda p, x: glow.log_prob(p, x, CFG)["nll"])(ps, xs)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(local), atol=1e-3, rtol=1e-4
    )
