"""Pallas LU-1x1-conv kernel parity vs the XLA reference path (SURVEY.md §7
step 7: "parity-test against the XLA path").  Runs in interpret mode on CPU;
compiled on real TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import glow
from pytorch_glow_tpu.ops import invconv_pallas as icp
from pytorch_glow_tpu.ops import invconv_xla as ic


def _lu(c, seed=0, perturb=True):
    p = ic.lu_init(jax.random.key(seed), c)
    if perturb:
        p = p._replace(
            l_raw=p.l_raw + 0.02 * jax.random.normal(jax.random.key(seed + 1), (c, c)),
            u_raw=p.u_raw + 0.02 * jax.random.normal(jax.random.key(seed + 2), (c, c)),
            log_s=p.log_s + 0.1,
        )
    return p


@pytest.mark.parametrize("c,n", [(12, 64), (48, 1000), (128, 2048), (48, 1024)])
def test_forward_matches_xla(c, n):
    lu = _lu(c)
    x = jax.random.normal(jax.random.key(3), (n, c))
    y_k, ld_k = icp.invconv_lu_forward(x, lu)
    w = ic.lu_assemble(lu)
    y_x = ic.mix_channels(x, w)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), atol=2e-5)
    np.testing.assert_allclose(float(ld_k), float(ic.lu_logdet(lu)), rtol=1e-6)


def test_forward_nhwc_shape():
    lu = _lu(24, seed=5)
    x = jax.random.normal(jax.random.key(6), (2, 8, 8, 24))
    y, ld = icp.invconv_lu_forward(x, lu)
    assert y.shape == x.shape
    w = ic.lu_assemble(lu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ic.mix_channels(x, w)), atol=2e-5)


def test_reverse_roundtrip():
    lu = _lu(48, seed=7)
    x = jax.random.normal(jax.random.key(8), (4, 4, 4, 48))
    y, _ = icp.invconv_lu_forward(x, lu)
    x_rec = icp.invconv_lu_reverse(y, lu)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)


def test_gradients_match_xla_path():
    lu = _lu(12, seed=9)
    x = jax.random.normal(jax.random.key(10), (64, 12))

    def rebuild(floats):
        return lu._replace(l_raw=floats[0], u_raw=floats[1], log_s=floats[2])

    floats = (lu.l_raw, lu.u_raw, lu.log_s)

    def loss_k(x, floats):
        y, ld = icp.invconv_lu_forward(x, rebuild(floats))
        return jnp.sum(y**2) + 3.0 * ld

    def loss_x(x, floats):
        p = rebuild(floats)
        w = ic.lu_assemble(p)
        return jnp.sum(ic.mix_channels(x, w) ** 2) + 3.0 * ic.lu_logdet(p)

    gk_x, gk_f = jax.grad(loss_k, argnums=(0, 1))(x, floats)
    gx_x, gx_f = jax.grad(loss_x, argnums=(0, 1))(x, floats)
    np.testing.assert_allclose(np.asarray(gk_x), np.asarray(gx_x), atol=1e-3)
    for a, b in zip(gk_f, gx_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_model_with_pallas_impl_matches_xla_impl():
    cfg_x = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)
    cfg_p = GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2, invconv_impl="pallas"
    )
    params = glow.init_glow(jax.random.key(0), cfg_x)
    x = jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))
    params = glow.ddi_init(params, x, cfg_x)

    out_x = glow.log_prob(params, x, cfg_x)
    out_p = glow.log_prob(params, x, cfg_p)
    np.testing.assert_allclose(
        np.asarray(out_x["nll"]), np.asarray(out_p["nll"]), rtol=1e-4
    )
    rec = glow.reconstruct(params, x, cfg_p)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3)


def test_pallas_under_data_parallel_mesh(eight_devices):
    """The custom_partitioning wrapper must shard rows over "data" with no
    resharding of inputs and match the local result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.config import MeshConfig
    from pytorch_glow_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    lu = _lu(16, seed=11)
    x = jax.random.normal(jax.random.key(12), (16, 4, 4, 16))

    y_local, ld_local = icp.invconv_lu_forward(x, lu)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    lus = jax.device_put(lu, NamedSharding(mesh, P()))

    @jax.jit
    def f(x, lu):
        return icp.invconv_lu_forward(x, lu)

    y_sh, ld_sh = f(xs, lus)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_local), atol=2e-5)
    np.testing.assert_allclose(float(ld_sh), float(ld_local), rtol=1e-6)
    # Output stays row-sharded (no implicit all-gather).
    assert len(y_sh.sharding.device_set) == 8

    # Reverse under the same sharding.
    x_rec = jax.jit(icp.invconv_lu_reverse)(y_sh, lus)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)


def test_pallas_model_under_mesh(eight_devices):
    """Full log_prob with invconv_impl=pallas on a DP mesh == local."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.config import MeshConfig
    from pytorch_glow_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    cfg = GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2, invconv_impl="pallas"
    )
    params = glow.init_glow(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (16, 8, 8, 3))
    params = glow.ddi_init(params, x, cfg)

    out_local = glow.log_prob(params, x, cfg)
    ps = meshlib.shard_params(mesh, params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out_sh = jax.jit(lambda p, x: glow.log_prob(p, x, cfg))(ps, xs)
    np.testing.assert_allclose(
        np.asarray(out_sh["nll"]), np.asarray(out_local["nll"]), rtol=2e-4
    )


def test_pallas_train_grads_under_mesh(eight_devices):
    """value_and_grad through the partitioned kernel on a DP mesh == local
    (backward routes through the XLA path via custom_vjp)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.config import MeshConfig
    from pytorch_glow_tpu.parallel import mesh as meshlib
    from pytorch_glow_tpu.utils.tree import merge, partition

    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    cfg = GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2, invconv_impl="pallas"
    )
    params = glow.init_glow(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (16, 8, 8, 3))
    params = glow.ddi_init(params, x, cfg)
    trainable, frozen = partition(params)

    def loss(tr, x):
        l, _ = glow.loss_fn(merge(tr, frozen), x, cfg)
        return l

    g_local = jax.grad(loss)(trainable, x)

    ps = jax.device_put(trainable, meshlib.param_shardings(mesh, trainable))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_sh = jax.jit(jax.grad(loss))(ps, xs)

    a = g_local["levels"][0]["steps"]["perm"]["lu"].log_s
    b = np.asarray(g_sh["levels"][0]["steps"]["perm"]["lu"].log_s)
    np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


def test_bwd_precision_knob():
    """Forward stays exact regardless of bwd_precision; "high" grads track
    the HIGHEST grads closely."""
    lu = _lu(12, seed=21)
    x = jax.random.normal(jax.random.key(22), (64, 12))

    y_hi, ld_hi = icp.invconv_lu_forward(x, lu, "highest")
    y_fast, ld_fast = icp.invconv_lu_forward(x, lu, "high")
    np.testing.assert_array_equal(np.asarray(y_hi), np.asarray(y_fast))
    assert float(ld_hi) == float(ld_fast)

    def loss(x, floats, prec):
        p = lu._replace(l_raw=floats[0], log_s=floats[1])
        y, ld = icp.invconv_lu_forward(x, p, prec)
        return jnp.sum(y**2) + 3.0 * ld

    floats = (lu.l_raw, lu.log_s)
    g_hi = jax.grad(loss, argnums=1)(x, floats, "highest")
    g_fast = jax.grad(loss, argnums=1)(x, floats, "high")
    for a, b in zip(g_hi, g_fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
