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
@pytest.mark.parametrize("c,h,w", [
    (12, 4, 4), (8, 6, 6), (24, 2, 2),
    (6, 5, 7),   # odd H/W + the minimum channel count (level-0 c of RGB)
    (16, 3, 5),  # asymmetric odd spatial
])
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
    # Statistical bound on top of the loose bf16 elementwise tolerance: the
    # MEAN error of kernel-vs-XLA must stay at bf16-rounding scale; a silent
    # half-precision regression (e.g. a lost f32 accumulation) passes the
    # 5e-2 elementwise bound but not this one.
    assert float(np.abs(np.asarray(zn) - np.asarray(zr)).mean()) < 2e-3


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


@pytest.fixture
def force_halo(monkeypatch):
    """Shrink the whole-image tile cap so a 32x32 image takes the halo
    row-band path (as the 128x128 levels of 256x256 configs do for real)."""
    monkeypatch.setattr(fsp, "MAX_TILE_COLS", 512)
    fsp._partitioned.cache_clear()
    yield
    fsp._partitioned.cache_clear()


@pytest.mark.parametrize("mode", ["affine", "additive"])
def test_halo_tiled_forward_matches_xla(force_halo, mode):
    cfg = dataclasses.replace(CFG, flow_coupling=mode, hidden_channels=32)
    c, h, w = 12, 32, 32
    assert h * w > fsp._max_cols(c, cfg.hidden_channels)  # halo path engaged
    assert fsp._halo_rows(h, w, c, cfg.hidden_channels) == 8
    sp = _noisy_step_params(c, cfg)
    z = jax.random.normal(jax.random.key(2), (3, h, w, c), jnp.float32)
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    zn, ld = fsp.step_forward(sp, z, kind, mode == "affine")
    zr, lr = _fused_ref_forward(sp, z, kind, mode)
    np.testing.assert_allclose(np.asarray(zn), np.asarray(zr), atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lr), atol=2e-1, rtol=2e-2)
    # Statistical bound on top of the loose bf16 elementwise tolerance: the
    # MEAN error of kernel-vs-XLA must stay at bf16-rounding scale; a silent
    # half-precision regression (e.g. a lost f32 accumulation) passes the
    # 5e-2 elementwise bound but not this one.
    assert float(np.abs(np.asarray(zn) - np.asarray(zr)).mean()) < 2e-3


def test_halo_tiled_roundtrip_exact(force_halo):
    cfg = dataclasses.replace(CFG, hidden_channels=32)
    sp = _noisy_step_params(12, cfg)
    z = jax.random.normal(jax.random.key(3), (2, 32, 32, 12), jnp.float32)
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    zn, _ = fsp.step_forward(sp, z, kind, True)
    z_rec = fsp.step_reverse(sp, zn, kind, True)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), atol=2e-5)


def test_halo_tiled_under_dp_mesh(force_halo, eight_devices):
    """Halo path under a DP mesh: sharded == unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.parallel import mesh as meshlib

    cfg = dataclasses.replace(CFG, hidden_channels=32)
    sp = _noisy_step_params(12, cfg)
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    z = jax.random.normal(jax.random.key(5), (8, 32, 32, 12), jnp.float32)
    zt = fsp.to_t(z)
    fn = lambda zt: fsp.step_forward_t(sp, zt, (32, 32), 8, kind, True)  # noqa: E731
    zn_l, ld_l = jax.jit(fn)(zt)

    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    zts = jax.device_put(zt, NamedSharding(mesh, P(None, "data")))
    zn_s, ld_s = jax.jit(fn)(zts)
    np.testing.assert_allclose(np.asarray(zn_s), np.asarray(zn_l), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_s), np.asarray(ld_l), atol=1e-4)


def _noisy_step_params(c, cfg):
    sp = glow._flow_step_init(jax.random.key(0), c, cfg)
    return jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(1), a.shape, a.dtype)
        if a.dtype == jnp.float32 else a,
        sp,
    )


@pytest.mark.parametrize("mode,kind_cfg", [
    ("affine", {}),
    ("additive", {}),
    ("affine", {"lu_decomposed": False}),
    ("affine", {"flow_permutation": "shuffle"}),
])
def test_fused_backward_kernel_exact_at_f32(monkeypatch, mode, kind_cfg):
    """PROOF of the hand-derived backward kernel: with the coupling compute
    dtype forced to f32, its gradients must match jax autodiff of the same
    math to float roundoff (~1e-6) — any algebra error in the kernel would
    show up at O(1).  (At bf16 the paths legitimately differ by rounding.)"""
    monkeypatch.setattr(fsp, "COUPLING_DTYPE", jnp.float32)
    fsp._partitioned.cache_clear()
    fsp._partitioned_bwd.cache_clear()
    try:
        cfg = dataclasses.replace(CFG, flow_coupling=mode, **kind_cfg)
        c, h, w, b = 12, 4, 4, 6
        sp = _noisy_step_params(c, cfg)
        kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
        zt = fsp.to_t(jax.random.normal(jax.random.key(2), (b, h, w, c)))
        gz = jax.random.normal(jax.random.key(3), zt.shape)
        gl = jax.random.normal(jax.random.key(4), (b,))
        assert fsp.backward_supported(h, w, c, cfg.hidden_channels)

        def ref_f32_t(sp, zt):
            z = fsp.from_t(zt, (b, h, w, c))
            z, _, _ = L.actnorm_forward(sp["actnorm"], z, None)
            z, _ = L.permutation_forward(sp["perm"], z, None, kind, "xla", "highest")
            z, ld, _ = L.coupling_forward(
                sp["coupling"], z, jnp.zeros((b,), jnp.float32), mode,
                compute_dtype=jnp.float32,
            )
            return fsp.to_t(z), ld

        def loss(fn):
            def go(sp, zt):
                zn, ld = fn(sp, zt)
                return jnp.sum(zn * gz) + jnp.sum(ld * gl)
            return go

        fused = loss(lambda s, x: glow._fused_step_forward(s, x, kind, mode, (h, w), b))
        ref = loss(ref_f32_t)
        gf = jax.grad(fused, argnums=(0, 1), allow_int=True)(sp, zt)
        gr = jax.grad(ref, argnums=(0, 1), allow_int=True)(sp, zt)
        refs = dict(jax.tree_util.tree_leaves_with_path(gr))
        checked = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(gf):
            if leaf.dtype == jax.dtypes.float0:
                continue
            scale = max(1e-3, float(np.max(np.abs(np.asarray(refs[path])))))
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32), np.asarray(refs[path], np.float32),
                atol=3e-5 * scale, err_msg=jax.tree_util.keystr(path),
            )
            checked += 1
        assert checked >= 10
    finally:
        fsp._partitioned.cache_clear()
        fsp._partitioned_bwd.cache_clear()


@pytest.mark.parametrize("mode", ["affine", "additive"])
def test_fused_backward_halo_exact_at_f32(monkeypatch, mode):
    """PROOF of the HALO backward kernel (256²-training path): with the
    coupling compute dtype forced to f32 and the whole-image tile cap shrunk
    so a 32×32 image takes the halo row-band path in BOTH directions, the
    fused gradients — including the top/bottom halo-gradient fold and the
    grid-accumulated weight grads — must match jax autodiff of the same
    math to float roundoff."""
    monkeypatch.setattr(fsp, "COUPLING_DTYPE", jnp.float32)
    monkeypatch.setattr(fsp, "MAX_TILE_COLS", 512)
    fsp._partitioned.cache_clear()
    fsp._partitioned_bwd.cache_clear()
    try:
        cfg = dataclasses.replace(CFG, flow_coupling=mode, hidden_channels=32)
        c, h, w, b = 12, 32, 32, 3
        affine = mode == "affine"
        # Halo engaged in both directions at this shape.
        assert h * w > fsp._max_cols(c, cfg.hidden_channels, affine)
        assert not fsp._bwd_whole_image_ok(h, w, c, cfg.hidden_channels, b)
        assert fsp._bwd_halo_rows(h, w, c, cfg.hidden_channels, affine) is not None
        assert fsp.backward_supported(h, w, c, cfg.hidden_channels, b, affine)

        sp = _noisy_step_params(c, cfg)
        kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
        zt = fsp.to_t(jax.random.normal(jax.random.key(2), (b, h, w, c)))
        gz = jax.random.normal(jax.random.key(3), zt.shape)
        gl = jax.random.normal(jax.random.key(4), (b,))

        def ref_f32_t(sp, zt):
            z = fsp.from_t(zt, (b, h, w, c))
            z, _, _ = L.actnorm_forward(sp["actnorm"], z, None)
            z, _ = L.permutation_forward(sp["perm"], z, None, kind, "xla", "highest")
            z, ld, _ = L.coupling_forward(
                sp["coupling"], z, jnp.zeros((b,), jnp.float32), mode,
                compute_dtype=jnp.float32,
            )
            return fsp.to_t(z), ld

        def loss(fn):
            def go(sp, zt):
                zn, ld = fn(sp, zt)
                return jnp.sum(zn * gz) + jnp.sum(ld * gl)
            return go

        fused = loss(lambda s, x: glow._fused_step_forward(s, x, kind, mode, (h, w), b))
        ref = loss(ref_f32_t)
        gf = jax.grad(fused, argnums=(0, 1), allow_int=True)(sp, zt)
        gr = jax.grad(ref, argnums=(0, 1), allow_int=True)(sp, zt)
        refs = dict(jax.tree_util.tree_leaves_with_path(gr))
        checked = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(gf):
            if leaf.dtype == jax.dtypes.float0:
                continue
            scale = max(1e-3, float(np.max(np.abs(np.asarray(refs[path])))))
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32), np.asarray(refs[path], np.float32),
                atol=3e-5 * scale, err_msg=jax.tree_util.keystr(path),
            )
            checked += 1
        assert checked >= 10
    finally:
        fsp._partitioned.cache_clear()
        fsp._partitioned_bwd.cache_clear()


def test_fused_backward_under_dp_mesh(eight_devices):
    """Full-model grads through the fused fwd+bwd kernels on an 8-device DP
    mesh == unsharded (exercises the weight-grad psum in the backward's
    custom_partitioning body)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.parallel import mesh as meshlib
    from pytorch_glow_tpu.utils.tree import merge, partition

    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    params = glow.init_glow(jax.random.key(0), CFG_XLA)
    x = jax.random.uniform(jax.random.key(1), (16, 8, 8, 3))
    params = glow.ddi_init(params, x, CFG_XLA)
    trainable, frozen = partition(params)

    def loss(tr, x):
        return jnp.mean(glow.log_prob(merge(tr, frozen), x, CFG)["nll"])

    g_local = jax.jit(jax.grad(loss))(trainable, x)
    ps = meshlib.shard_params(mesh, trainable)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_sharded = jax.jit(jax.grad(loss))(ps, xs)
    refs = dict(jax.tree_util.tree_leaves_with_path(g_local))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_sharded):
        scale = max(1e-3, float(np.max(np.abs(np.asarray(refs[path])))))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(refs[path]), atol=1e-4 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_halo_backward_under_dp_mesh(monkeypatch, eight_devices):
    """Halo BACKWARD under an 8-device DP mesh == unsharded (the 256²
    multi-chip training path): sharded single-step grads — including the
    halo-gradient fold and psum'd weight grads — must match the local run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.parallel import mesh as meshlib

    monkeypatch.setattr(fsp, "MAX_TILE_COLS", 512)
    fsp._partitioned.cache_clear()
    fsp._partitioned_bwd.cache_clear()
    try:
        cfg = dataclasses.replace(CFG, hidden_channels=32)
        c, h, w, b = 12, 32, 32, 8
        assert not fsp._bwd_whole_image_ok(h, w, c, cfg.hidden_channels, b)
        sp = _noisy_step_params(c, cfg)
        kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
        zt = fsp.to_t(jax.random.normal(jax.random.key(2), (b, h, w, c)))
        gz = jax.random.normal(jax.random.key(3), zt.shape)
        gl = jax.random.normal(jax.random.key(4), (b,))

        def loss(sp, zt):
            zn, ld = glow._fused_step_forward(
                sp, zt, kind, "affine", (h, w), b
            )
            return jnp.sum(zn * gz) + jnp.sum(ld * gl)

        g_local = jax.jit(jax.grad(loss, argnums=(0, 1), allow_int=True))(sp, zt)
        mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
        zts = jax.device_put(zt, NamedSharding(mesh, P(None, "data")))
        g_shard = jax.jit(jax.grad(loss, argnums=(0, 1), allow_int=True))(sp, zts)
        refs = dict(jax.tree_util.tree_leaves_with_path(g_local))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_shard):
            if leaf.dtype == jax.dtypes.float0:
                continue
            scale = max(1e-3, float(np.max(np.abs(np.asarray(refs[path])))))
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32),
                np.asarray(refs[path], np.float32),
                atol=1e-4 * scale, err_msg=jax.tree_util.keystr(path),
            )
    finally:
        fsp._partitioned.cache_clear()
        fsp._partitioned_bwd.cache_clear()


def test_fused_with_spatial_sharding_mesh(eight_devices):
    """celebahq256's production combination — shard_spatial (H over
    "model") + fused Pallas flow steps + grads — must compile and run on a
    (data=4, model=2) mesh.  The driver's dryrun uses the XLA path, so
    this is the only guard for the fused+SP interaction."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_glow_tpu.parallel import mesh as meshlib
    from pytorch_glow_tpu.utils.tree import merge, partition

    mesh = meshlib.make_mesh(MeshConfig(data=4, model=2))
    cfg = dataclasses.replace(
        CFG, image_shape=(16, 16, 3), remat=True, shard_spatial=True
    )
    params = glow.init_glow(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (8, 16, 16, 3))
    with jax.set_mesh(mesh):
        params = glow.ddi_init(params, x, cfg)
        trainable, frozen = partition(params)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))

        def loss(tr, xx):
            return jnp.mean(glow.log_prob(merge(tr, frozen), xx, cfg)["nll"])

        g = jax.jit(jax.grad(loss))(trainable, xs)
        val = float(jax.jit(loss)(trainable, xs))
    assert np.isfinite(val)
    assert all(
        bool(np.isfinite(np.asarray(leaf, np.float32)).all())
        for leaf in jax.tree.leaves(g)
        if leaf.dtype != jax.dtypes.float0
    )


def test_saturated_scale_gradients_finite():
    """When an affine-coupling scale saturates to 0 (sigmoid underflow),
    gradients must stay FINITE on both the fused-backward and XLA paths:
    the naive d log(sigmoid) composition yields inf*0 = NaN and killed an
    8k-step hardware soak; log_sigmoid / the fused cotangent do not."""
    c, h, w, b = 12, 4, 4, 4
    sp = _noisy_step_params(c, CFG)
    # Zero-init conv3 weights + a hugely negative bias on the raw (odd
    # cross-split) channels: raw = -200 -> s = sigmoid(-198) == 0.0 in f32.
    cp3 = sp["coupling"]["conv3"]
    bias = cp3["b"].at[1::2].set(-200.0)
    sp["coupling"]["conv3"] = {**cp3, "w": jnp.zeros_like(cp3["w"]),
                               "b": bias, "logs": jnp.zeros_like(cp3["logs"])}
    kind = L.permutation_kind(CFG.flow_permutation, CFG.lu_decomposed)
    zt = fsp.to_t(jax.random.normal(jax.random.key(2), (b, h, w, c)))
    gz = jax.random.normal(jax.random.key(3), zt.shape)
    gl = jax.random.normal(jax.random.key(4), (b,))

    def check(fn, tag):
        def loss(sp, zt):
            zn, ld = fn(sp, zt)
            assert_finite = jnp.sum(zn * gz) + jnp.sum(ld * gl)
            return assert_finite

        val = float(loss(sp, zt))
        assert np.isfinite(val), f"{tag} primal"
        g = jax.grad(loss, argnums=(0, 1), allow_int=True)(sp, zt)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g):
            if leaf.dtype == jax.dtypes.float0:
                continue
            assert np.isfinite(np.asarray(leaf, np.float32)).all(), (
                f"{tag}: non-finite grad at {jax.tree_util.keystr(path)}"
            )

    check(lambda s, x: glow._fused_step_forward(s, x, kind, "affine", (h, w), b),
          "fused kernel")
    check(lambda s, x: glow._fused_ref_forward_t(s, x, kind, "affine", (h, w), b),
          "xla ref")


def test_train_step_on_fused_kernel(tmp_path):
    """A few real train steps with flowstep_impl=pallas: finite loss,
    trajectory tracks the XLA impl (bf16 rounding apart)."""
    import optax

    from pytorch_glow_tpu.train import step as steplib

    tx = optax.adam(1e-3)
    results = {}
    for impl, cfg in (("pallas", CFG), ("xla", CFG_XLA)):
        state = steplib.init_state(jax.random.key(0), cfg, tx)
        x = jax.random.uniform(jax.random.key(1), (8, 8, 8, 3))
        state["params"] = glow.ddi_init(state["params"], x, cfg)
        train_step = steplib.make_train_step(cfg, tx)
        for i in range(3):
            batch = jax.random.uniform(jax.random.key(10 + i), (8, 8, 8, 3))
            state, metrics = train_step(state, batch)
        results[impl] = float(metrics["loss"])
    assert np.isfinite(results["pallas"])
    np.testing.assert_allclose(results["pallas"], results["xla"], rtol=2e-2)


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


def test_bwd_halo_row_choice_stays_on_proven_side_of_vmem_cliff():
    """Mosaic's real stack use exceeds the byte/column model by up to ~30%
    at small c: additive 128²·c12 with R=8 (1536 ext cols) compiled to a
    17.29 MB scoped allocation vs the 16 MB limit on v5e, while R=4 runs in
    production.  The derated halo budget must keep both coupling kinds at
    R=4 on the 256²-config top level (and never regress the proven affine
    choices at the deeper halo levels)."""
    assert fsp._bwd_halo_rows(128, 128, 12, 512, affine=False) == 4
    assert fsp._bwd_halo_rows(128, 128, 12, 512, affine=True) == 4
    assert fsp._bwd_halo_rows(64, 64, 24, 512, affine=True) == 8
    assert fsp._bwd_halo_rows(64, 64, 24, 512, affine=False) == 8
