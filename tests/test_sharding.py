"""GSPMD tests on the fake 8-CPU-device mesh (SURVEY.md §4, §7 step 6).

Covers: pure DP (batch over "data"), DP x TP (coupling hidden channels over
"model"), replica-consistent DDI, and numerical equivalence of sharded vs
single-device training steps.
"""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_glow_tpu.config import (
    DataConfig,
    GlowConfig,
    MeshConfig,
    OptimConfig,
    Profile,
    TrainConfig,
)
from pytorch_glow_tpu.models import glow
from pytorch_glow_tpu.parallel import mesh as meshlib
from pytorch_glow_tpu.train import builder as builderlib
from pytorch_glow_tpu.train import step as steplib
from pytorch_glow_tpu.train.optim import make_optimizer

CFG = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)
TRAIN = TrainConfig(batch_size=16, seed=0)
OPTIM = OptimConfig(lr=1e-3, warmup_steps=10)


def test_mesh_shapes(eight_devices):
    m = meshlib.make_mesh(MeshConfig(data=-1, model=1))
    assert m.shape == {"data": 8, "model": 1}
    m2 = meshlib.make_mesh(MeshConfig(data=4, model=2))
    assert m2.shape == {"data": 4, "model": 2}


def _build_sharded(mesh_cfg: MeshConfig):
    mesh = meshlib.make_mesh(mesh_cfg)
    tx = make_optimizer(OPTIM, TRAIN)
    state = steplib.init_state(jax.random.key(0), CFG, tx)
    state["params"] = meshlib.shard_params(mesh, state["params"])
    state["opt_state"] = jax.device_put(
        state["opt_state"], meshlib.param_shardings(mesh, state["opt_state"])
    )
    return mesh, tx, state


def _batch(mesh):
    x = jax.random.uniform(jax.random.key(1), (16, 8, 8, 3))
    return jax.device_put(x, meshlib.batch_sharding(mesh))


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(data=8, model=1), MeshConfig(data=4, model=2)])
def test_sharded_train_step_runs(eight_devices, mesh_cfg):
    mesh, tx, state = _build_sharded(mesh_cfg)
    x = _batch(mesh)
    state["params"] = glow.ddi_init(state["params"], x, CFG)
    train_step = steplib.make_train_step(CFG, tx)
    state, metrics = train_step(state, x)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = train_step(state, x)
    assert np.isfinite(float(metrics["loss"]))


def test_tp_actually_shards_hidden_channels(eight_devices):
    mesh = meshlib.make_mesh(MeshConfig(data=4, model=2))
    params = glow.init_glow(jax.random.key(0), CFG)
    sharded = meshlib.shard_params(mesh, params)
    w1 = sharded["levels"][0]["steps"]["coupling"]["conv1"]["w"]
    # (K,3,3,Cin,hidden) sharded on the hidden axis over "model"=2.
    shard_shapes = {s.data.shape for s in w1.addressable_shards}
    assert all(s[-1] == w1.shape[-1] // 2 for s in shard_shapes), shard_shapes
    # Row-parallel conv2 shards its input-channel axis.
    w2 = sharded["levels"][0]["steps"]["coupling"]["conv2"]["w"]
    assert all(
        s.data.shape[-2] == w2.shape[-2] // 2 for s in w2.addressable_shards
    )


def test_ddi_replica_consistent(eight_devices):
    """DDI on a sharded batch must equal DDI on the same unsharded batch."""
    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    params = glow.init_glow(jax.random.key(0), CFG)
    x = jax.random.uniform(jax.random.key(2), (16, 8, 8, 3))

    p_local = glow.ddi_init(params, x, CFG)
    p_shard = glow.ddi_init(
        meshlib.shard_params(mesh, params),
        jax.device_put(x, meshlib.batch_sharding(mesh)),
        CFG,
    )
    a = p_local["levels"][0]["steps"]["actnorm"]["logs"]
    b = jax.device_get(p_shard["levels"][0]["steps"]["actnorm"]["logs"])
    np.testing.assert_allclose(np.asarray(a), b, atol=1e-5)


def test_sharded_loss_matches_single_device(eight_devices):
    """Same params+batch => DP-sharded loss == single-device loss."""
    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    params = glow.init_glow(jax.random.key(0), CFG)
    x = jax.random.uniform(jax.random.key(3), (16, 8, 8, 3))
    params = glow.ddi_init(params, x, CFG)

    out_local = glow.log_prob(params, x, CFG)
    out_shard = glow.log_prob(
        meshlib.shard_params(mesh, params),
        jax.device_put(x, meshlib.batch_sharding(mesh)),
        CFG,
    )
    np.testing.assert_allclose(
        np.asarray(out_local["nll"]), jax.device_get(out_shard["nll"]), rtol=2e-4
    )


def test_builder_on_mesh(eight_devices, tmp_path):
    p = Profile(
        name="mesh-micro",
        glow=CFG,
        optim=OPTIM,
        train=TrainConfig(batch_size=16, num_steps=5, scalar_log_gap=5,
                          plot_gap=0, checkpoint_gap=0),
        data=DataConfig(name="synthetic"),
        mesh=MeshConfig(data=4, model=2),
        out_dir=str(tmp_path),
    )
    built = builderlib.build(p)
    batch = next(built.data)
    state, metrics = built.train_step(built.state, batch["image"], None)
    assert np.isfinite(float(metrics["loss"]))


def test_spatial_sharding_matches_unsharded(eight_devices):
    """shard_spatial: H over "model" under an ambient mesh — same numbers,
    activations actually sharded (SP analog for images, SURVEY.md §5)."""
    import jax.numpy as jnp

    cfg_plain = GlowConfig(image_shape=(16, 16, 3), hidden_channels=16, K=2, L=2)
    cfg_sp = GlowConfig(
        image_shape=(16, 16, 3), hidden_channels=16, K=2, L=2, shard_spatial=True
    )
    params = glow.init_glow(jax.random.key(0), cfg_plain)
    x = jax.random.uniform(jax.random.key(1), (8, 16, 16, 3))
    params = glow.ddi_init(params, x, cfg_plain)

    out_plain = glow.log_prob(params, x, cfg_plain)

    mesh = meshlib.make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        ps = meshlib.shard_params(mesh, params)
        xs = jax.device_put(x, meshlib.batch_sharding(mesh))
        out_sp = jax.jit(lambda p, x: glow.log_prob(p, x, cfg_sp))(ps, xs)
        rec = jax.jit(lambda p, x: glow.reconstruct(p, x, cfg_sp))(ps, xs)

    np.testing.assert_allclose(
        np.asarray(out_sp["nll"]), np.asarray(out_plain["nll"]), rtol=2e-4
    )
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3)


def test_spatial_sharding_noop_without_mesh():
    cfg_sp = GlowConfig(
        image_shape=(16, 16, 3), hidden_channels=16, K=2, L=2, shard_spatial=True
    )
    params = glow.init_glow(jax.random.key(0), cfg_sp)
    x = jax.random.uniform(jax.random.key(1), (4, 16, 16, 3))
    out = glow.log_prob(params, x, cfg_sp)
    assert np.isfinite(np.asarray(out["nll"])).all()


@pytest.mark.multiprocess
def test_two_process_multihost_smoke():
    """REAL jax.distributed multi-process path (not virtual devices): two
    processes x 4 CPU devices form one 8-device global mesh; verifies
    per-process batch assembly (identical global loss on both processes),
    psum'd grads, and a distributed orbax save + resume.  Exercises
    parallel/mesh.put_global (jax.device_put cannot place onto
    non-addressable shardings) end-to-end."""
    import json
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multihost_smoke.py"
    )
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=780,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if "multihost_smoke" in ln][-1]
    out = json.loads(line)
    assert out["multihost_smoke"] == "OK"
    assert len(out["procs"]) == 2


@pytest.mark.multiprocess
def test_two_process_grain_sharding_smoke():
    """Grain under REAL jax.process_count() == 2 (round-2 verdict missing
    #4): an on-disk CIFAR-format source read through grain.ShardOptions —
    disjoint per-process record ids covering the full epoch, per-process
    opaque-state resume, and an end-to-end Builder train run assembling a
    consistent global batch (identical loss on both processes)."""
    import json
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multihost_grain_smoke.py"
    )
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=780,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if "multihost_grain_smoke" in ln][-1]
    out = json.loads(line)
    assert out["multihost_grain_smoke"] == "OK"
    assert out["per_proc_records"] == [40, 40]


@pytest.mark.multiprocess
def test_two_process_tfrecord_sharding_smoke():
    """The pure-Python TFRecord reader (data/tfrecord.py) under REAL
    jax.process_count() == 2: tfds-style shards written by TensorFlow in
    the parent, consumed TF-free by the children — disjoint per-process
    record ids covering the full epoch, O(1) index-state resume per
    process, and an end-to-end Builder train run assembling a consistent
    global batch (identical loss on both processes)."""
    import json
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multihost_tfrecord_smoke.py"
    )
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=780,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if "multihost_tfrecord_smoke" in ln][-1]
    out = json.loads(line)
    assert out["multihost_tfrecord_smoke"] == "OK"
    assert out["per_proc_records"] == [40, 40]


def test_put_global_single_process(eight_devices):
    """Single-process put_global == device_put for arrays, typed PRNG keys,
    and sharded specs (the multi-process branch is covered by the smoke)."""
    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    rep = meshlib.replicated(mesh)

    x = jnp.arange(16.0).reshape(8, 2)
    gx = meshlib.put_global(x, meshlib.batch_sharding(mesh))
    assert gx.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(x))

    key = jax.random.key(7)
    gkey = meshlib.put_global(key, rep)
    assert jax.dtypes.issubdtype(gkey.dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(gkey)), np.asarray(jax.random.key_data(key))
    )
    # The placed key must behave identically.
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(gkey, (3,))),
        np.asarray(jax.random.uniform(key, (3,))),
    )


@pytest.mark.multiprocess
def test_two_process_preemption_collective_stop():
    """SIGTERM delivered to ONE of two jax.distributed processes: the
    trainer's OR-reduced preemption flag (train/trainer._preempt_stop) must
    stop BOTH at the same step boundary, write the distributed snapshot,
    and leave a state a second 2-process wave resumes to completion —
    the only regime where a one-sided break would deadlock the peer."""
    import json
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multihost_preempt_smoke.py"
    )
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=780,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if "multihost_preempt_smoke" in ln][-1]
    out = json.loads(line)
    assert out["multihost_preempt_smoke"] == "OK"
    assert all(o["preempted"] for o in out["procs"])
    assert all(o["final_step"] == out["resumed_to"] for o in out["resume"])


@pytest.mark.multiprocess
def test_four_process_two_device_smoke():
    """4 processes x 2 local devices (same 8-device global mesh as the 2x4
    smoke): proves nothing in batch assembly, checkpointing, or the mesh
    layout hardcodes process pairness or 4-device hosts."""
    import json
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multihost_smoke.py"
    )
    proc = subprocess.run(
        [sys.executable, script, "--nprocs", "4", "--local-devices", "2"],
        capture_output=True, text=True, timeout=780,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if "multihost_smoke" in ln][-1]
    out = json.loads(line)
    assert out["multihost_smoke"] == "OK"
    assert len(out["procs"]) == 4


# ---------------------------------------------------------------------------
# Round-5: sharded-vs-unsharded TRAIN-STEP equality across mesh layouts
# (round-4 verdict Next #7; SURVEY.md §2.3 / §4 fake-mesh protocol).  The
# existing equality tests cover DP loss and SP log_prob; these run the FULL
# production train step (grads + clip + adam + EMA) and compare every
# parameter leaf after two updates.
# ---------------------------------------------------------------------------


def _assert_trees_close(a, b, rtol, atol, ctx=""):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(la)), np.asarray(jax.device_get(lb)),
            rtol=rtol, atol=atol,
            err_msg=f"{ctx}{jax.tree_util.keystr(path)}",
        )


def _train_n_steps(cfg, mesh_cfg, n_steps=2, grad_accum=1, batch=16):
    """Run the production train step n times on FIXED batches; returns
    (params, losses).  mesh_cfg=None = single-device reference run."""
    t = TrainConfig(batch_size=batch, seed=0, grad_accum=grad_accum)
    tx = make_optimizer(OPTIM, t)
    state = steplib.init_state(jax.random.key(0), cfg, tx, ema_decay=0.999)
    batches = [
        jax.random.uniform(jax.random.key(100 + i), (batch, *cfg.image_shape))
        for i in range(n_steps)
    ]
    mesh = meshlib.make_mesh(mesh_cfg) if mesh_cfg is not None else None
    from contextlib import ExitStack

    with ExitStack() as stack:
        if mesh is not None and cfg.shard_spatial:
            stack.enter_context(jax.set_mesh(mesh))
        if mesh is not None:
            state["params"] = meshlib.shard_params(mesh, state["params"])
            state["opt_state"] = jax.device_put(
                state["opt_state"],
                meshlib.param_shardings(mesh, state["opt_state"]),
            )
            state["ema"] = jax.device_put(
                state["ema"], meshlib.param_shardings(mesh, state["ema"])
            )
            batches = [
                jax.device_put(x, meshlib.batch_sharding(mesh)) for x in batches
            ]
        state["params"] = glow.ddi_init(state["params"], batches[0], cfg)
        train_step = steplib.make_train_step(cfg, tx, ema_decay=0.999)
        losses = []
        for x in batches:
            state, metrics = train_step(state, x)
            losses.append(float(jax.device_get(metrics["loss"])))
        return jax.device_get(state["params"]), jax.device_get(state["ema"]), losses


@pytest.mark.parametrize(
    "mesh_cfg", [MeshConfig(data=4, model=2), MeshConfig(data=2, model=4)]
)
def test_dp_tp_train_step_matches_single_device(eight_devices, mesh_cfg):
    """DP x TP with a hidden width (64) where TP is nontrivial: params AND
    EMA equal the single-device run leaf-by-leaf after two full updates."""
    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=64, K=2, L=2)
    p_ref, ema_ref, loss_ref = _train_n_steps(cfg, None)
    p_sh, ema_sh, loss_sh = _train_n_steps(cfg, mesh_cfg)
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=2e-5)
    _assert_trees_close(p_sh, p_ref, rtol=2e-4, atol=2e-5, ctx="params")
    _assert_trees_close(ema_sh, ema_ref, rtol=2e-4, atol=2e-5, ctx="ema")


def test_dp_tp_sp_train_step_matches_single_device(eight_devices):
    """DP x TP x SP combined: spatial-H constraints + TP-sharded hidden width
    under one mesh must not change the training trajectory."""
    kw = dict(image_shape=(16, 16, 3), hidden_channels=64, K=2, L=2)
    cfg_plain = GlowConfig(**kw)
    cfg_sp = GlowConfig(**kw, shard_spatial=True)
    p_ref, ema_ref, loss_ref = _train_n_steps(cfg_plain, None, batch=8)
    p_sh, ema_sh, loss_sh = _train_n_steps(
        cfg_sp, MeshConfig(data=2, model=4), batch=8
    )
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=2e-5)
    _assert_trees_close(p_sh, p_ref, rtol=2e-4, atol=2e-5, ctx="params")
    _assert_trees_close(ema_sh, ema_ref, rtol=2e-4, atol=2e-5, ctx="ema")


def test_grad_accum_under_mesh_matches_unsharded(eight_devices):
    """optax.MultiSteps accumulation under a DP x TP mesh: 4 micro-steps
    (= 2 optimizer updates at accum 2) land on the same params as the
    identical single-device run."""
    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=64, K=2, L=2)
    p_ref, ema_ref, loss_ref = _train_n_steps(cfg, None, n_steps=4, grad_accum=2)
    p_sh, ema_sh, loss_sh = _train_n_steps(
        cfg, MeshConfig(data=4, model=2), n_steps=4, grad_accum=2
    )
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=2e-5)
    _assert_trees_close(p_sh, p_ref, rtol=2e-4, atol=2e-5, ctx="params")
    _assert_trees_close(ema_sh, ema_ref, rtol=2e-4, atol=2e-5, ctx="ema")


def test_fused_kernel_interpret_under_mesh_matches_unsharded(eight_devices):
    """The fused Pallas flow-step path (interpret mode on CPU) under a pure-
    DP mesh: sharded fused training == unsharded fused training.  Guards the
    kernel's custom_vjp + GSPMD interaction, not just the XLA path."""
    cfg = GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
        flowstep_impl="pallas", compute_dtype="float32",
    )
    p_ref, ema_ref, loss_ref = _train_n_steps(cfg, None, n_steps=2)
    p_sh, ema_sh, loss_sh = _train_n_steps(cfg, MeshConfig(data=8, model=1), n_steps=2)
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=2e-5)
    _assert_trees_close(p_sh, p_ref, rtol=2e-4, atol=2e-5, ctx="params")
    _assert_trees_close(ema_sh, ema_ref, rtol=2e-4, atol=2e-5, ctx="ema")
