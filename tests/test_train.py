"""End-to-end training slice tests: loss goes down, checkpoints resume,
profiles load (SURVEY.md §7 step 4)."""

import json
import os

import numpy as np
import pytest

from pytorch_glow_tpu.config import (
    DataConfig,
    GlowConfig,
    OptimConfig,
    Profile,
    TrainConfig,
)
from pytorch_glow_tpu.train import builder as builderlib
from pytorch_glow_tpu.train import trainer as trainerlib
from pytorch_glow_tpu.utils.profiles import load_profile, profile_from_dict, save_profile


def micro_profile(tmp_path, **glow_kw) -> Profile:
    return Profile(
        name="micro",
        glow=GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2, **glow_kw),
        optim=OptimConfig(lr=1e-3, warmup_steps=10),
        train=TrainConfig(
            batch_size=16,
            num_steps=16,
            scalar_log_gap=8,
            plot_gap=0,
            checkpoint_gap=8,
            num_sample_images=4,
            seed=0,
        ),
        data=DataConfig(name="synthetic"),
        out_dir=str(tmp_path),
    )


def test_train_loss_decreases_and_resumes(tmp_path):
    p = micro_profile(tmp_path)
    built = builderlib.build(p)
    assert not built.resumed
    result = trainerlib.train(built, quiet=True)
    assert result["final_step"] == 16
    assert np.isfinite(result["loss"])
    # Synthetic uniform-noise images: a flow should quickly approach the
    # ~8 bits/dim entropy of uniform data from a worse init.
    assert result["nll"] < 12.0
    # The step reports the schedule's lr-at-step (divergence forensics need
    # lr without hand reconstruction; see celebahq256 threshold, ROUND3.md).
    assert "lr" in result and 0.0 < result["lr"] <= 1.0

    # Resume: a fresh build must restore step 16 from orbax.
    built2 = builderlib.build(p)
    assert built2.resumed and built2.start_step == 16
    result2 = trainerlib.train(built2, num_steps=20, quiet=True)
    assert result2["final_step"] == 20


def test_train_nll_improves_from_init(tmp_path):
    p = micro_profile(tmp_path)
    built = builderlib.build(p)
    batch = next(built.data)
    m0 = built.eval_step(built.state["params"], batch["image"])
    nll0 = float(m0["nll"])
    trainerlib.train(built, num_steps=14, quiet=True)
    m1 = built.eval_step(built.state["params"], batch["image"])
    assert float(m1["nll"]) < nll0


def test_profile_json_roundtrip(tmp_path):
    p = micro_profile(tmp_path)
    path = os.path.join(tmp_path, "p.json")
    save_profile(path, p)
    p2 = load_profile(path)
    assert p2.glow == p.glow and p2.train == p.train and p2.optim == p.optim


def test_profile_preset_with_overrides():
    p = profile_from_dict({"preset": "tiny-cifar10", "train": {"batch_size": 32}})
    assert p.glow.K == 8 and p.train.batch_size == 32


def test_profile_unknown_key_raises():
    with pytest.raises(KeyError):
        profile_from_dict({"glow": {"bogus_key": 1}})


def test_profile_files_on_disk():
    """Every shipped profiles/*.json must parse AND stay in sync with the
    in-code preset of the same name (regenerate with utils.profiles.
    save_profile when presets change — round 3 caught silent drift)."""
    from pytorch_glow_tpu.config import PRESETS

    root = os.path.join(os.path.dirname(__file__), "..", "profiles")
    files = [f for f in os.listdir(root) if f.endswith(".json")]
    assert files, "no profiles shipped"
    for f in files:
        prof = load_profile(os.path.join(root, f))
        assert prof.glow.K > 0
        name = f[: -len(".json")]
        assert name in PRESETS, f"profile {f} has no matching preset"
        assert prof == PRESETS[name], f"profiles/{f} drifted from PRESETS"


def test_resume_is_bitwise_deterministic(tmp_path):
    """Checkpoint-resume must continue the EXACT trajectory: train 10 steps
    straight vs 5 + resume + 5 -> identical params (fold_in-per-step RNG +
    full state in orbax)."""
    import jax
    import numpy as np

    pa = micro_profile(tmp_path / "a").replace(
        train=TrainConfig(batch_size=16, num_steps=6, scalar_log_gap=6,
                          plot_gap=0, checkpoint_gap=0, seed=3),
    )
    built_a = builderlib.build(pa)
    trainerlib.train(built_a, quiet=True)

    pb = micro_profile(tmp_path / "b").replace(
        train=TrainConfig(batch_size=16, num_steps=6, scalar_log_gap=3,
                          plot_gap=0, checkpoint_gap=3, seed=3),
    )
    built_b = builderlib.build(pb)
    trainerlib.train(built_b, num_steps=3, quiet=True)
    built_b2 = builderlib.build(pb)
    assert built_b2.resumed and built_b2.start_step == 3
    # Resume restores the saved iterator state in O(1) — no batch replay.
    assert built_b2.extras["data_resume"] == "state"
    trainerlib.train(built_b2, num_steps=6, quiet=True)

    la = jax.tree_util.tree_leaves_with_path(built_a.state["params"])
    lb = dict(jax.tree_util.tree_leaves_with_path(built_b2.state["params"]))
    assert la
    for path, leaf_a in la:
        np.testing.assert_array_equal(
            np.asarray(leaf_a), np.asarray(lb[path]),
            err_msg=jax.tree_util.keystr(path),
        )


def test_ema_seeded_from_post_ddi_params(tmp_path):
    """EMA must start from the POST-DDI trainables, not the zero-actnorm
    init (otherwise early EMA sampling/eval blends in garbage params)."""
    import jax

    from pytorch_glow_tpu.utils.tree import partition

    p = micro_profile(tmp_path).replace(
        train=TrainConfig(batch_size=16, num_steps=4, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=0, ema_decay=0.999),
    )
    built = builderlib.build(p)
    trainable, _ = partition(built.state["params"])
    leaves_t = jax.tree_util.tree_leaves_with_path(trainable)
    leaves_e = dict(jax.tree_util.tree_leaves_with_path(built.state["ema"]))
    assert leaves_t
    for path, leaf in leaves_t:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(leaves_e[path]),
            err_msg=jax.tree_util.keystr(path),
        )


def test_no_checkpoint_save_on_failure(tmp_path):
    """A crash mid-training must NOT snapshot the (possibly donated /
    NaN-poisoned) state — --retries would otherwise resume from garbage."""
    p = micro_profile(tmp_path)
    built = builderlib.build(p)

    def exploding_step(state, batch, y=None):
        raise RuntimeError("boom")

    built.train_step = exploding_step
    with pytest.raises(RuntimeError, match="boom"):
        trainerlib.train(built, quiet=True)
    assert built.ckpt.latest_step() is None


def test_best_checkpoint_tracks_min_metric(tmp_path):
    """maybe_save_best keeps exactly the lowest-metric snapshot, persists
    across manager instances, and restore_best returns that state."""
    from pytorch_glow_tpu.utils.checkpoint import CheckpointManager

    state = {"w": np.arange(4.0), "step": np.array(0, np.int32)}
    ckpt = CheckpointManager(str(tmp_path / "ck"), keep=2)
    assert ckpt.best_info() is None
    assert ckpt.maybe_save_best(10, {**state, "step": np.array(10, np.int32)}, 3.0)
    assert ckpt.maybe_save_best(20, {**state, "step": np.array(20, np.int32)}, 2.5)
    assert not ckpt.maybe_save_best(30, {**state, "step": np.array(30, np.int32)}, 2.8)
    info = ckpt.best_info()
    assert info == {"step": 20, "metric": 2.5}
    ckpt.close()

    ckpt2 = CheckpointManager(str(tmp_path / "ck"), keep=2)  # fresh instance
    assert ckpt2.best_info() == {"step": 20, "metric": 2.5}
    assert not ckpt2.maybe_save_best(40, state, 2.6)  # best survives restart
    restored = ckpt2.restore_best(state)
    assert int(restored["step"]) == 20
    ckpt2.close()


def test_best_save_failure_rolls_back_pending(tmp_path):
    """A failed async best save must not poison the tracker: the in-flight
    _best_pending marker is rolled back (so later genuinely-better metrics
    still save), the error is surfaced on last_best_error, and a subsequent
    healthy save commits normally (round-4 ADVICE, severity medium)."""
    from pytorch_glow_tpu.utils.checkpoint import CheckpointManager

    state = {"w": np.arange(4.0), "step": np.array(0, np.int32)}
    ckpt = CheckpointManager(str(tmp_path / "ck"), keep=2)
    best_mgr = ckpt._get_best_mgr()
    orig_wait = best_mgr.wait_until_finished

    def flaky_wait():
        import threading as th

        # orbax's save() also calls wait_until_finished (from the main
        # thread); only the commit THREAD's barrier simulates the failure.
        if th.current_thread() is th.main_thread():
            return orig_wait()
        raise RuntimeError("simulated disk-full during best save")

    best_mgr.wait_until_finished = flaky_wait
    try:
        assert ckpt.maybe_save_best(10, state, 3.0)
        ckpt._join_best()  # commit thread fails here
    finally:
        best_mgr.wait_until_finished = orig_wait
    assert ckpt.last_best_error is not None
    assert ckpt._best_pending is None  # rolled back, not masking
    # best.json was never written, and the failure is not sticky: a WORSE
    # metric than the failed save's must still be accepted now.
    assert ckpt.maybe_save_best(20, {**state, "step": np.array(20, np.int32)}, 3.5)
    ckpt._join_best()
    assert ckpt.best_info() == {"step": 20, "metric": 3.5}
    restored = ckpt.restore_best(state)
    assert int(restored["step"]) == 20
    assert not ckpt._best_threads  # finished commit threads are pruned
    ckpt.close()


def test_restore_best_falls_back_when_sidecar_step_missing(tmp_path):
    """best.json pointing at a step that is not on disk (hard kill between
    orbax finalization and the sidecar write, or rotation) must degrade to
    the newest committed best snapshot instead of raising."""
    import json as jsonlib

    from pytorch_glow_tpu.utils.checkpoint import CheckpointManager

    state = {"w": np.arange(4.0), "step": np.array(0, np.int32)}
    ckpt = CheckpointManager(str(tmp_path / "ck"), keep=2)
    assert ckpt.maybe_save_best(10, {**state, "step": np.array(10, np.int32)}, 3.0)
    ckpt.wait()
    # Simulate the crash window: sidecar references a step orbax never kept.
    meta = ckpt._best_meta_path()
    with open(meta, "w") as f:
        jsonlib.dump({"step": 999, "metric": 2.0}, f)
    restored = ckpt.restore_best(state)
    assert restored is not None and int(restored["step"]) == 10
    ckpt.close()


def test_train_eval_saves_best_and_infer_restores_it(tmp_path):
    """eval_gap training records a best snapshot; build(restore="best")
    loads it (the one-command real-data model-selection path)."""
    p = micro_profile(tmp_path).replace(
        train=TrainConfig(batch_size=16, num_steps=8, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=8, eval_gap=4,
                          eval_batches=1, num_sample_images=4),
    )
    built = builderlib.build(p)
    trainerlib.train(built, quiet=True)
    info = built.ckpt.best_info()
    assert info is not None and np.isfinite(info["metric"])

    best = builderlib.build(p, training=False, with_data=False, restore="best")
    assert best.resumed and best.start_step == info["step"]


def test_restore_tolerates_ema_mismatch_both_ways(tmp_path):
    """Snapshots and restoring profiles may disagree on EMA presence (a soak
    launched with `--set train.ema_decay=…` read back by a plain profile, or
    an EMA-enabled preset resuming pre-EMA checkpoints).  Restore must adapt:
    surface the on-disk EMA to a no-EMA template, and seed a missing EMA
    from the restored trainables."""
    import jax

    from pytorch_glow_tpu.utils.tree import partition

    # Direction 1: checkpoint HAS ema, restoring profile does not.
    p_ema = micro_profile(tmp_path / "a").replace(
        train=TrainConfig(batch_size=16, num_steps=4, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=4, eval_gap=4,
                          eval_batches=1, num_sample_images=4,
                          ema_decay=0.999),
    )
    built = builderlib.build(p_ema)
    trainerlib.train(built, quiet=True)
    ema_saved = jax.tree.map(np.asarray, built.state["ema"])

    import dataclasses as _dc

    p_plain = p_ema.replace(train=_dc.replace(p_ema.train, ema_decay=0.0))
    # Inference keeps the surfaced EMA so `infer.py --ema` works.
    inf = builderlib.build(p_plain, training=False, with_data=False,
                           restore="best")
    assert inf.resumed and "ema" in inf.state
    got = dict(jax.tree_util.tree_leaves_with_path(inf.state["ema"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(ema_saved):
        np.testing.assert_array_equal(np.asarray(got[path]), leaf,
                                      err_msg=jax.tree_util.keystr(path))
    # A training resume with ema_decay=0 drops it (it would never update).
    tr = builderlib.build(p_plain)
    assert tr.resumed and "ema" not in tr.state

    # Direction 2: checkpoint LACKS ema, restoring profile has it ->
    # EMA seeded from the restored trainables.
    p_raw = micro_profile(tmp_path / "b").replace(
        train=TrainConfig(batch_size=16, num_steps=4, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=4),
    )
    built_raw = builderlib.build(p_raw)
    trainerlib.train(built_raw, quiet=True)
    p_raw_ema = p_raw.replace(train=_dc.replace(p_raw.train, ema_decay=0.999))
    res = builderlib.build(p_raw_ema)
    assert res.resumed and "ema" in res.state
    trainable, _ = partition(res.state["params"])
    seeded = dict(jax.tree_util.tree_leaves_with_path(res.state["ema"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(trainable):
        np.testing.assert_array_equal(
            np.asarray(seeded[path]), np.asarray(leaf),
            err_msg=jax.tree_util.keystr(path))
    # And the resumed run trains on (EMA updates from the seed).
    trainerlib.train(res, num_steps=8, quiet=True)


def test_celebahq256_structure_trains_5bit_L6(tmp_path):
    """Micro mirror of the celebahq256 preset's structure (L=6 multi-scale,
    5-bit images, remat) trained end-to-end: finite loss near the 5-bit
    synthetic entropy floor and an exact (one 5-bit bin) reconstruction."""
    import jax

    from pytorch_glow_tpu.models import glow as g
    from pytorch_glow_tpu.train import step as steplib

    p = Profile(
        name="micro-hq",
        glow=GlowConfig(image_shape=(64, 64, 3), hidden_channels=8, K=1, L=6,
                        n_bits_x=5, remat=True),
        optim=OptimConfig(lr=1e-3, warmup_steps=10),
        train=TrainConfig(batch_size=8, num_steps=4, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=0, num_sample_images=2),
        data=DataConfig(name="synthetic", image_size=64),
        out_dir=str(tmp_path),
    )
    built = builderlib.build(p)
    result = trainerlib.train(built, quiet=True)
    assert result["final_step"] == 4
    # Uniform synthetic noise has 8 bits/dim entropy, but 5-bit reduction
    # caps the objective at ~5 bits/dim + dequant overhead.
    assert np.isfinite(result["loss"]) and result["loss"] < 10.0
    batch = next(built.data)
    rec = np.asarray(built.reconstruct_fn(built.state["params"],
                                          batch["image"][:2]))
    x = np.asarray(jax.device_get(
        steplib.glow.postprocess(
            g.preprocess(jax.numpy.asarray(batch["image"][:2]), p.glow), p.glow)
    ))
    assert np.abs(x.astype(np.int16) - rec.astype(np.int16)).max() <= 8


def test_nonfinite_grads_skip_update(tmp_path):
    """A NaN-poisoned batch must NOT corrupt params: the optimizer skips
    non-finite updates (optax.apply_if_finite; found by an 8k-step hardware
    soak where one NaN step killed the run and deterministic resume
    replayed it)."""
    import jax
    import jax.numpy as jnp

    from pytorch_glow_tpu.utils.tree import partition

    p = micro_profile(tmp_path)
    assert p.train.skip_nonfinite_updates > 0  # default on
    built = builderlib.build(p)
    state = built.state
    good = next(built.data)["image"]
    state, m = built.train_step(state, good)
    before = jax.tree.map(np.asarray, partition(state["params"])[0])

    bad = jnp.asarray(good, jnp.float32).at[0, 0, 0, 0].set(jnp.nan)
    state, m = built.train_step(state, bad)
    assert not np.isfinite(float(m["loss"]))
    after = dict(jax.tree_util.tree_leaves_with_path(partition(state["params"])[0]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(before):
        np.testing.assert_array_equal(  # bitwise: the update was skipped
            np.asarray(after[path]), leaf, err_msg=jax.tree_util.keystr(path)
        )

    state, m = built.train_step(state, good)  # training continues
    assert np.isfinite(float(m["loss"]))
    after2 = dict(jax.tree_util.tree_leaves_with_path(partition(state["params"])[0]))
    assert any(
        not np.array_equal(np.asarray(after2[path]), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(before)
    )


def test_trainer_survives_isolated_nan_log(tmp_path):
    """One non-finite scalar log must not abort training (the optimizer
    skipped the update); three consecutive ones must."""
    import jax.numpy as jnp

    p = micro_profile(tmp_path).replace(
        train=TrainConfig(batch_size=16, num_steps=12, scalar_log_gap=2,
                          plot_gap=0, checkpoint_gap=0),
    )
    built = builderlib.build(p)
    real_step = built.train_step
    calls = {"n": 0}

    def step_with_one_nan(state, batch, y=None):
        state, metrics = real_step(state, batch, y)
        calls["n"] += 1
        if calls["n"] == 4:
            metrics = {**metrics, "loss": jnp.float32(jnp.nan)}
        return state, metrics

    built.train_step = step_with_one_nan
    result = trainerlib.train(built, quiet=True)  # must not raise
    assert result["final_step"] == 12 and np.isfinite(result["loss"])

    p2 = micro_profile(tmp_path / "b").replace(
        train=TrainConfig(batch_size=16, num_steps=12, scalar_log_gap=2,
                          plot_gap=0, checkpoint_gap=0),
    )
    built2 = builderlib.build(p2)
    real2 = built2.train_step

    def step_always_nan(state, batch, y=None):
        state, metrics = real2(state, batch, y)
        return state, {**metrics, "loss": jnp.float32(jnp.nan)}

    built2.train_step = step_always_nan
    with pytest.raises(FloatingPointError, match="3 consecutive"):
        trainerlib.train(built2, quiet=True)


def test_model_summary():
    from pytorch_glow_tpu.utils.summary import param_count, summarize
    import jax
    from pytorch_glow_tpu.models import glow as g

    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)
    params = g.init_glow(jax.random.key(0), cfg)
    assert param_count(params) > 1000
    s = summarize(params, cfg)
    assert "params" in s and "GFLOP" in s


def test_steps_per_call_identical_trajectory(tmp_path):
    """N-chained train steps in one jit == N separate dispatches, bitwise."""
    import jax
    import numpy as np

    def prof(sub, spc):
        return micro_profile(tmp_path / sub).replace(
            train=TrainConfig(batch_size=16, num_steps=8, scalar_log_gap=8,
                              plot_gap=0, checkpoint_gap=0, seed=5,
                              steps_per_call=spc),
        )

    ra = builderlib.build(prof("a", 1))
    trainerlib.train(ra, quiet=True)
    rb = builderlib.build(prof("b", 4))
    res_b = trainerlib.train(rb, quiet=True)
    assert res_b["final_step"] == 8

    la = jax.tree_util.tree_leaves_with_path(ra.state["params"])
    lb = dict(jax.tree_util.tree_leaves_with_path(rb.state["params"]))
    for path, leaf_a in la:
        np.testing.assert_array_equal(
            np.asarray(leaf_a), np.asarray(lb[path]),
            err_msg=jax.tree_util.keystr(path),
        )


def test_augment_flip_in_jit_deterministic_and_effective(tmp_path):
    """augment_flip draws horizontal flips inside the jitted step from the
    saved per-step rng: reruns are bitwise-identical (resume-stable), and
    the flipped trajectory genuinely diverges from the unflipped one."""
    import dataclasses

    def run(flip, subdir):
        p = micro_profile(tmp_path / subdir)
        p = dataclasses.replace(
            p, train=dataclasses.replace(p.train, augment_flip=flip, num_steps=6)
        )
        built = builderlib.build(p)
        return trainerlib.train(built, quiet=True)

    a = run(True, "a")
    b = run(True, "b")
    c = run(False, "c")
    assert np.isfinite(a["loss"])
    assert a["loss"] == b["loss"] and a["grad_norm"] == b["grad_norm"]
    # Same seeds + same dequant-noise stream, only the flips differ:
    assert a["loss"] != c["loss"]


def test_lineage_profile_format_loads_and_trains(tmp_path, capsys):
    """The reference lineage's capitalized-section hparams JSON loads
    transparently (upstream:profile/*.json shape; keys with no equivalent
    are reported and dropped, not fatal)."""
    lineage = {
        "Dir": {"log_root": str(tmp_path), "snapshot_root": "snapshots"},
        "Glow": {
            "image_shape": [3, 8, 8],  # lineage CHW order -> reordered
            "hidden_channels": 16, "K": 2, "L": 2, "actnorm_scale": 1.0,
            "flow_permutation": "invconv", "flow_coupling": "additive",
            "LU_decomposed": True, "learn_top": False,
            "y_condition": True, "y_classes": 4,
        },
        "Criterion": {"y_condition": "single-class"},
        "Data": {"dataset": "celeba", "dataset_root": "/nonexistent", "num_workers": 2},
        "Optim": {
            "name": "adam",
            "args": {"lr": 2e-3, "betas": [0.9, 0.9995], "eps": 1e-8},
            "Schedule": {"name": "noam_learning_rate_decay",
                          "args": {"warmup_steps": 7, "minimum": 1e-4}},
        },
        "Train": {"batch_size": 8, "num_batches": 4, "max_grad_clip": 5,
                   "max_grad_norm": None, "scalar_log_gap": 4, "plot_gap": 0,
                   "checkpoint_gap": 0, "num_plot_samples": 4,
                   "validation_gap": 100},
        "Device": {"glow": ["cuda:0"], "data": "cuda"},
        "Infer": {"pre_trained": ""},
    }
    path = tmp_path / "celeba_lineage.json"
    with open(path, "w") as f:
        json.dump(lineage, f)
    p = load_profile(str(path))
    notice = capsys.readouterr().out
    assert "no equivalent for" in notice and "Device.*" in notice
    assert p.name == "celeba_lineage"
    assert p.glow.image_shape == (8, 8, 3)  # CHW -> HWC
    assert p.glow.lu_decomposed is True and p.glow.y_classes == 4
    assert p.glow.y_multi_class is False  # Criterion "single-class"
    assert p.optim.lr == 2e-3 and p.optim.schedule == "noam"
    assert p.optim.warmup_steps == 7
    assert p.train.num_steps == 4 and p.train.max_grad_norm == 0.0
    assert p.data.name == "celeba" and p.out_dir == str(tmp_path)

    # Trains end-to-end (nonexistent data root -> synthetic fallback).
    built = builderlib.build(p)
    r = trainerlib.train(built, quiet=True)
    assert r["final_step"] == 4 and np.isfinite(r["loss"])


def test_eval_logs_raw_and_ema_nll_and_swd(tmp_path):
    """With EMA on, every eval logs BOTH eval_nll (EMA params) and
    eval_nll_raw (live params) — the within-run EMA A/B — and swd_gap
    logs the sample-quality swd_x1e3 trajectory."""
    import csv

    p = micro_profile(tmp_path).replace(
        train=TrainConfig(batch_size=16, num_steps=8, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=8, eval_gap=4,
                          eval_batches=1, num_sample_images=4,
                          ema_decay=0.99, swd_gap=8, swd_images=16),
    )
    built = builderlib.build(p)
    trainerlib.train(built, quiet=True)
    with open(os.path.join(str(tmp_path), "micro", "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    evals = [r for r in rows if r.get("eval_nll")]
    assert evals, f"no eval rows in {rows}"
    for r in evals:
        assert r.get("eval_nll_raw"), r
        assert np.isfinite(float(r["eval_nll"]))
        assert np.isfinite(float(r["eval_nll_raw"]))
    swds = [r for r in rows if r.get("swd_x1e3")]
    assert swds and all(float(r["swd_x1e3"]) > 0 for r in swds), rows
