"""Builder: profile -> {state, train_step, mesh, data, checkpoints}.

Mirrors the reference Builder's job (upstream:network/builder.py; SURVEY.md
§2.1 #18: model+optimizer+scheduler+devices from hparams, snapshot resume)
in functional JAX terms: construct the mesh, optimizer, jitted step
functions and a sharded train state; restore the latest Orbax snapshot if
one exists, otherwise run the DDI pass on the first host batch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import optax

from pytorch_glow_tpu.config import Profile
from pytorch_glow_tpu.data import pipeline
from pytorch_glow_tpu.models import glow
from pytorch_glow_tpu.parallel import mesh as meshlib
from pytorch_glow_tpu.train import step as steplib
from pytorch_glow_tpu.train.optim import make_optimizer, make_schedule
from pytorch_glow_tpu.utils.checkpoint import CheckpointManager


@dataclass
class Built:
    profile: Profile
    mesh: Any
    tx: optax.GradientTransformation
    state: dict
    train_step: Callable
    eval_step: Callable
    sample_fn: Callable
    reconstruct_fn: Callable
    data: Iterator | None
    ckpt: CheckpointManager | None
    start_step: int = 0
    resumed: bool = False
    extras: dict = field(default_factory=dict)


def _labels_to_onehot(batch: dict, profile: Profile):
    g = profile.glow
    if not g.y_condition:
        return None
    if "attr" in batch:  # CelebA ±1 attributes -> {0,1}
        return (jnp.asarray(batch["attr"]) > 0).astype(jnp.float32)
    if "label" in batch:
        return jax.nn.one_hot(jnp.asarray(batch["label"]), g.y_classes)
    return jnp.zeros((batch["image"].shape[0], g.y_classes), jnp.float32)


def build(
    profile: Profile,
    training: bool = True,
    with_data: bool = True,
    devices: list | None = None,
    restore: str = "latest",
) -> Built:
    """`restore`: which snapshot to load — "latest" (default; training resume)
    or "best" (lowest held-out eval bits/dim; inference/model selection)."""
    g, t = profile.glow, profile.train
    mesh = meshlib.make_mesh(profile.mesh, devices)
    if g.shard_spatial:
        # Spatial-sharding constraints inside the model need an ambient mesh.
        jax.set_mesh(mesh)
    tx = make_optimizer(profile.optim, t)

    state = steplib.init_state(jax.random.key(t.seed), g, tx, ema_decay=t.ema_decay)
    # Place everything on the mesh: params/opt_state with their GSPMD
    # shardings (replicated or TP), step/rng fully replicated — mixing
    # mesh-sharded and single-device arrays in one jit is an error.
    state["params"] = meshlib.shard_params(mesh, state["params"])
    state["opt_state"] = meshlib.put_global_tree(
        state["opt_state"], meshlib.param_shardings(mesh, state["opt_state"])
    )
    rep = meshlib.replicated(mesh)
    state["step"] = meshlib.put_global(state["step"], rep)
    state["rng"] = meshlib.put_global(state["rng"], rep)
    if "ema" in state:
        state["ema"] = meshlib.put_global_tree(
            state["ema"], meshlib.param_shardings(mesh, state["ema"])
        )

    if t.steps_per_call > 1:
        for gap_name in ("scalar_log_gap", "plot_gap", "checkpoint_gap", "eval_gap"):
            gap = getattr(t, gap_name)
            assert gap % t.steps_per_call == 0, (
                f"{gap_name}={gap} must be a multiple of steps_per_call="
                f"{t.steps_per_call}"
            )
        train_step = steplib.make_train_step_n(
            g, tx, t.steps_per_call, ema_decay=t.ema_decay,
            schedule=make_schedule(profile.optim), augment_flip=t.augment_flip,
        )
    else:
        train_step = steplib.make_train_step(
            g, tx, ema_decay=t.ema_decay, schedule=make_schedule(profile.optim),
            augment_flip=t.augment_flip,
        )
    # Serving-path config: eval/sampling/reconstruction take the fused
    # flow-step kernel on TPU (ops/flowstep_pallas.py; +60% and a 10x
    # tighter round-trip on v5e).  The train step keeps the profile's
    # setting — its backward runs the XLA math either way.
    serve_g = g
    import dataclasses as _dc

    if (
        g.flowstep_impl == "xla"
        and g.compute_dtype == "bfloat16"
        # shard_spatial only matters with a real "model" axis; on a pure-DP
        # mesh the constraints are no-ops and the kernel layout is safe.
        and not (g.shard_spatial and mesh.shape.get("model", 1) > 1)
        and jax.default_backend() == "tpu"
    ):
        serve_g = _dc.replace(g, flowstep_impl="pallas")
    eval_step = steplib.make_eval_step(serve_g)
    eval_step_n = steplib.make_eval_step_n(serve_g)
    sample_fn = steplib.make_sample_fn(serve_g, t.num_sample_images, t.sample_temperature)
    reconstruct_fn = steplib.make_reconstruct_fn(serve_g)
    swd_sample_fn = None
    if t.swd_gap:
        # T=1.0 is the density-matched temperature: SWD scores whether
        # samples match the data's per-scale patch statistics.
        swd_sample_fn = steplib.make_sample_fn(
            serve_g, min(t.swd_images, t.batch_size), 1.0
        )

    data = None
    eval_data = None
    if with_data:
        raw = pipeline.make_dataset(profile.data, g, t)
        data = pipeline.device_prefetch(
            raw, sharding=meshlib.batch_sharding(mesh), size=profile.data.prefetch
        )
        if t.eval_gap:
            eval_data = pipeline.make_dataset(profile.data, g, t, split="test")

    ckpt = None
    start_step = 0
    resumed = False
    out_dir = os.path.join(profile.out_dir, profile.name)
    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"), keep=t.keep_checkpoints)
    data_resume = None
    if restore == "best":
        restored = ckpt.restore_best(state)
        if restored is not None:
            state = restored
            start_step = int(state["step"])
            resumed = True
        # Fall back to the latest snapshot when no best was recorded
        # (e.g. the run never evaluated).
    latest = ckpt.latest_step()
    if not resumed and latest is not None:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_step = int(state["step"])
            resumed = True
            if training and data is not None:
                # Restore the host-stream position so a resumed run consumes
                # the SAME batches an uninterrupted run would have — bitwise-
                # deterministic resume (the reference reshuffles and silently
                # diverges on restart).  The iterator state saved beside the
                # snapshot makes this O(1); replay of start_step+1 batches is
                # the legacy fallback for pre-state checkpoints.
                saved = ckpt.restore_data_state(start_step)
                data_resume = None
                if saved is not None and hasattr(data, "set_state"):
                    try:
                        data.set_state(saved)
                        data_resume = "state"
                    except Exception as e:
                        # The sidecar was written by a different loader than
                        # the profile now routes to (e.g. an indexed-path
                        # snapshot resumed after the dataset gained a Grain
                        # source).  Degrade to batch replay, never crash a
                        # resume over stream position.
                        print(f"[build] saved data state incompatible with "
                              f"the current loader ({type(e).__name__}: {e}); "
                              f"replaying {start_step + 1} batches instead")
                if data_resume is None:
                    for _ in range(start_step + 1):
                        next(data)
                    data_resume = "replay"
    if resumed and training and t.ema_decay == 0 and "ema" in state:
        # The snapshot carried an EMA (its run had ema_decay > 0) but this
        # run doesn't maintain one — the train step would silently drop it
        # anyway; drop it here so eval/plot don't score never-updated params.
        print("[build] snapshot has EMA state but train.ema_decay=0; "
              "continuing without EMA")
        state = {k: v for k, v in state.items() if k != "ema"}
    if not resumed and training and data is not None:
        # Data-dependent actnorm init on the first host batch (one jitted
        # depth-scan; replaces the reference's first-forward side effect).
        first = next(data)
        x = glow.preprocess(jnp.asarray(first["image"]), g)
        x = glow.dequantize(jax.random.key(t.seed + 1), x, g)
        state["params"] = glow.ddi_init(state["params"], x, g)
        if "ema" in state:
            # Re-seed the EMA from the POST-DDI trainables — otherwise early
            # EMA eval/sampling would blend in the zero actnorm params the
            # model was initialized with.  jnp.copy: distinct buffers, or the
            # donated train step would see the same buffer twice.
            trainable, _ = steplib.partition(state["params"])
            state["ema"] = jax.tree.map(jnp.copy, trainable)

    return Built(
        profile=profile,
        mesh=mesh,
        tx=tx,
        state=state,
        train_step=train_step,
        eval_step=eval_step,
        sample_fn=sample_fn,
        reconstruct_fn=reconstruct_fn,
        data=data,
        ckpt=ckpt,
        extras={"eval_data": eval_data, "data_resume": data_resume,
                "eval_step_n": eval_step_n, "swd_sample_fn": swd_sample_fn},
        start_step=start_step,
        resumed=resumed,
    )
