#!/usr/bin/env python
"""Within-process A/B: full TRAIN-step throughput, fused Pallas flow-step
(fwd + hand-derived bwd kernels) vs the XLA path.

Methodology (docs/BENCHMARKING.md): cross-process numbers on this tunneled
chip vary up to ~2.5x, so both impls run in ONE process back-to-back;
steps_per_call train steps chain in one jit dispatch (production loop
shape); best-of-REPS wall time after a warm-up dispatch.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train.py
Env: AB_PRESET (celeba64), AB_SPC (5), AB_REPS (4), AB_IMPLS (pallas,xla)
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

from pytorch_glow_tpu.config import PRESETS
from pytorch_glow_tpu.models import glow
from pytorch_glow_tpu.train import step as steplib
from pytorch_glow_tpu.train.optim import make_optimizer


def run(prof, impl: str, spc: int, remat: bool | None = None) -> dict:
    cfg = dataclasses.replace(
        prof.glow, flowstep_impl=impl,
        remat=prof.glow.remat if remat is None else remat,
    )
    b = int(os.environ.get("AB_BATCH", prof.train.batch_size))
    h, w, c = cfg.image_shape
    tx = make_optimizer(prof.optim, prof.train)
    state = steplib.init_state(jax.random.key(0), cfg, tx)
    x_u8 = jax.random.randint(jax.random.key(1), (b, h, w, c), 0, 256, jnp.uint8)
    xf = glow.dequantize(jax.random.key(2), glow.preprocess(x_u8, cfg), cfg)
    state["params"] = glow.ddi_init(state["params"], xf, cfg)
    step_n = steplib.make_train_step_n(cfg, tx, spc)
    batches = jax.random.randint(
        jax.random.key(3), (spc, b, h, w, c), 0, 256, jnp.uint8
    )
    y = None
    if cfg.y_condition:
        labels = jax.random.randint(jax.random.key(4), (spc, b), 0, cfg.y_classes)
        y = jax.nn.one_hot(labels, cfg.y_classes)

    t0 = time.time()
    state, metrics = step_n(state, batches, y)
    loss0 = float(jax.device_get(metrics["loss"]))  # full sync
    compile_s = time.time() - t0

    def reps_time(n: int):
        """Wall for n chained dispatches, synced by a device_get at the end
        (block_until_ready alone does not reliably sync through the axon
        tunnel's async executor)."""
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_n(state, batches, y)
        float(jax.device_get(metrics["loss"]))
        return time.perf_counter() - t0, metrics

    # Two-N differencing cancels the one-off dispatch/sync tunnel latency.
    n1, n2 = 2, 6
    t1, _ = reps_time(n1)
    t2, metrics = reps_time(n2)
    per_step = (t2 - t1) / ((n2 - n1) * spc)
    return {
        "impl": impl,
        "remat": cfg.remat,
        "train_images_per_sec": round(b / per_step, 1),
        "ms_per_step": round(1000 * per_step, 2),
        "compile_s": round(compile_s, 1),
        "loss0": round(loss0, 4),
        "loss": round(float(jax.device_get(metrics["loss"])), 4),
        "grad_norm": round(float(jax.device_get(metrics["grad_norm"])), 4),
        "raw_wall_s": [round(t1, 3), round(t2, 3)],
    }


def main() -> None:
    preset = os.environ.get("AB_PRESET", "celeba64")
    spc = int(os.environ.get("AB_SPC", "5"))
    impls = os.environ.get("AB_IMPLS", "pallas,xla").split(",")
    # The XLA path's 32-step scan stores the (K,B,H/2,W/2,512) coupling
    # residuals and OOMs at celeba64 b128 (measured: needs 28.5G of 15.75G
    # hbm); give it remat so the comparison is feasible-vs-feasible.
    xla_remat = os.environ.get("AB_XLA_REMAT", "1" if preset == "celeba64" else "0")
    prof = PRESETS[preset]
    b = int(os.environ.get("AB_BATCH", prof.train.batch_size))
    print(f"# train-step A/B: {preset} b={b} spc={spc} "
          f"on {jax.devices()[0].device_kind}", flush=True)
    pallas_remat = os.environ.get("AB_PALLAS_REMAT")  # unset = preset value
    for impl in impls:
        if impl == "xla":
            remat = bool(int(xla_remat))
        else:
            remat = None if pallas_remat is None else bool(int(pallas_remat))
        print(json.dumps(run(prof, impl, spc, remat=remat)), flush=True)


if __name__ == "__main__":
    main()
