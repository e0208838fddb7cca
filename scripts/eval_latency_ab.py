#!/usr/bin/env python
"""Within-process A/B: eval-boundary wall time, batched one-dispatch eval
(`make_eval_step_n`, the production path) vs the pre-round-3 per-batch loop.

The quantity of interest is the WHOLE boundary's wall time INCLUDING
dispatch/sync latency — behind the tunneled TPU each dispatch pays
20-200 ms of pure latency, which is exactly what batching the boundary
into one `fori_loop` dispatch eliminates — so unlike bench_train.py this
does NOT difference the latency away: it times R full boundaries per arm
(after a compile warm-up) and reports the median.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_latency_ab.py
Env: AB_PRESET (cifar10), AB_EVAL_BATCHES (8), AB_REPS (7)
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp

from pytorch_glow_tpu.config import PRESETS
from pytorch_glow_tpu.models import glow
from pytorch_glow_tpu.train import step as steplib


def main() -> None:
    preset = os.environ.get("AB_PRESET", "cifar10")
    n_batches = int(os.environ.get("AB_EVAL_BATCHES", "8"))
    reps = int(os.environ.get("AB_REPS", "7"))
    prof = PRESETS[preset]
    # The eval/serve path runs the fused kernels (builder.py serve config).
    cfg = dataclasses.replace(prof.glow, flowstep_impl="pallas")
    b = prof.train.batch_size
    h, w, c = cfg.image_shape
    params = glow.init_glow(jax.random.key(0), cfg)
    batches = jax.random.randint(
        jax.random.key(1), (n_batches, b, h, w, c), 0, 256, jnp.uint8
    )
    batches = jax.device_put(batches)
    print(f"# eval-boundary A/B: {preset} b={b} x {n_batches} batches "
          f"on {jax.devices()[0].device_kind}", flush=True)

    eval_1 = steplib.make_eval_step(cfg)
    eval_n = steplib.make_eval_step_n(cfg)

    def boundary_loop():
        """Pre-round-3 trainer: one dispatch + host transfer per batch."""
        total = 0.0
        for i in range(n_batches):
            total += float(eval_1(params, batches[i])["nll"])
        return total / n_batches

    def boundary_batched():
        """Production: the whole boundary in ONE jitted dispatch."""
        return float(jax.device_get(eval_n(params, batches)["nll"]))

    results = {}
    for name, fn in [("per_batch_loop", boundary_loop),
                     ("one_dispatch", boundary_batched)]:
        nll0 = fn()  # compile warm-up
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            nll = fn()
            walls.append(time.perf_counter() - t0)
        results[name] = {
            "median_boundary_s": round(statistics.median(walls), 4),
            "band_s": [round(min(walls), 4), round(max(walls), 4)],
            "nll": round(nll, 5),
        }
        print(json.dumps({"arm": name, **results[name]}), flush=True)

    speedup = (results["per_batch_loop"]["median_boundary_s"]
               / results["one_dispatch"]["median_boundary_s"])
    agree = abs(results["per_batch_loop"]["nll"]
                - results["one_dispatch"]["nll"]) < 1e-3
    print(json.dumps({"boundary_speedup": round(speedup, 2),
                      "nll_agrees": bool(agree)}), flush=True)


if __name__ == "__main__":
    main()
