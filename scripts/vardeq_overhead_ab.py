#!/usr/bin/env python
"""Within-process A/B: TRAIN-step throughput cost of variational
dequantization (models/vardeq.py) vs uniform, at paper scale.

The vardeq flow (K_dq additive couplings over a conv context of x) was
sized to be <1% of model FLOPs; this measures the real wall-clock cost on
hardware — same process, same methodology as scripts/bench_train.py
(two-N differencing, chained steps_per_call dispatches).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/vardeq_overhead_ab.py
Env: AB_PRESET (cifar10), AB_SPC (5), AB_BATCH (preset batch).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax

from pytorch_glow_tpu.config import PRESETS

import bench_train  # scripts/ sibling


def main() -> None:
    preset = os.environ.get("AB_PRESET", "cifar10")
    spc = int(os.environ.get("AB_SPC", "5"))
    prof = PRESETS[preset]
    b = int(os.environ.get("AB_BATCH", prof.train.batch_size))
    print(f"# vardeq-overhead A/B: {preset} b={b} spc={spc} "
          f"on {jax.devices()[0].device_kind}", flush=True)
    out = {}
    for dequant in ("uniform", "variational"):
        p = prof.replace(glow=dataclasses.replace(prof.glow, dequant=dequant))
        r = bench_train.run(p, p.glow.flowstep_impl, spc)
        r["dequant"] = dequant
        out[dequant] = r
        print(json.dumps(r), flush=True)
    u, v = (out[k]["train_images_per_sec"] for k in ("uniform", "variational"))
    print(json.dumps({"overhead_pct": round(100.0 * (u - v) / u, 2)}), flush=True)


if __name__ == "__main__":
    main()
