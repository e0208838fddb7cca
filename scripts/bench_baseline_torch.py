#!/usr/bin/env python
"""Measure the torch-CPU parity implementation's images/sec for the bench
baseline (see bench.py and BASELINE.md: the upstream repo publishes no
performance numbers, and no reference GPU exists in this offline
environment, so the reproducible baseline on this host is the independent
torch re-derivation in tests/torch_ref.py running the same math).

Writes bench_baseline_torch.json at the repo root.

Env knobs: BASE_BATCH (default 4), BASE_ITERS (default 2),
BASE_PRESET (default celeba64).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    import torch_ref
    from pytorch_glow_tpu.config import PRESETS
    from pytorch_glow_tpu.models import glow

    preset = os.environ.get("BASE_PRESET", "celeba64")
    batch = int(os.environ.get("BASE_BATCH", "4"))
    iters = int(os.environ.get("BASE_ITERS", "2"))

    cfg = PRESETS[preset].glow
    h, w, c = cfg.image_shape
    torch.manual_seed(0)

    params = glow.init_glow(jax.random.key(0), cfg)
    # Move the param pytree to host numpy once (torch_ref slices it lazily).
    params = jax.tree.map(lambda a: np.asarray(a), params)
    x = torch.rand(batch, c, h, w)

    # Forward NLL.
    t0 = time.perf_counter()
    for _ in range(iters):
        with torch.no_grad():
            _, _, nll = torch_ref.log_prob(params, cfg, x)
    t_fwd = (time.perf_counter() - t0) / iters

    # Reverse sampling from prior means + zero splits (same op count as
    # temperature sampling; RNG cost is negligible either way).
    hf, wf, cf = cfg.final_latent_shape
    z = 0.7 * torch.randn(batch, cf, hf, wf)
    shapes = cfg.latent_shapes()
    z_splits = [
        torch.randn(batch, shapes[i][2] // 2, shapes[i][0], shapes[i][1])
        for i in range(cfg.L - 1)
    ]
    t0 = time.perf_counter()
    for _ in range(iters):
        with torch.no_grad():
            torch_ref.decode(params, cfg, z, z_splits)
    t_smp = (time.perf_counter() - t0) / iters

    value = batch / (t_fwd + t_smp)
    result = {
        "metric": f"torch-CPU parity impl images/sec (fwd NLL + reverse) {preset} batch={batch}",
        "value": round(value, 4),
        "unit": "images/sec",
        "detail": {
            "fwd_images_per_sec": round(batch / t_fwd, 4),
            "sample_images_per_sec": round(batch / t_smp, 4),
            "threads": torch.get_num_threads(),
        },
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "bench_baseline_torch.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
