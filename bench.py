#!/usr/bin/env python
"""Benchmark: images/sec/chip for forward NLL + reverse sampling at 64x64.

This is the driver metric (BASELINE.json): one "image" = one forward
bits/dim evaluation plus one temperature sample through the reverse flow,
on the CelebA-64 flagship config (K=32, L=4, width 512, bf16 coupling).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline protocol (BASELINE.md): the upstream repo publishes no numbers and
no reference GPU exists offline, so vs_baseline is measured against the
independent torch-CPU parity implementation (tests/torch_ref.py) on this
host, cached in bench_baseline_torch.json (regenerate with
`python scripts/bench_baseline_torch.py`).

Env knobs: BENCH_BATCH (default 64), BENCH_ITERS (default 10),
BENCH_INVCONV (xla|pallas; default pallas — the fused kernel measured 2.35x
faster than the XLA path at equal f32 HIGHEST precision), BENCH_PRESET
(default celeba64).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pytorch_glow_tpu.config import PRESETS
    from pytorch_glow_tpu.models import glow

    preset = os.environ.get("BENCH_PRESET", "celeba64")
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    invconv = os.environ.get("BENCH_INVCONV", "pallas")

    cfg = dataclasses.replace(PRESETS[preset].glow, invconv_impl=invconv)
    h, w, c = cfg.image_shape

    t_setup = time.time()
    params = glow.init_glow(jax.random.key(0), cfg)
    x_u8 = jax.random.randint(jax.random.key(1), (batch, h, w, c), 0, 256, jnp.uint8)

    @jax.jit
    def ddi(params, x_u8, rng):
        x = glow.dequantize(rng, glow.preprocess(x_u8, cfg), cfg)
        return glow.ddi_init(params, x, cfg)

    params = ddi(params, x_u8, jax.random.key(2))

    @jax.jit
    def fwd_nll(params, x_u8, rng):
        x = glow.preprocess(x_u8, cfg)
        out = glow.log_prob(params, x, cfg, rng=rng)
        return jnp.mean(out["nll"])

    @jax.jit
    def sample(params, rng):
        imgs = glow.sample(params, rng, cfg, n=batch, temperature=0.7)
        return glow.postprocess(imgs, cfg)

    # Warmup / compile.
    rng = jax.random.key(3)
    nll = fwd_nll(params, x_u8, rng)
    nll.block_until_ready()
    imgs = sample(params, rng)
    imgs.block_until_ready()
    setup_s = time.time() - t_setup

    # Steady state: alternate fwd and sampling (the driver metric couples them).
    t_fwd = 0.0
    t_smp = 0.0
    for i in range(iters):
        r = jax.random.fold_in(rng, i)
        t0 = time.perf_counter()
        fwd_nll(params, x_u8, r).block_until_ready()
        t_fwd += time.perf_counter() - t0
        t0 = time.perf_counter()
        sample(params, r).block_until_ready()
        t_smp += time.perf_counter() - t0

    pair_time = (t_fwd + t_smp) / iters
    value = batch / pair_time

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline_torch.json")
    vs_baseline = None
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = value / float(base["value"])

    result = {
        "metric": (
            f"images/sec/chip (fwd NLL + reverse sampling) at {h}x{w}, "
            f"{preset} K={cfg.K} L={cfg.L} w={cfg.hidden_channels} "
            f"batch={batch} invconv={invconv} on {jax.devices()[0].device_kind}"
        ),
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline is not None else None,
        "detail": {
            "fwd_images_per_sec": round(batch * iters / t_fwd, 2),
            "sample_images_per_sec": round(batch * iters / t_smp, 2),
            "nll_bits_per_dim_fresh_init": round(float(nll), 3),
            "setup_compile_s": round(setup_s, 1),
            "baseline": "torch-CPU parity impl (see BASELINE.md; upstream publishes no numbers)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
