#!/usr/bin/env python
"""Serving-artifact throughput: exported StableHLO vs the live model.

Exports the flagship sampler two ways — the portable XLA artifact
(default export) and the TPU-only fused-kernel artifact
(keep_kernels=True) — then measures samples/sec for each against the
live jitted model on the same chip.

Chained measurement: the deserialized `Exported.call` is jittable and
composable, so N serving calls are chained in one dispatch through a
lax.fori_loop over seeds (the same steady-state pattern as bench.py);
one-off dispatch latency is cancelled by two-N differencing.  Per-
dispatch wall time (what a single online request sees through this
machine's tunnel) is reported separately.

Usage: PYTHONPATH=. python scripts/bench_serve.py
Env: BENCH_PRESET (celeba64), BENCH_BATCH (64), BENCH_ITERS (10).
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
import time


def _rate(run, batch, iters):
    """two-N differencing: images/sec net of one-off dispatch latency."""
    run(1)  # warm/compile
    t1 = time.perf_counter()
    run(iters)
    t2 = time.perf_counter()
    run(2 * iters)
    t3 = time.perf_counter()
    net = (t3 - t2) - (t2 - t1)
    return batch * iters / net, (t2 - t1) / iters


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_glow_tpu import serve
    from pytorch_glow_tpu.config import PRESETS
    from pytorch_glow_tpu.models import glow

    preset = os.environ.get("BENCH_PRESET", "celeba64")
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    cfg = PRESETS[preset].glow
    params = glow.init_glow(jax.random.key(0), cfg)
    print(f"# {preset} b{batch} on {jax.default_backend()}", flush=True)

    results = {}

    def measure(name, call):
        # chain `k` serving calls in one dispatch; sync via device_get
        @jax.jit
        def chained(k, seed0):
            def body(i, acc):
                img = call(jnp.zeros((batch,), jnp.uint8), seed0 + i,
                           jnp.float32(0.7))
                return acc + img[0, 0, 0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def run(k):
            jax.device_get(chained(k, jnp.uint32(1)))

        rate, per_dispatch = _rate(run, batch, iters)
        results[name] = {"images_per_sec": round(rate, 1),
                         "per_call_ms": round(per_dispatch * 1e3, 1)}
        print(f"{name}: {rate:.0f} img/s steady, "
              f"{per_dispatch * 1e3:.0f} ms/call", flush=True)

    # live model (bf16 fused kernels as configured by the preset)
    def live_sample(n_like, seed, temperature):
        imgs = glow.sample(params, jax.random.key(seed), cfg,
                           n=n_like.shape[0], temperature=temperature)
        return glow.postprocess(imgs, cfg)

    measure("live", live_sample)

    with tempfile.TemporaryDirectory() as d:
        for name, keep in (("artifact-xla", False), ("artifact-fused", True)):
            out = os.path.join(d, name)
            serve.export_artifact(params, cfg, out, batch_size=batch,
                                  functions=("sample",), keep_kernels=keep)
            m = serve.load_artifact(out)
            measure(name, m.fn("sample"))

    xcfg = dataclasses.replace(cfg, flowstep_impl="xla")

    def live_xla(n_like, seed, temperature):
        imgs = glow.sample(params, jax.random.key(seed), xcfg,
                           n=n_like.shape[0], temperature=temperature)
        return glow.postprocess(imgs, cfg)

    measure("live-xla", live_xla)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
