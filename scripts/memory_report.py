#!/usr/bin/env python
"""AOT HBM capacity report: compile (never execute) a profile's production
train step and serving sample fn, and print XLA's buffer-assignment memory
analysis — peak HBM, argument/temp/output bytes, and the largest batch
knob's headroom against a chip's HBM.

Extends the upstream lineage's tooling (it sizes memory by trial OOM;
SURVEY.md §5 observability): here capacity planning is one command and
needs no training run — `.lower().compile()` is minutes cheaper than a
step, and with the persistent compile cache it is seconds.  The one real
cost is a single host-CPU materialization of the param+optimizer tree
(init_state's LU init is host numpy and cannot be eval_shape'd); the
target device is never allocated on.

Usage:
  python scripts/memory_report.py cifar10                 # preset, this backend
  python scripts/memory_report.py celebahq256 --batch-size 16
  python scripts/memory_report.py profiles/x.json --cpu --hbm-gb 16

Output: one JSON object on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("profile", help="profile JSON path or preset name")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override Train.batch_size (capacity sweeps)")
    p.add_argument("--sample-batch", type=int, default=None,
                   help="serving sample batch (default: train batch)")
    p.add_argument("--hbm-gb", type=float, default=16.0,
                   help="per-chip HBM to report headroom against "
                        "(v5e=16, v5p=95, v4=32)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SEC.KEY=VAL", help="profile overrides")
    p.add_argument("--cpu", action="store_true",
                   help="analyze on the host CPU backend (layout/peak "
                        "numbers differ from TPU; for offline smoke only)")
    return p.parse_args(argv)


def _stats(compiled) -> dict:
    ma = compiled.memory_analysis()
    if ma is None:
        return {"unavailable": True}
    return {
        "peak_bytes": int(ma.peak_memory_in_bytes),
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "code_bytes": int(ma.generated_code_size_in_bytes),
    }


def _abstract(tree):
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        tree,
        is_leaf=lambda x: hasattr(x, "shape"),
    )


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import train as train_cli
    from pytorch_glow_tpu.models import glow
    from pytorch_glow_tpu.train import step as steplib
    from pytorch_glow_tpu.train.optim import make_optimizer, make_schedule
    from pytorch_glow_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ns = argparse.Namespace(
        profile=args.profile, data_root=None, steps=None,
        batch_size=args.batch_size, out_dir=None, synthetic=None, seed=None,
        quiet=True, overrides=args.overrides,
    )
    prof = train_cli.resolve_profile(ns)
    g, t = prof.glow, prof.train
    tx = make_optimizer(prof.optim, t)

    # init_state runs host-side numpy (the LU init), so it cannot be
    # eval_shape'd; materialize ONCE ON THE HOST CPU (one-time host memory
    # ~= one param+opt tree — real at celebahq256 scale on a 1-core box),
    # then keep only abstract shapes — the compiles below never allocate on
    # the target device, so the report itself stays allocation-free.
    with jax.default_device(jax.devices("cpu")[0]):
        state_abs = _abstract(steplib.init_state(jax.random.key(0), g, tx,
                                                 ema_decay=t.ema_decay))
    h, w, c = g.image_shape
    spc = max(1, t.steps_per_call)
    if spc > 1:
        batch_abs = jax.ShapeDtypeStruct((spc, t.batch_size, h, w, c), jnp.uint8)
        step_fn = steplib.make_train_step_n(
            g, tx, spc, ema_decay=t.ema_decay, schedule=make_schedule(prof.optim),
            augment_flip=t.augment_flip,
        )
    else:
        batch_abs = jax.ShapeDtypeStruct((t.batch_size, h, w, c), jnp.uint8)
        step_fn = steplib.make_train_step(
            g, tx, ema_decay=t.ema_decay, schedule=make_schedule(prof.optim),
            augment_flip=t.augment_flip,
        )
    extra = ()
    if g.y_condition:
        yshape = (spc, t.batch_size, g.y_classes) if spc > 1 else (
            t.batch_size, g.y_classes)
        extra = (jax.ShapeDtypeStruct(yshape, jnp.float32),)
    train_stats = _stats(step_fn.lower(state_abs, batch_abs, *extra).compile())

    sample_n = args.sample_batch or t.batch_size
    y_abs = (
        jax.ShapeDtypeStruct((sample_n, g.y_classes), jnp.float32)
        if g.y_condition else None
    )
    sample_fn = jax.jit(
        lambda p, r, y=None: glow.sample(p, r, g, sample_n, 0.7, y),
    )
    key_abs = jax.eval_shape(lambda: jax.random.key(0))
    sample_args = (state_abs["params"], key_abs)
    if y_abs is not None:
        sample_args += (y_abs,)
    sample_stats = _stats(sample_fn.lower(*sample_args).compile())

    param_bytes = sum(
        int(jnp.dtype(l.dtype).itemsize) * int(jnp.prod(jnp.asarray(l.shape)))
        for l in jax.tree.leaves(state_abs["params"])
    )
    opt_bytes = sum(
        int(jnp.dtype(l.dtype).itemsize) * int(jnp.prod(jnp.asarray(l.shape)))
        for l in jax.tree.leaves(state_abs["opt_state"])
    )
    hbm = int(args.hbm_gb * 2**30)
    peak = train_stats.get("peak_bytes", 0)
    report = {
        "profile": prof.name,
        "platform": jax.devices()[0].platform,
        "image_shape": list(g.image_shape),
        "train_batch": t.batch_size,
        "steps_per_call": spc,
        "param_bytes": param_bytes,
        "opt_state_bytes": opt_bytes,
        "train": train_stats,
        "sample": {"batch": sample_n, **sample_stats},
        "hbm_gb": args.hbm_gb,
        "train_fits": bool(peak <= hbm) if peak else None,
        "train_hbm_headroom_gb": round((hbm - peak) / 2**30, 3) if peak else None,
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
