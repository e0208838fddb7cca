#!/usr/bin/env python
"""LR stability-range probe: find a profile's lr blow-up threshold in ONE run.

The round-3 celebahq256 soak forensic found a pure lr-stability threshold
(grad_norm doubling per step at flat loss whenever the ramp crossed
~2e-4) by hand, across several diverged runs.  This tool productizes that
protocol: train with an exponential lr ramp (the classic lr-range test)
through the PRODUCTION optimizer chain (clipping, skip-nonfinite — the
`make_optimizer` schedule override) and report the lr at instability
onset, detected as sustained grad-norm growth over its rolling median or
a non-finite loss.

Usage:
  python scripts/lr_probe.py celebahq256 --synthetic textured \
      --lr0 1e-5 --lr1 3e-3 --steps 1500 --spc 5
  python scripts/lr_probe.py cifar10 --cpu --batch-size 16   # smoke

Prints one JSON line:
  {"onset_lr": ..., "onset_step": ..., "max_stable_lr": ...,
   "recommended_peak": onset/2, ...}  (onset_lr null = clean ramp)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("profile", help="profile JSON path or preset name")
    p.add_argument("--lr0", type=float, default=1e-5, help="ramp start lr")
    p.add_argument("--lr1", type=float, default=3e-3, help="ramp end lr")
    p.add_argument("--steps", type=int, default=1000, help="total ramp steps")
    p.add_argument("--spc", type=int, default=5, help="steps chained per dispatch")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic", nargs="?", const="textured", default="textured",
                   choices=["uniform", "smooth", "textured"],
                   help="synthetic data family (default textured: the "
                        "family the round-3 instabilities reproduced on)")
    p.add_argument("--data-root", default=None,
                   help="probe on a real dataset instead of synthetic")
    p.add_argument("--growth", type=float, default=8.0,
                   help="suspect when grad_norm > growth x rolling median")
    p.add_argument("--window", type=int, default=8,
                   help="rolling-median window (dispatches)")
    p.add_argument("--min-steps", type=int, default=100,
                   help="detection arms only after this many steps (early "
                        "training has legitimate grad-norm transients while "
                        "the DDI-initialized model reorganizes)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SEC.KEY=VAL",
                   help="override any profile field (same as train.py --set; "
                        "must match the checkpoint's config when probing "
                        "from one)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default=None,
                   help="probe FROM a trained checkpoint (training out-dir): "
                        "restores params+optimizer state and ramps lr from "
                        "there — the round-3 divergence forensic's protocol. "
                        "A fresh-init probe reads LOWER than a settled "
                        "model's true threshold.")
    p.add_argument("--best", action="store_true",
                   help="with --out-dir: restore the best-eval snapshot")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quiet", action="store_true")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from pytorch_glow_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_glow_tpu.config import PRESETS
    from pytorch_glow_tpu.data import pipeline
    from pytorch_glow_tpu.models import glow
    from pytorch_glow_tpu.train import step as steplib
    from pytorch_glow_tpu.train.optim import make_optimizer
    from pytorch_glow_tpu.utils.profiles import load_profile

    if os.path.isfile(args.profile):
        prof = load_profile(args.profile)
    elif args.profile in PRESETS:
        prof = PRESETS[args.profile]
    else:
        sys.exit(f"error: unknown profile/preset '{args.profile}'")
    over = {"seed": args.seed}
    if args.batch_size is not None:
        over["batch_size"] = args.batch_size
    prof = prof.replace(train=dataclasses.replace(prof.train, **over))
    if args.overrides:
        from pytorch_glow_tpu.utils.profiles import apply_overrides

        prof = apply_overrides(prof, args.overrides)
    if args.data_root:
        prof = prof.replace(data=dataclasses.replace(prof.data, root=args.data_root))
    else:
        name = {"uniform": "synthetic", "smooth": "synthetic_smooth",
                "textured": "synthetic_textured"}[args.synthetic]
        prof = prof.replace(data=dataclasses.replace(prof.data, name=name))

    cfg, t = prof.glow, prof.train
    lr0, lr1, total, spc = args.lr0, args.lr1, args.steps, args.spc

    start = 0
    restored = None
    if args.out_dir:
        from pytorch_glow_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(
            os.path.join(args.out_dir, prof.name, "checkpoints"),
            keep=t.keep_checkpoints,
        )
        # A throwaway template tx: the probe tx below has the identical
        # chain structure (only the schedule closure differs, which carries
        # no optimizer state), so the restored opt_state slots in.
        template = steplib.init_state(
            jax.random.key(t.seed),
            cfg,
            make_optimizer(prof.optim, t),
        )
        restored = (ckpt.restore_best(template) if args.best
                    else ckpt.restore(template))
        if restored is None:
            sys.exit(f"error: no checkpoint under {args.out_dir}/{prof.name}")
        start = int(restored["step"])
        print(f"[lr_probe] probing from step-{start} checkpoint "
              f"({'best' if args.best else 'latest'})", flush=True)

    # Under grad accumulation (optax.MultiSteps) the inner adam indexes its
    # schedule by OPTIMIZER steps (one per k micro-batches) while the train
    # state's `step` counts micro-batches — ramp in optimizer steps and map
    # the logged lr through s -> s//k so the reported onset lr is the lr the
    # update actually used, not a point k x further along the ramp.
    k = max(1, getattr(t, "grad_accum", 1))
    opt_start, opt_total = start // k, max(1, total // k)

    def sched(opt_step):
        # Exponential ramp lr0 -> lr1 over `total` steps from the probe start.
        frac = jnp.clip((opt_step - opt_start) / float(opt_total), 0.0, 1.0)
        return lr0 * (lr1 / lr0) ** frac

    def log_sched(micro_step):
        return sched(micro_step // k)

    tx = make_optimizer(prof.optim, t, schedule=sched)
    data = pipeline.make_dataset(prof.data, cfg, t)
    if restored is not None:
        state = restored
    else:
        state = steplib.init_state(jax.random.key(t.seed), cfg, tx)
        first = next(data)
        xf = glow.dequantize(
            jax.random.key(t.seed + 1),
            glow.preprocess(jnp.asarray(first["image"]), cfg), cfg,
        )
        state["params"] = glow.ddi_init(state["params"], xf, cfg)

    step_n = steplib.make_train_step_n(cfg, tx, spc, schedule=log_sched)

    def stack_batches():
        imgs, labels = [], []
        for _ in range(spc):
            b = next(data)
            imgs.append(b["image"])
            if cfg.y_condition:
                labels.append(b["label"])
        x = jnp.asarray(np.stack(imgs))
        y = (jax.nn.one_hot(jnp.asarray(np.stack(labels)), cfg.y_classes)
             if cfg.y_condition else None)
        return x, y

    history: list[float] = []  # grad_norm per clean dispatch
    suspects: list[tuple[int, float, float]] = []  # (step, lr, grad_norm)
    onset_step = None
    onset_lr = None
    last_stable_lr = lr0
    n_disp = max(1, total // spc)
    for d in range(n_disp):
        x, y = stack_batches()
        state, metrics = step_n(state, x, y)
        gn = float(jax.device_get(metrics["grad_norm"]))
        loss = float(jax.device_get(metrics["loss"]))
        lr = float(jax.device_get(metrics["lr"]))
        rel = (d + 1) * spc
        step = start + rel
        if not args.quiet and (d % 10 == 0 or d == n_disp - 1):
            print(f"[lr_probe] step {step} lr={lr:.3e} loss={loss:.4f} "
                  f"grad_norm={gn:.3f}", flush=True)
        if (not np.isfinite(loss)) or (not np.isfinite(gn)):
            # Non-finite is unambiguous; report the last SUSTAINED-growth
            # point when we saw one, else here.
            onset_step, onset_lr = (suspects[0][:2] if suspects else (step, lr))
            break
        med = float(np.median(history[-args.window:])) if history else gn
        armed = rel > args.min_steps and len(history) >= 3
        if armed and gn > args.growth * max(med, 1e-12):
            # Suspect.  The round-3 256x256 instability signature is
            # grad_norm MULTIPLYING dispatch over dispatch (~2x/step at
            # flat loss); a single spike during healthy training is not.
            suspects.append((step, lr, gn))
            monotone = all(
                b[2] > a[2] for a, b in zip(suspects[-3:], suspects[-2:])
            )
            if len(suspects) >= 3 and monotone and (
                suspects[-1][2] > 4.0 * suspects[-3][2]
            ):
                onset_step, onset_lr = suspects[-3][:2]
                break
        else:
            suspects.clear()
            last_stable_lr = lr
            history.append(gn)

    out = {
        "profile": prof.name,
        "data": prof.data.name,
        "batch_size": t.batch_size,
        "grad_accum": k,
        "ramp": [lr0, lr1],
        "steps": total,
        "start_step": start,
        "onset_step": onset_step,
        "onset_lr": onset_lr,
        "max_stable_lr": last_stable_lr,
        "recommended_peak": None if onset_lr is None else onset_lr / 2.0,
        "clean": onset_lr is None,
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
