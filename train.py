#!/usr/bin/env python
"""Train a TPU-native Glow model.

Reference CLI surface (upstream:train.py; SURVEY.md §2.1 #1): a profile
(JSON path or preset name) plus dataset/dir overrides.

Usage:
  python train.py cifar10 --data-root /data/cifar10
  python train.py profiles/celeba64.json --steps 100000 --out-dir results
  python train.py tiny-cifar10 --synthetic --steps 500
  python train.py celebahq256 --set data.name=image_folder --data-root /data/lsun
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("profile", help="profile JSON path or preset name "
                                   "(tiny-cifar10|cifar10|celeba64|imagenet64-cond|celebahq256)")
    p.add_argument("--data-root", default=None, help="dataset root directory")
    p.add_argument("--steps", type=int, default=None, help="override Train.num_steps")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--out-dir", default=None, help="override output directory")
    p.add_argument("--synthetic", nargs="?", const="uniform", default=None,
                   choices=["uniform", "smooth", "textured", "attr"],
                   help="force synthetic data (optionally pick the family: "
                        "uniform noise, smooth gradients, multi-scale "
                        "textures + shapes, or measurable binary attributes)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SEC.KEY=VAL",
                   help="override any profile field, e.g. --set optim.lr=2e-4 "
                        "--set data.name=image_folder (repeatable; value "
                        "parsed as JSON when possible)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--retries", type=int, default=0,
                   help="auto-resume from the latest snapshot after a crash, "
                        "up to N times (elastic-recovery; reference requires "
                        "a manual relaunch)")
    p.add_argument("--cpu", action="store_true",
                   help="run on the host CPU (this box's TPU boot hook "
                        "force-selects the tunneled chip over JAX_PLATFORMS)")
    return p.parse_args(argv)


def resolve_profile(args):
    from pytorch_glow_tpu.config import PRESETS
    from pytorch_glow_tpu.utils.profiles import load_profile

    if os.path.isfile(args.profile):
        prof = load_profile(args.profile)
    elif args.profile in PRESETS:
        prof = PRESETS[args.profile]
    else:
        sys.exit(f"error: profile '{args.profile}' is neither a file nor a preset "
                 f"(presets: {', '.join(PRESETS)})")

    train_over = {}
    if args.steps is not None:
        train_over["num_steps"] = args.steps
    if args.batch_size is not None:
        train_over["batch_size"] = args.batch_size
    if args.seed is not None:
        train_over["seed"] = args.seed
    if train_over:
        prof = prof.replace(train=dataclasses.replace(prof.train, **train_over))
    data_over = {}
    if args.data_root is not None:
        data_over["root"] = args.data_root
    if args.synthetic:
        data_over["name"] = {
            "uniform": "synthetic",
            "smooth": "synthetic_smooth",
            "textured": "synthetic_textured",
            "attr": "synthetic_attr",
        }[args.synthetic]
    if data_over:
        prof = prof.replace(data=dataclasses.replace(prof.data, **data_over))
    if args.out_dir is not None:
        prof = prof.replace(out_dir=args.out_dir)
    if getattr(args, "overrides", None):
        from pytorch_glow_tpu.utils.profiles import apply_overrides

        prof = apply_overrides(prof, args.overrides)
    return prof


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from pytorch_glow_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    prof = resolve_profile(args)
    from pytorch_glow_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()  # no-op outside pod-slice / cluster environments
    from pytorch_glow_tpu.train.builder import build
    from pytorch_glow_tpu.train.trainer import train

    # The step-liveness watchdog (train.step_timeout_s) recovers wedged
    # device dispatches by RE-EXEC (a fresh process gets a fresh client);
    # --retries is its restart budget too.  setdefault: a re-exec'd run
    # keeps its decremented budget instead of resetting it.
    os.environ.setdefault("GLOW_WEDGE_RESTART_BUDGET", str(args.retries))

    attempts = args.retries + 1
    last_exc = None
    for attempt in range(attempts):
        built = build(prof)
        if built.resumed:
            print(f"[train] resumed from step {built.start_step}")
        try:
            result = train(built, quiet=args.quiet)
            print(json.dumps(result))
            return result
        except KeyboardInterrupt:
            raise
        except Exception as e:  # crash -> rebuild from latest snapshot
            last_exc = e
            if attempt + 1 < attempts:
                print(f"[train] attempt {attempt + 1} failed "
                      f"({type(e).__name__}: {e}); resuming from last snapshot",
                      file=sys.stderr)
    raise last_exc


if __name__ == "__main__":
    main()
