#!/usr/bin/env python
"""Measure the train-loop-visible checkpoint stall at production scale.

Orbax 0.11's CheckpointManager saves asynchronously by default: save()
returns after the device→host fetch and serializes to disk in a background
thread.  On THIS box the D2H rides the axon tunnel, so the fetch is the
part that can steal step time — measure it, plus the background-write
barrier a following save would hit, plus the best-save path (which waits
for the disk write by design so best.json never points at an uncommitted
snapshot).

Prints one JSON object:
  save_return_s       time save() blocks the loop (D2H fetch + enqueue)
  drain_s             remaining background write after save() returns
  best_save_return_s  time maybe_save_best() blocks the loop — best saves
                      are ALSO async now (the best.json sidecar commits in
                      a background thread after orbax finalizes)
  best_save_total_s   full wall of the best save incl. the background disk
                      write + sidecar commit (maybe_save_best + wait)
  state_mb            bytes in the train state (params + opt + ema)
  stall_pct           save_return_s as % of checkpoint_gap's step time,
                      using --imgs-per-sec (the preset's measured rate)

Usage:
  python scripts/ckpt_stall_ab.py cifar10 --imgs-per-sec 3700
  python scripts/ckpt_stall_ab.py celebahq256 --imgs-per-sec 35.6 --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile", help="preset name or profile JSON path")
    ap.add_argument("--imgs-per-sec", type=float, default=None,
                    help="measured steady rate, for the stall-%% figure")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import argparse as _ap

    import train as train_cli
    from pytorch_glow_tpu.train import step as steplib
    from pytorch_glow_tpu.train.optim import make_optimizer
    from pytorch_glow_tpu.utils.checkpoint import CheckpointManager

    ns = _ap.Namespace(profile=args.profile, data_root=None, steps=None,
                       batch_size=None, out_dir=None, synthetic=None,
                       seed=None, quiet=True, overrides=[])
    prof = train_cli.resolve_profile(ns)
    t = prof.train
    tx = make_optimizer(prof.optim, t)
    state = steplib.init_state(jax.random.key(0), prof.glow, tx,
                               ema_decay=t.ema_decay)
    state = jax.block_until_ready(state)
    state_bytes = sum(
        a.size * a.dtype.itemsize for a in jax.tree.leaves(state)
        if hasattr(a, "size") and hasattr(a.dtype, "itemsize")
    )

    tmp = tempfile.mkdtemp(prefix="ckpt_stall_")
    mgr = CheckpointManager(os.path.join(tmp, "ck"), keep=2)
    rows = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        mgr.save(100 + i, state)
        t1 = time.perf_counter()
        mgr.wait()
        t2 = time.perf_counter()
        rows.append({"save_return_s": t1 - t0, "drain_s": t2 - t1})
    t0 = time.perf_counter()
    mgr.maybe_save_best(999, state, metric=1.0)
    best_return_s = time.perf_counter() - t0
    mgr.wait()
    best_total_s = time.perf_counter() - t0
    mgr.close()
    shutil.rmtree(tmp, ignore_errors=True)

    # Skip rep 0 (pays one-time orbax/type-registry setup) when possible.
    steady = rows[1:] or rows
    save_s = min(r["save_return_s"] for r in steady)
    out = {
        "profile": prof.name,
        "platform": jax.default_backend(),
        "state_mb": round(state_bytes / 1e6, 1),
        "save_return_s": round(save_s, 3),
        "drain_s": round(min(r["drain_s"] for r in steady), 3),
        "best_save_return_s": round(best_return_s, 3),
        "best_save_total_s": round(best_total_s, 3),
        "reps": rows,
    }
    if args.imgs_per_sec:
        gap_wall = t.checkpoint_gap * t.batch_size / args.imgs_per_sec
        out["checkpoint_gap_wall_s"] = round(gap_wall, 1)
        out["stall_pct"] = round(100 * save_s / gap_wall, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
