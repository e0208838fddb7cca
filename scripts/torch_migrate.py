#!/usr/bin/env python
"""Migrate snapshots between the reference lineage (PyTorch) and this framework.

A user of the reference (upstream:corenel/pytorch-glow) switches frameworks
without retraining — and can export back for cross-checking:

  # torch snapshot -> Orbax checkpoint that train.py / infer.py resume:
  python scripts/torch_migrate.py import glow.pth celeba64 --out-dir results
  python infer.py sample celeba64 --out-dir results -o samples.png

  # our trained checkpoint -> lineage-style .pth (state_dict under "graph"):
  python scripts/torch_migrate.py export celeba64 --out-dir results -o glow.pth [--best|--ema]

The key naming/layout contract lives in pytorch_glow_tpu/utils/torch_migrate.py
(documented [M]-confidence recall of the lineage; SURVEY.md §0).  For forks
whose attribute names deviate, pass --rename OLD=NEW prefix rewrites.

Imported snapshots start with a fresh optimizer state (torch Adam moments do
not map onto optax trees losslessly); pass --keep-step to keep the snapshot's
global step (restarting warmup/decay mid-schedule), default is step 0.
Migration is a host-side job: it runs on CPU regardless of TPU availability.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("op", choices=["import", "export"])
    p.add_argument("args", nargs="+",
                   help="import: <snapshot.pth> <profile>;  export: <profile>")
    p.add_argument("-o", "--output", default=None, help="export: output .pth path")
    p.add_argument("--out-dir", default=None, help="override profile out_dir")
    p.add_argument("--rename", action="append", default=[], metavar="OLD=NEW",
                   help="import: key-prefix rewrite (repeatable)")
    p.add_argument("--keep-step", action="store_true",
                   help="import: keep the snapshot's global step instead of 0")
    p.add_argument("--best", action="store_true", help="export: best-eval snapshot")
    p.add_argument("--ema", action="store_true", help="export: EMA parameters")
    return p.parse_args(argv)


def _load_profile(name: str, out_dir: str | None):
    from pytorch_glow_tpu.utils.profiles import load_profile

    prof = load_profile(name)
    if out_dir:
        prof = prof.replace(out_dir=out_dir)
    return prof


def _check_structure(imported, reference) -> None:
    """Imported params must agree with init_glow's tree (same config)."""
    got = jax.tree.structure(imported)
    want = jax.tree.structure(reference)
    if got != want:
        raise SystemExit(f"imported tree != config tree:\n  got  {got}\n  want {want}")
    mismatched = [
        (path, a.shape, b.shape)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(imported),
            jax.tree_util.tree_leaves_with_path(reference),
        )
        if a.shape != b.shape
    ]
    if mismatched:
        lines = "\n".join(
            f"  {jax.tree_util.keystr(p)}: snapshot {a} vs config {b}"
            for p, a, b in mismatched[:10]
        )
        raise SystemExit(f"shape mismatches (snapshot vs config):\n{lines}")


def do_import(args) -> None:
    from pytorch_glow_tpu.models import glow
    from pytorch_glow_tpu.train import step as steplib
    from pytorch_glow_tpu.train.optim import make_optimizer
    from pytorch_glow_tpu.utils import torch_migrate as tm
    from pytorch_glow_tpu.utils.checkpoint import CheckpointManager

    if len(args.args) != 2:
        raise SystemExit("usage: torch_migrate.py import <snapshot.pth> <profile>")
    snap_path, profile_name = args.args
    prof = _load_profile(profile_name, args.out_dir)
    g, t = prof.glow, prof.train

    sd, snap_step = tm.load_torch_snapshot(snap_path)
    rename = dict(r.split("=", 1) for r in args.rename)
    params = tm.import_state_dict(sd, g, rename=rename or None)
    _check_structure(params, glow.init_glow(jax.random.key(0), g))

    tx = make_optimizer(prof.optim, t)
    state = steplib.init_state(jax.random.key(t.seed), g, tx, ema_decay=t.ema_decay)
    state["params"] = jax.tree.map(jnp.asarray, params)
    if "ema" in state:
        trainable, _ = steplib.partition(state["params"])
        state["ema"] = jax.tree.map(jnp.copy, trainable)
    step = snap_step if args.keep_step else 0
    state["step"] = jnp.asarray(step, jnp.int32)

    out_dir = os.path.join(prof.out_dir, prof.name)
    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"), keep=t.keep_checkpoints)
    latest = ckpt.latest_step()
    if latest is not None:
        print(
            f"[import] warning: {out_dir}/checkpoints already has step "
            f"{latest}; build() restores the HIGHEST step — the import lands "
            f"at step {step}", file=sys.stderr,
        )
    ckpt.save(step, state, wait=True)
    n_params = sum(p.size for p in jax.tree.leaves(state["params"]))
    print(
        f"imported {snap_path} ({len(sd)} tensors, snapshot step {snap_step}) "
        f"-> {out_dir}/checkpoints/{step} ({n_params / 1e6:.2f}M params; "
        f"optimizer state fresh)"
    )


def do_export(args) -> None:
    from pytorch_glow_tpu.train.builder import build
    from pytorch_glow_tpu.utils import torch_migrate as tm

    if len(args.args) != 1 or not args.output:
        raise SystemExit("usage: torch_migrate.py export <profile> -o out.pth")
    prof = _load_profile(args.args[0], args.out_dir)
    built = build(prof, training=False, with_data=False,
                  restore="best" if args.best else "latest")
    if not built.resumed:
        print("[export] warning: no checkpoint found — exporting the fresh init", file=sys.stderr)
    params = built.state["params"]
    if args.ema:
        from pytorch_glow_tpu.train.step import ema_params

        if "ema" in built.state:
            params = ema_params(built.state)
        else:
            print("[export] warning: --ema requested but snapshot has no EMA state", file=sys.stderr)
    step = int(built.state["step"])
    tm.save_torch_snapshot(args.output, params, prof.glow, step=step)
    import torch

    n = len(torch.load(args.output, map_location="cpu", weights_only=False)["graph"])
    print(f"exported step-{step} params -> {args.output} ({n} tensors, lineage naming)")


def main(argv=None):
    args = parse_args(argv)
    if args.op == "import":
        do_import(args)
    else:
        do_export(args)


if __name__ == "__main__":
    main()
