#!/usr/bin/env python
"""TWO-PROCESS Grain sharding smoke on CPU: drives an ON-DISK source through
`grain.ShardOptions` across a real `jax.distributed` process pair.

Verifies what the single-process suite cannot (round-2 verdict missing #4):

1. **Disjoint per-process record reads** — each CIFAR-format record's id is
   encoded in its first pixel byte; over one epoch the two processes' id
   sets must partition the dataset exactly.
2. **Consistent assembled global batch** — a short end-to-end train run
   through the Builder (Grain loader -> per-process rows ->
   jax.make_array_from_process_local_data) must report the identical loss
   on both processes.
3. **Opaque-state resume per process** — each process snapshots its
   iterator's grain state mid-stream and a fresh iterator restored from it
   must produce the identical next batch.

Usage:
  python scripts/multihost_grain_smoke.py       # parent: spawn + check
  (child mode is internal: --proc N --port P)
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import socket
import subprocess
import sys
import tempfile

import numpy as np

N_PER_FILE = 16  # x5 train files = 80 records, ids 0..79 in pixel[0,0,0]


def write_id_encoded_cifar(root: str) -> None:
    """CIFAR-10-format pickles where data[i, 0] (= image[0,0,R]) is the
    GLOBAL record index — recoverable from any decoded batch."""
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    for f_idx, name in enumerate(
        [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]
    ):
        data = rng.integers(0, 256, (N_PER_FILE, 3 * 32 * 32), dtype=np.uint8)
        base = 0 if name == "test_batch" else f_idx * N_PER_FILE
        data[:, 0] = base + np.arange(N_PER_FILE)
        entry = {b"data": data,
                 b"labels": rng.integers(0, 10, (N_PER_FILE,)).tolist()}
        with open(os.path.join(root, name), "wb") as f:
            pickle.dump(entry, f)


def child(proc: int, nprocs: int, port: int, root: str, out_dir: str) -> None:
    from _smoke_common import install_child_watchdog

    install_child_watchdog()  # die with the parent; bounded wall-clock
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc,
    )
    assert jax.process_count() == nprocs, jax.process_count()

    from pytorch_glow_tpu.config import (
        DataConfig, GlowConfig, OptimConfig, Profile, TrainConfig,
    )
    from pytorch_glow_tpu.data.pipeline import make_dataset
    from pytorch_glow_tpu.train import builder as builderlib
    from pytorch_glow_tpu.train import trainer as trainerlib

    data_cfg = DataConfig(name="cifar10", root=root, loader="grain")
    glow_cfg = GlowConfig(image_shape=(32, 32, 3), hidden_channels=16, K=2, L=2)
    train_cfg = TrainConfig(batch_size=16, seed=0)

    # -- 1. disjoint reads over one epoch (80 records / 2 procs / 8 rows) --
    it = make_dataset(data_cfg, glow_cfg, train_cfg)
    ids: list[int] = []
    n_batches = (5 * N_PER_FILE) // nprocs // (train_cfg.batch_size // nprocs)
    for _ in range(n_batches):
        b = next(it)
        assert b["image"].shape == (train_cfg.batch_size // nprocs, 32, 32, 3), (
            b["image"].shape
        )
        ids.extend(int(v) for v in b["image"][:, 0, 0, 0])

    # -- 3. opaque-state resume across a fresh loader ----------------------
    state = it.get_state()
    want = next(it)["image"]
    it2 = make_dataset(data_cfg, glow_cfg, train_cfg)
    it2.set_state(state)
    resume_ok = bool(np.array_equal(next(it2)["image"], want))

    # -- 2. end-to-end: Grain rows -> global batch -> identical loss -------
    p = Profile(
        name="mh-grain",
        glow=glow_cfg,
        optim=OptimConfig(lr=1e-3, warmup_steps=10),
        train=TrainConfig(batch_size=16, num_steps=4, scalar_log_gap=2,
                          plot_gap=0, checkpoint_gap=0, num_sample_images=2,
                          seed=0),
        data=data_cfg,
        out_dir=out_dir,
    )
    built = builderlib.build(p)
    assert built.extras["data_resume"] is None  # fresh run
    result = trainerlib.train(built, quiet=True)
    built.ckpt.wait()

    print(json.dumps({
        "proc": proc,
        "ids": ids,
        "resume_ok": resume_ok,
        "loss": round(float(result["loss"]), 6),
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--root", default=None)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    if args.proc is not None:
        child(args.proc, args.nprocs, args.port, args.root, args.out_dir)
        return 0

    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    work = tempfile.mkdtemp(prefix="mh_grain_")
    root = os.path.join(work, "cifar")
    write_id_encoded_cifar(root)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i),
             "--nprocs", str(args.nprocs), "--port", str(port),
             "--root", root, "--out-dir", os.path.join(work, "out")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(args.nprocs)
    ]
    from _smoke_common import communicate_all

    outs = []
    ok = True
    for i, (rc, stdout, stderr) in enumerate(communicate_all(procs, 900)):
        if rc != 0:
            ok = False
            print(f"[proc {i}] rc={rc}\n{stderr[-3000:]}", file=sys.stderr)
            continue
        line = [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))
    if not ok:
        return 1
    id_sets = [set(o["ids"]) for o in outs]
    assert id_sets[0].isdisjoint(id_sets[1]), (
        f"processes read overlapping records: {sorted(id_sets[0] & id_sets[1])}"
    )
    union = id_sets[0] | id_sets[1]
    assert union == set(range(5 * N_PER_FILE)), (
        f"epoch did not cover the dataset: missing {set(range(80)) - union}"
    )
    assert all(o["resume_ok"] for o in outs), outs
    losses = {o["loss"] for o in outs}
    assert len(losses) == 1, f"processes disagree on loss: {outs}"
    print(json.dumps({
        "multihost_grain_smoke": "OK",
        "per_proc_records": [len(s) for s in id_sets],
        "loss": outs[0]["loss"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
