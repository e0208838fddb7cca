#!/usr/bin/env python
"""TWO-PROCESS TFRecord sharding smoke on CPU: the pure-Python tfds reader
(data/tfrecord.py) under a real `jax.distributed` process pair — BOTH
loaders: the indexed reader (loader="native") and the Grain production
route (loader="auto" -> grain_pipeline._TFRecordSource + grain.ShardOptions).

Mirrors scripts/multihost_grain_smoke.py for the TFRecord path:

1. **Disjoint per-process record reads** (each loader) — each record's PNG
   image encodes its global index in pixel[0,0,R]; over one epoch the two
   processes' id sets must partition the dataset exactly.
2. **Consistent assembled global batch** — a short Builder train run must
   report the identical loss on both processes.
3. **State resume per process** (each loader) — a fresh iterator restored
   from `get_state()` must produce the identical next batch (the indexed
   path's integer state; grain's opaque bytes).

TensorFlow is used ONLY by the parent to write real TFRecord fixtures; the
children consume them through the TF-free production reader.

Usage:
  python scripts/multihost_tfrecord_smoke.py     # parent: spawn + check
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

N_TRAIN = 80
SIZE = 16


def write_id_encoded_tfds(root: str) -> None:
    """tfds-style shards whose PNG images carry the global record index in
    pixel [0,0,R] (PNG is lossless, so ids survive decode)."""
    import tensorflow as tf

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    per = N_TRAIN // 2
    k = 0
    for s in range(2):
        name = f"cifar10-train.tfrecord-{s:05d}-of-00002"
        with tf.io.TFRecordWriter(os.path.join(root, name)) as w:
            for _ in range(per):
                img = rng.integers(0, 256, (SIZE, SIZE, 3), np.uint8)
                img[0, 0, 0] = k
                ex = tf.train.Example(features=tf.train.Features(feature={
                    "image": tf.train.Feature(bytes_list=tf.train.BytesList(
                        value=[tf.io.encode_png(img).numpy()])),
                    "label": tf.train.Feature(int64_list=tf.train.Int64List(
                        value=[k % 10])),
                }))
                w.write(ex.SerializeToString())
                k += 1


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

    glow_cfg = GlowConfig(image_shape=(SIZE, SIZE, 3), hidden_channels=16,
                          K=2, L=2)
    train_cfg = TrainConfig(batch_size=16, seed=0)

    def scan_epoch(loader: str):
        """-- 1. disjoint reads over one epoch (80 records / 2 procs /
        8 rows) and -- 3. state resume across a fresh reader, for one
        loader route."""
        cfg = DataConfig(name="cifar10", root=root, image_size=SIZE,
                         loader=loader)
        it = make_dataset(cfg, glow_cfg, train_cfg)
        ids: list[int] = []
        for _ in range(N_TRAIN // train_cfg.batch_size):
            b = next(it)
            assert b["image"].shape == (
                train_cfg.batch_size // nprocs, SIZE, SIZE, 3
            ), b["image"].shape
            ids.extend(int(v) for v in b["image"][:, 0, 0, 0])
        state = it.get_state()
        want = next(it)["image"]
        it2 = make_dataset(cfg, glow_cfg, train_cfg)
        it2.set_state(state)
        resume_ok = bool(np.array_equal(next(it2)["image"], want))
        return ids, resume_ok

    # loader="native" pins the indexed reader; "grain" requires the Grain
    # route (grain_pipeline._TFRecordSource sharded by grain.ShardOptions).
    ids, resume_ok = scan_epoch("native")
    ids_grain, resume_ok_grain = scan_epoch("grain")
    data_cfg = DataConfig(name="cifar10", root=root, image_size=SIZE,
                          loader="native")

    # -- 2. end-to-end: per-process rows -> global batch -> identical loss --
    p = Profile(
        name="mh-tfr",
        glow=glow_cfg,
        optim=OptimConfig(lr=1e-3, warmup_steps=10),
        train=TrainConfig(batch_size=16, num_steps=4, scalar_log_gap=2,
                          plot_gap=0, checkpoint_gap=0, num_sample_images=2,
                          seed=0),
        data=data_cfg,
        out_dir=out_dir,
    )
    built = builderlib.build(p)
    result = trainerlib.train(built, quiet=True)

    print(json.dumps({
        "proc": proc,
        "ids": ids,
        "ids_grain": ids_grain,
        "resume_ok": resume_ok and resume_ok_grain,
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

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    work = tempfile.mkdtemp(prefix="mh_tfr_")
    root = os.path.join(work, "tfds")
    write_id_encoded_tfds(root)
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
    for key in ("ids", "ids_grain"):
        id_sets = [set(o[key]) for o in outs]
        assert id_sets[0].isdisjoint(id_sets[1]), (
            f"{key}: processes read overlapping records: "
            f"{sorted(id_sets[0] & id_sets[1])}"
        )
        union = id_sets[0] | id_sets[1]
        assert union == set(range(N_TRAIN)), (
            f"{key}: epoch did not cover the dataset: "
            f"missing {set(range(N_TRAIN)) - union}"
        )
    assert all(o["resume_ok"] for o in outs), outs
    id_sets = [set(o["ids"]) for o in outs]
    losses = {o["loss"] for o in outs}
    assert len(losses) == 1, f"processes disagree on loss: {outs}"
    print(json.dumps({
        "multihost_tfrecord_smoke": "OK",
        "per_proc_records": [len(s) for s in id_sets],
        "loss": outs[0]["loss"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
