#!/usr/bin/env python
"""Real-data dress rehearsal: the ENTIRE docs/REAL_DATA.md chain in one
command, against TF-written CIFAR-10-shaped TFRecord fixtures (round-4
verdict Next #6).

Exercises, via the real CLIs (subprocesses, as a user would):

  1. prepare   TF writes tfds-style train/test shards (PNG features) —
               the exact on-disk format a tensorflow_datasets prepare
               produces for real CIFAR-10.
  2. train     `train.py <profile> --data-root <fixtures>` on the Grain
               route (loader=auto -> grain TFRecord source), eval_gap on,
               so a best checkpoint + sidecar exist.
  3. resume    the same command with more steps must resume, not restart.
  4. report    `infer.py report --best` — sample sheets, recon drift, all
               three NLL protocols, SWD, on the HELD-OUT shard.
  5. export    `infer.py export` — AOT StableHLO artifact, params baked in.
  6. serve     `infer.py serve <artifact>` — sampling with no model code.

Prints one JSON line {"dress_rehearsal": "OK", ...} on success; any seam
between the individually-tested pieces fails loudly with the failing
stage's stderr.

Usage:
  python scripts/dress_rehearsal.py [--out DIR] [--steps 40] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZE = 32  # CIFAR-10 geometry


def write_fixtures(root: str, n_train: int = 256, n_test: int = 64) -> None:
    """tfds-style PNG-encoded shards, written BY TensorFlow (format oracle:
    if our pure-Python reader drifts from what TF actually writes, this is
    where it surfaces)."""
    import numpy as np
    import tensorflow as tf

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)

    def write(split: str, n: int, shards: int):
        per = n // shards
        k = 0
        for s in range(shards):
            name = f"cifar10-{split}.tfrecord-{s:05d}-of-{shards:05d}"
            with tf.io.TFRecordWriter(os.path.join(root, name)) as w:
                for _ in range(per):
                    # Smooth-ish content (not pure noise) so the tiny run's
                    # eval NLL sits well below the 8-bit uniform floor.
                    base = rng.integers(40, 215, (1, 1, 3), np.uint8)
                    img = np.clip(
                        base.astype(np.int16)
                        + rng.integers(-30, 30, (SIZE, SIZE, 3)),
                        0, 255,
                    ).astype(np.uint8)
                    ex = tf.train.Example(features=tf.train.Features(feature={
                        "image": tf.train.Feature(bytes_list=tf.train.BytesList(
                            value=[tf.io.encode_png(img).numpy()])),
                        "label": tf.train.Feature(int64_list=tf.train.Int64List(
                            value=[k % 10])),
                    }))
                    w.write(ex.SerializeToString())
                    k += 1

    write("train", n_train, shards=2)
    write("test", n_test, shards=1)


def run(stage: str, cmd: list[str], timeout: int = 900) -> str:
    r = subprocess.run(
        [sys.executable, "-u", *cmd], capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )
    if r.returncode != 0:
        print(f"[dress_rehearsal] stage '{stage}' FAILED rc={r.returncode}\n"
              f"--- cmd: {' '.join(cmd)}\n--- stderr:\n{r.stderr[-4000:]}",
              file=sys.stderr)
        raise SystemExit(2)
    return r.stdout


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="work dir (default: mkdtemp)")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir for inspection")
    args = ap.parse_args()

    work = args.out or tempfile.mkdtemp(prefix="dress_rehearsal_")
    os.makedirs(work, exist_ok=True)
    data_root = os.path.join(work, "tfds")
    out_dir = os.path.join(work, "results")
    summary: dict = {"work_dir": work}

    try:
        write_fixtures(data_root)
        summary["fixtures"] = sorted(os.listdir(data_root))

        # A small profile with the real CIFAR-10 geometry; data name
        # 'cifar10' + root at the shards routes through Grain's TFRecord
        # source (loader=auto), like a real tfds-prepared directory.
        gap = max(args.steps // 2, 1)
        profile = {
            "name": "rehearsal",
            "glow": {"image_shape": [SIZE, SIZE, 3], "hidden_channels": 32,
                     "K": 2, "L": 2},
            "train": {"batch_size": 16, "num_steps": args.steps,
                      "scalar_log_gap": gap, "plot_gap": 0,
                      "checkpoint_gap": gap, "eval_gap": gap,
                      "eval_batches": 2, "num_sample_images": 4},
            "data": {"name": "cifar10", "root": data_root},
            "out_dir": out_dir,
        }
        prof_path = os.path.join(work, "rehearsal.json")
        with open(prof_path, "w") as f:
            json.dump(profile, f)

        out = run("train", ["train.py", prof_path, "--cpu"])
        assert f"final_step" in out or "[step" in out, out[-2000:]

        # Resume leg: +50% more steps must pick up from the snapshot.
        out = run("resume", ["train.py", prof_path, "--cpu",
                             "--steps", str(args.steps + gap)])
        run_dir = os.path.join(out_dir, "rehearsal")
        best_meta = os.path.join(run_dir, "checkpoints-best", "best.json")
        with open(best_meta) as f:
            best = json.load(f)
        summary["best"] = best

        rep_dir = os.path.join(work, "report")
        run("report", ["infer.py", "report", prof_path, "--cpu", "--best",
                       "--batches", "2", "-n", "4", "--swd-images", "32",
                       "-o", rep_dir])
        with open(os.path.join(rep_dir, "report.json")) as f:
            report = json.load(f)
        bd = report["bits_dim"]["elbo_1draw"]
        assert 0.0 < bd < 8.1, f"implausible bits/dim {bd}"
        summary["report_bits_dim_elbo"] = round(bd, 4)
        summary["report_snapshot_step"] = report["step"]

        art = os.path.join(work, "artifact")
        run("export", ["infer.py", "export", prof_path, "--cpu",
                       "--batch-size", "4", "-o", art])
        served = os.path.join(work, "served.png")
        run("serve", ["infer.py", "serve", art, "--cpu",
                      "--temperature", "0.7", "-o", served])
        assert os.path.getsize(served) > 0
        summary["served_png_bytes"] = os.path.getsize(served)

        summary["dress_rehearsal"] = "OK"
        print(json.dumps(summary))
        return 0
    finally:
        if not args.keep and args.out is None:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
