#!/usr/bin/env python
"""TWO-PROCESS preemption smoke: SIGTERM ONE process mid-training and prove
the COLLECTIVE stop (train.trainer._preempt_stop's OR-reduce) brings BOTH
processes to a clean, resumable exit — the one regime the single-process
e2e test cannot cover (a one-sided break would deadlock the peer in the
next step's psum).

Flow: spawn 2 jax.distributed children on CPU (4 virtual devices each, one
8-device global mesh) training a micro model for far more steps than the
window allows; the parent waits for training rows to appear in
metrics.csv, then SIGTERMs child 0 ONLY.  Both children must (a) stop at
the same log boundary, (b) participate in the distributed final snapshot,
(c) exit rc=0 printing {"preempted": true, ...}.  A second 2-process wave
then resumes from the snapshot and runs to completion, proving the
preempted snapshot is valid.

Usage:
  python scripts/multihost_preempt_smoke.py          # parent: spawn + check
  (child mode is internal: --proc N --port P)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import tempfile
import time


def child(proc: int, nprocs: int, port: int, out_dir: str, num_steps: int) -> None:
    from _smoke_common import install_child_watchdog

    install_child_watchdog()  # die with the parent; bounded wall-clock —
    # the 100k-step default otherwise spins for hours if the parent is
    # SIGKILLed before delivering the preemption signal.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc,
    )

    from pytorch_glow_tpu.config import (
        DataConfig, GlowConfig, OptimConfig, Profile, TrainConfig,
    )
    from pytorch_glow_tpu.train import builder as builderlib
    from pytorch_glow_tpu.train import trainer as trainerlib

    p = Profile(
        name="mh-preempt",
        glow=GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2),
        optim=OptimConfig(lr=1e-3, warmup_steps=10),
        train=TrainConfig(batch_size=16, num_steps=num_steps, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=40, num_sample_images=2,
                          seed=0),
        data=DataConfig(name="synthetic"),
        out_dir=out_dir,
    )
    built = builderlib.build(p)
    result = trainerlib.train(built, quiet=True)
    built.ckpt.wait()
    print(json.dumps({
        "proc": proc,
        "final_step": result["final_step"],
        "preempted": bool(result.get("preempted", False)),
        "loss": round(float(result["loss"]), 6),
    }), flush=True)


def _spawn(nprocs: int, out_dir: str, num_steps: int):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i),
             "--nprocs", str(nprocs), "--port", str(port),
             "--out-dir", out_dir, "--num-steps", str(num_steps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(nprocs)
    ]


def _collect(procs):
    from _smoke_common import communicate_all

    outs, ok = [], True
    for i, (rc, stdout, stderr) in enumerate(communicate_all(procs, 900)):
        if rc != 0:
            ok = False
            print(f"[proc {i}] rc={rc}\n{stderr[-3000:]}", file=sys.stderr)
            continue
        line = [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))
    return outs, ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--num-steps", type=int, default=100_000)
    args = ap.parse_args()

    if args.proc is not None:
        child(args.proc, args.nprocs, args.port, args.out_dir, args.num_steps)
        return 0

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="mh_preempt_")
    procs = _spawn(args.nprocs, out_dir, num_steps=100_000)

    # Wait until training is demonstrably underway (scalar rows on disk),
    # then preempt ONE process only.
    csv_path = os.path.join(out_dir, "mh-preempt", "metrics.csv")
    deadline = time.time() + 600
    while time.time() < deadline:
        if os.path.isfile(csv_path) and sum(1 for _ in open(csv_path)) >= 3:
            break
        if any(pr.poll() is not None for pr in procs):
            break  # a child died early; _collect reports it
        time.sleep(0.5)
    else:
        for pr in procs:
            pr.kill()
        print("timed out waiting for training rows", file=sys.stderr)
        return 1
    procs[0].send_signal(signal.SIGTERM)

    outs, ok = _collect(procs)
    if not ok:
        return 1
    assert len(outs) == args.nprocs, outs
    stops = {o["final_step"] for o in outs}
    assert len(stops) == 1, f"processes stopped at different steps: {outs}"
    assert all(o["preempted"] for o in outs), (
        f"both processes must report a collective preemption: {outs}")
    stop_step = outs[0]["final_step"]
    assert stop_step < 100_000, outs

    # Wave 2: resume from the preemption snapshot and run to completion.
    resume_to = stop_step + 8
    procs2 = _spawn(args.nprocs, out_dir, num_steps=resume_to)
    outs2, ok2 = _collect(procs2)
    if not ok2:
        return 1
    assert all(o["final_step"] == resume_to and not o["preempted"]
               for o in outs2), outs2
    print(json.dumps({"multihost_preempt_smoke": "OK",
                      "preempted_at": stop_step, "resumed_to": resume_to,
                      "procs": outs, "resume": outs2}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
