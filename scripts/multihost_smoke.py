#!/usr/bin/env python
"""TWO-PROCESS jax.distributed smoke on CPU: the real multi-host code path
(global mesh across processes, per-process batch rows assembled with
jax.make_array_from_process_local_data, psum'd grads, distributed orbax
checkpoint) without pod hardware.

Parent mode spawns two children; each child pins 4 virtual CPU devices, so
the job forms one 8-device global mesh across 2 processes — exactly the
shape of a 2-host slice.  Verifies: identical per-step loss on both
processes (the global batch is assembled consistently), a distributed
orbax snapshot both processes participate in, and a resumed build.

Usage:
  python scripts/multihost_smoke.py            # parent: spawn + check
  (child mode is internal: --proc N --port P)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile


def child(proc: int, nprocs: int, port: int, out_dir: str,
          local_devices: int) -> None:
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
    assert len(jax.devices()) == local_devices * nprocs, len(jax.devices())

    from pytorch_glow_tpu.config import (
        DataConfig, GlowConfig, OptimConfig, Profile, TrainConfig,
    )
    from pytorch_glow_tpu.train import builder as builderlib
    from pytorch_glow_tpu.train import trainer as trainerlib

    p = Profile(
        name="mh-smoke",
        glow=GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2),
        optim=OptimConfig(lr=1e-3, warmup_steps=10),
        train=TrainConfig(batch_size=16, num_steps=6, scalar_log_gap=3,
                          plot_gap=0, checkpoint_gap=6, num_sample_images=2,
                          seed=0),
        data=DataConfig(name="synthetic"),
        out_dir=out_dir,
    )
    built = builderlib.build(p)
    result = trainerlib.train(built, quiet=True)
    built.ckpt.wait()

    # Resume across the process group: restores the distributed snapshot.
    built2 = builderlib.build(p)
    print(json.dumps({
        "proc": proc,
        "devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "loss": round(float(result["loss"]), 6),
        "resumed": built2.resumed,
        "start_step": built2.start_step,
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual CPU devices per process (4-proc x 2-dev "
                         "proves nothing hardcodes the 2x4 shape)")
    args = ap.parse_args()

    if args.proc is not None:
        child(args.proc, args.nprocs, args.port, args.out_dir,
              args.local_devices)
        return 0

    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out_dir = args.out_dir or tempfile.mkdtemp(prefix="mh_smoke_")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i),
             "--nprocs", str(args.nprocs), "--port", str(port),
             "--out-dir", out_dir, "--local-devices", str(args.local_devices)],
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
    losses = {o["loss"] for o in outs}
    assert len(losses) == 1, f"processes disagree on loss: {outs}"
    assert all(o["resumed"] and o["start_step"] == 6 for o in outs), outs
    assert all(o["devices"] == args.local_devices * args.nprocs
               and o["local_devices"] == args.local_devices for o in outs)
    print(json.dumps({"multihost_smoke": "OK", "procs": outs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
