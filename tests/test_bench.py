"""Driver contract: bench.py prints exactly one parseable JSON line.

The driver runs bench.py unattended at end of round; both the happy path
and the wedge paths must produce a machine-readable record (the tunneled
TPU can hang client creation AND mid-run dispatches — see CLAUDE.md).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_extra, timeout=600):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_bench_happy_path_json_line():
    proc = _run({
        "BENCH_PLATFORM": "cpu",
        "BENCH_PRESET": "tiny-cifar10",
        "BENCH_BATCH": "4",
        "BENCH_ITERS": "2",
        "BENCH_REPS": "1",
        "BENCH_FLOWSTEP": "xla",
    })
    assert proc.returncode in (0, None) and proc.returncode != 1, \
        proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] and rec["value"] > 0
    assert rec["detail"]["iters_chained_in_jit"] == 2


def test_bench_run_watchdog_emits_error_record():
    """A mid-run wedge must still yield one JSON line (with the last known
    hardware number) instead of hanging the driver: force it by giving the
    whole run a timeout shorter than any compile."""
    proc = _run({
        "BENCH_PLATFORM": "cpu",
        "BENCH_PRESET": "tiny-cifar10",
        "BENCH_BATCH": "4",
        "BENCH_ITERS": "2",
        "BENCH_REPS": "1",
        "BENCH_FLOWSTEP": "xla",
        "BENCH_TIMEOUT_S": "0.25",
    }, timeout=300)
    assert proc.returncode == 1, proc.stdout + proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "wedged mid-run" in rec["error"]
    assert rec["last_known_hardware"]["value"] > 0
