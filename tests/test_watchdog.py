"""Step-liveness watchdog (SURVEY.md §5 failure recovery).

Field-motivated by a round-5 incident: a tunneled-TPU RPC wedged
mid-dispatch on a 60k-step soak and never returned — SIGTERM could not run
(main thread stuck in C) and in-process --retries would have reused the
same wedged client.  The watchdog abandons the process (exit 17) or
re-execs it (fresh device client, resume from the latest snapshot) when the
train loop stops making progress.
"""

import json
import os
import subprocess
import sys
import time

import pytest

from pytorch_glow_tpu.train import trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_fires_when_stale():
    wd = trainer._StepWatchdog(0.3, poll_s=0.05)
    fired = []
    wd._die = lambda: fired.append(True)
    wd.beat()
    wd.beat()  # second beat arms the thread
    deadline = time.time() + 5
    while not fired and time.time() < deadline:
        time.sleep(0.05)
    wd.stop()
    assert fired, "watchdog never fired on a stale loop"


def test_watchdog_quiet_while_beating():
    wd = trainer._StepWatchdog(0.5, poll_s=0.05)
    fired = []
    wd._die = lambda: fired.append(True)
    for _ in range(25):  # beats land well inside the timeout
        wd.beat()
        time.sleep(0.05)
    assert not fired
    wd.stop()
    time.sleep(0.2)
    assert not fired, "watchdog fired after stop()"


def test_watchdog_unarmed_during_first_iteration():
    """The first loop iteration pays the jit compile (minutes on remote
    Mosaic) — one beat must NOT start the countdown."""
    wd = trainer._StepWatchdog(0.1, poll_s=0.02)
    fired = []
    wd._die = lambda: fired.append(True)
    wd.beat()  # only one beat: simulated never-ending first compile
    time.sleep(0.5)
    assert not fired
    assert wd._thread is None
    wd.stop()


def test_die_policy_execv_with_budget(monkeypatch):
    calls = []
    monkeypatch.setenv(trainer._WEDGE_BUDGET_ENV, "2")
    monkeypatch.setattr(trainer.os, "execv",
                        lambda exe, argv: calls.append(("execv", exe, argv)))
    monkeypatch.setattr(trainer.os, "_exit",
                        lambda code: calls.append(("exit", code)))
    trainer._StepWatchdog(1.0)._die()
    assert calls[0][0] == "execv"
    assert calls[0][1] == sys.executable
    assert calls[0][2] == [sys.executable] + sys.argv
    assert os.environ[trainer._WEDGE_BUDGET_ENV] == "1"
    # execv was stubbed to return; the defensive fallthrough must still exit
    assert calls[1] == ("exit", trainer.WEDGE_EXIT_CODE)


def test_die_policy_exit_without_budget(monkeypatch):
    calls = []
    monkeypatch.delenv(trainer._WEDGE_BUDGET_ENV, raising=False)
    monkeypatch.setattr(trainer.os, "execv",
                        lambda exe, argv: calls.append(("execv",)))
    monkeypatch.setattr(trainer.os, "_exit",
                        lambda code: calls.append(("exit", code)))
    trainer._StepWatchdog(1.0)._die()
    assert calls == [("exit", trainer.WEDGE_EXIT_CODE)]


_WEDGE_DRIVER = """
import dataclasses, json, os, sys, threading
import jax
jax.config.update("jax_platforms", "cpu")

from pytorch_glow_tpu.utils.profiles import load_profile
from pytorch_glow_tpu.train.builder import build
from pytorch_glow_tpu.train.trainer import train

prof = load_profile(sys.argv[1])
built = build(prof)


class HangAfter:
    # Simulates tonight's wedge: the host loop blocks in a call that never
    # returns (for real: a device RPC; here: an Event that is never set).
    def __init__(self, it, n):
        self.it, self.n = it, n

    def __iter__(self):
        return self

    def __next__(self):
        self.n -= 1
        if self.n < 0:
            sys.stderr.write("[driver] entering simulated wedge\\n")
            sys.stderr.flush()
            threading.Event().wait()
        return next(self.it)


built.data = HangAfter(built.data, 6)
train(built, quiet=True)
print(json.dumps({"unreachable": True}))
"""


def test_wedged_loop_reexecs_then_exits_17(tmp_path):
    """End-to-end: a hung train loop is abandoned by the watchdog; with a
    restart budget of 1 the process re-execs itself once (the driver hangs
    again) and the second firing exits with WEDGE_EXIT_CODE."""
    prof_path = str(tmp_path / "p.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "wedge",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                         "K": 2, "L": 2},
                "train": {"batch_size": 4, "num_steps": 50000,
                          "scalar_log_gap": 1, "plot_gap": 0, "eval_gap": 0,
                          "checkpoint_gap": 0, "num_sample_images": 4,
                          "step_timeout_s": 1.5},
                "data": {"name": "synthetic", "image_size": 8},
                "out_dir": str(tmp_path),
            },
            f,
        )
    # A real file, not `python -c`: the watchdog re-execs [executable]+argv,
    # which must name the driver again for the restart to mean anything.
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as f:
        f.write(_WEDGE_DRIVER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["GLOW_WEDGE_RESTART_BUDGET"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, driver, prof_path],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == trainer.WEDGE_EXIT_CODE, proc.stderr[-3000:]
    assert proc.stderr.count("entering simulated wedge") == 2, \
        proc.stderr[-3000:]
    assert proc.stderr.count("watchdog re-exec") == 1, proc.stderr[-3000:]
    assert "unreachable" not in proc.stdout
