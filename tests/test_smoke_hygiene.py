"""Process hygiene of the multihost smokes (round-4 judge finding): a
killed/timed-out smoke PARENT must never leave jax.distributed children
spinning as orphans — on a 1-core box they burn the core and cascade
timeouts into every later run.  scripts/_smoke_common.install_child_watchdog
arms three layers (PR_SET_PDEATHSIG, signal.alarm, a getppid poll); this
test SIGKILLs a real smoke parent mid-run and asserts the children die.
"""

import os
import signal
import subprocess
import sys
import tempfile
import time

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _children_of(pid: int) -> list[int]:
    kids = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                data = f.read()
            # field 4 (ppid) sits after the parenthesized comm, which may
            # itself contain spaces/parens — split after the LAST ')'.
            ppid = int(data.rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        if ppid == pid:
            kids.append(int(d))
    return kids


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


@pytest.mark.multiprocess
def test_smoke_children_die_with_sigkilled_parent():
    script = os.path.join(SCRIPTS, "multihost_preempt_smoke.py")
    out_dir = tempfile.mkdtemp(prefix="orphan_test_")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    parent = subprocess.Popen(
        [sys.executable, script, "--out-dir", out_dir],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    kids: list[int] = []
    try:
        # The preempt-smoke children default to 100k steps — exactly the
        # config that spun forever as orphans in round 4.  Wait until both
        # exist (the parent spawns them before any jax import, so this is
        # fast), then SIGKILL the parent with no chance to clean up.
        deadline = time.time() + 120
        while time.time() < deadline:
            kids = _children_of(parent.pid)
            if len(kids) >= 2:
                break
            if parent.poll() is not None:
                pytest.fail(f"smoke parent exited early rc={parent.returncode}")
            time.sleep(0.2)
        assert len(kids) >= 2, f"children never appeared: {kids}"

        parent.send_signal(signal.SIGKILL)
        parent.wait(timeout=10)

        # Every child must self-terminate (PDEATHSIG fires instantly; the
        # getppid poll within ~1-2 s) — well under this bound either way.
        deadline = time.time() + 30
        while time.time() < deadline and any(_alive(k) for k in kids):
            time.sleep(0.5)
        leftovers = [k for k in kids if _alive(k)]
        assert not leftovers, f"orphaned smoke children survived: {leftovers}"
    finally:
        if parent.poll() is None:
            parent.kill()
        for k in kids:
            if _alive(k):
                try:
                    os.kill(k, signal.SIGKILL)
                except OSError:
                    pass
