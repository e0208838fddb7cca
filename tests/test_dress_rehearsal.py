"""The one-command real-data dress rehearsal (round-4 verdict Next #6):
TF-written TFRecord fixtures -> train.py (Grain route) -> resume ->
infer.py report --best -> export -> serve, all through the real CLIs in
fresh subprocesses.  Catches seams between the individually-tested pieces
before real data ever arrives — round 5 it caught the lazy LAPACK-FFI
registration SIGSEGV in model-code-free serving processes (serve.py
_warm_ffi_targets)."""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "dress_rehearsal.py")


@pytest.mark.multiprocess
def test_dress_rehearsal_chain():
    r = subprocess.run(
        [sys.executable, "-u", SCRIPT, "--steps", "30"],
        capture_output=True, text=True, timeout=1500,
        # Fresh default platform plumbing (each CLI passes --cpu itself).
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["dress_rehearsal"] == "OK"
    assert out["best"]["metric"] < 8.1
    assert 0.0 < out["report_bits_dim_elbo"] < 8.1
    assert out["served_png_bytes"] > 0
