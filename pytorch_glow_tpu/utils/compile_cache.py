"""Persistent XLA/Mosaic compilation cache for the CLIs.

Paper-scale compiles through this machine's remote-TPU tunnel cost tens of
seconds to minutes; JAX's persistent cache survives them (measured: the
cifar10-preset fused train step recompiles in 9.5 s vs 26.2 s cold across
separate processes — docs/BENCHMARKING.md).  Every CLI entry point calls
`enable_compile_cache()` so repeat invocations (resume after crash,
bench reruns, infer on a trained model) skip recompilation.

Env controls:
* `GLOW_COMPILE_CACHE=0` disables entirely.
* `JAX_COMPILATION_CACHE_DIR=<dir>` — JAX's own knob wins untouched.

The cache lives under a per-host-CPU fingerprint subdirectory: XLA:CPU AOT
executables bake in the compiling machine's feature set (avx512 etc.), and
JAX's cache key does NOT include host CPU features — loading an entry
compiled on a different machine SIGSEGVs at dispatch (observed round 5:
round-4 cache entries crashed `infer.py serve` on this round's host with
cpu_aot_loader feature-mismatch errors).
"""

from __future__ import annotations

import hashlib
import os

_CPUINFO = "/proc/cpuinfo"  # test seam


def _host_fingerprint() -> str:
    """Stable id for (jax version, host CPU identity + feature set).

    The `flags` line alone is NOT enough: LLVM derives tuning features
    (`prefer-no-gather`/`prefer-no-scatter` — Skylake-era mitigation
    preferences) from the cpuid family/model, so two hosts with identical
    flags can still disagree on the baked-in AOT feature list (observed
    round 5: a same-flags VM migration tripped cpu_aot_loader mismatch
    warnings on every cached entry).  Key on the identity lines too.
    """
    import jax

    ident = ""
    try:
        with open(_CPUINFO) as f:
            want = ("vendor_id", "cpu family", "model", "model name",
                    "stepping", "flags")
            lines = []
            for ln in f:
                if not ln.strip():
                    break  # first processor block only; all cores match
                if ln.split(":")[0].strip() in want:
                    lines.append(ln.strip())
            ident = "|".join(lines)
    except OSError:
        import platform

        ident = platform.processor() or platform.machine()
    key = f"{jax.__version__}|{ident}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def enable_compile_cache() -> str | None:
    """Point jax at a persistent on-disk compile cache; returns the cache
    directory, or None when disabled / already user-configured."""
    if os.environ.get("GLOW_COMPILE_CACHE", "1") == "0":
        return None
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return None  # jax reads the env var itself; don't override
    import jax

    if jax.config.jax_compilation_cache_dir:
        return None  # something else (e.g. tests/conftest.py) configured it
    path = os.path.join(
        os.path.expanduser("~/.cache"), "pytorch_glow_tpu", "jax_cache",
        _host_fingerprint(),
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None  # read-only home: run uncached
    jax.config.update("jax_compilation_cache_dir", path)
    # Default min-compile-time is 1s; everything paper-scale clears it.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
