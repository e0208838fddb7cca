"""Multi-host (pod-slice) runtime initialization.

The reference is strictly single-process (SURVEY.md §2.3); multi-chip here
is GSPMD over a Mesh, and multi-HOST slices only need
`jax.distributed.initialize()` before first device use — JAX's runtime
then exposes every chip in the slice through `jax.devices()` and the same
mesh/sharding code scales unchanged (collectives ride ICI).

Call `maybe_initialize()` at CLI startup: it is a no-op unless the standard
cluster env (JAX_COORDINATOR_ADDRESS / megascale env / TPU pod metadata)
indicates a multi-process run, so single-chip and CPU workflows never pay
for it.
"""

from __future__ import annotations

import os


def multihost_env() -> bool:
    if os.environ.get("GLOW_TPU_MULTIHOST", "auto") == "off":
        return False
    if any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    ):
        return True
    # Pod metadata style: more than one worker hostname listed.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a cluster env is present. Returns
    True if initialization happened."""
    if not multihost_env():
        return False
    import jax

    if jax.process_count() > 1:  # already initialized
        return True
    try:
        jax.distributed.initialize()
        return True
    except Exception as e:  # mis-set env on a single host: continue local
        print(f"[distributed] initialize() skipped: {type(e).__name__}: {e}")
        return False
