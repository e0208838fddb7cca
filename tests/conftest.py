"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports.

The real TPU slice is a single chip here; GSPMD/sharding tests run on a fake
8-device CPU mesh (SURVEY.md §4).  This must run before anything imports
jax, hence module-level in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The machine's axon boot hook (sitecustomize) force-selects the TPU platform
# via jax.config.update("jax_platforms", "axon,cpu"), which beats the env var
# — override it back to CPU for the test session.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: repeated builds (each jits a fresh train
# step) and repeated suite runs hit the cache instead of recompiling.
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
