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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
