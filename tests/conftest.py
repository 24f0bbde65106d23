"""Test configuration: force an 8-virtual-device CPU backend.

Must run before jax initializes a backend — pytest imports conftest first,
so setting the env here is safe. All sharding/pjit tests use this virtual
mesh; real-TPU execution is exercised by bench.py and the driver's
compile checks instead.
"""

import os

# The axon TPU plugin on this machine ignores JAX_PLATFORMS; JAX_PLATFORM_NAME
# (and jax.config jax_platforms) do take effect — set both.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    return jax.random.PRNGKey(0)
