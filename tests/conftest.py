import os

# Run the test suite on a virtual 8-device CPU mesh: sharding/collective
# tests need multiple devices, and CPU float64 enables oracle-accuracy
# comparisons. jax is already imported by the environment's
# sitecustomize with JAX_PLATFORMS=axon baked in, so the platform must
# be overridden through jax.config (env vars alone are too late); the
# XLA flag is still read lazily at backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def set_seed():
    np.random.seed(0)
