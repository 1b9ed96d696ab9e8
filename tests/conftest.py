import os

# Run the test suite on a virtual 8-device CPU mesh: sharding/collective
# tests need multiple devices, and CPU float64 enables oracle-accuracy
# comparisons. Must be set before jax is imported.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def set_seed():
    np.random.seed(0)
