"""Regenerate the golden loss trajectories (run once, commit the npz).

    python -m tests.goldens.generate [name ...]

Only regenerate a golden when the math it pins changes DELIBERATELY
(e.g. a new bound formulation); record why in the commit message.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from tests.goldens.configs import CONFIGS  # noqa: E402

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))


def main(names):
    names = names or sorted(CONFIGS)
    for name in names:
        losses = CONFIGS[name]()
        path = os.path.join(GOLDEN_DIR, "golden_{}.npz".format(name))
        np.savez(path, losses=losses)
        print("{}: {} steps, loss {:.6f} -> {:.6f}  [{}]".format(
            name, len(losses), losses[0], losses[-1], path))


if __name__ == "__main__":
    main(sys.argv[1:])
