"""Golden ELBO-trajectory regression tests (north-star parity pin).

BASELINE.json's north star demands the SVGP ELBO *trajectory* match the
reference to 1e-5. GPy/MXNet cannot run in this environment, so the
oracle is a frozen float64 trajectory per BASELINE.json ladder config,
generated once by ``python -m tests.goldens.generate`` and committed.
Any silent change to a bound, a transformation, an optimizer step, or
the RNG threading shows up here as a >1e-5 trajectory deviation —
even if the run still converges. Mirrors the intent of the reference's
GPy-trajectory tier (/root/reference/testing/modules/
gpregression_test.py:82-109).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # long-running tier

from tests.goldens.configs import CONFIGS

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_trajectory(name):
    path = os.path.join(GOLDEN_DIR, "golden_{}.npz".format(name))
    assert os.path.exists(path), (
        "missing golden {}; run python -m tests.goldens.generate {}"
        .format(path, name))
    golden = np.load(path)["losses"]
    losses = CONFIGS[name]()
    assert losses.shape == golden.shape
    np.testing.assert_allclose(
        losses, golden, rtol=1e-5, atol=1e-8,
        err_msg=("{}: loss trajectory deviates from the frozen golden "
                 "by more than 1e-5 — a bound/optimizer/RNG semantics "
                 "change. If deliberate, regenerate via python -m "
                 "tests.goldens.generate {}".format(name, name)))
