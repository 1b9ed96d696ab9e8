"""Smoke-run every example script (MXF_SMOKE trims iterations)."""
import os
import runpy
import sys

import pytest

pytestmark = pytest.mark.slow  # long-running tier

EXAMPLES = [
    "getting_started.py",
    "ppca_tutorial.py",
    "bnn_regression.py",
    "bnn_classification.py",
    "gp_regression.py",
    "svgp_regression.py",
    "variational_auto_encoder.py",
    "writing_a_new_distribution.py",
    "pilco/pilco_example.py",
    "data_parallel_svi.py",
    "svgp_large_scale.py",
    "hmc_regression.py",
    "svgp_natural_gradient.py",
    "sgld_bnn_minibatch.py",
    "svgp_classification.py",
    "gmm_mixture.py",
    "model_comparison.py",
    "writing_a_new_module.py",
    "svgp_multiclass.py",
    "lmc_multioutput.py",
    "matrix_completion.py",
    "state_space_timeseries.py",
    "parallel_tempering.py",
    "stochastic_volatility.py",
    "svgp_poisson_counts.py",
    "deep_gp_regression.py",
    "deep_gp_classification.py",
]

ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "examples")


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script, monkeypatch):
    monkeypatch.setenv("MXF_SMOKE", "1")
    path = os.path.join(ROOT, script)
    runpy.run_path(path, run_name="__main__")
