"""Cross-framework trajectory oracles for the exact-GP marginal
likelihood and the Titsias collapsed sparse bound (torch autograd +
hand-rolled adam, float64, no mxfusion_tpu imports in the oracle).

Together with tests/modules/test_svgp_independent_oracle.py this gives
every GP module family the cross-implementation trajectory validation
the reference gets from GPy (/root/reference/testing/modules/
gpregression_test.py, sparsegpregression_test.py,
svgpregression_test.py) — bound value, gradients, and optimizer
updates, step by step, at ladder-scale configs.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytest.importorskip("torch")  # the oracle tier needs torch (CPU)

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression, SparseGPRegression
from mxfusion_tpu.inference import MAP, GradBasedInference

from oracles import svgp_torch_oracle as oracle  # noqa: E402

STEPS = 50
LR = 1e-2


def _fit_and_compare(m, X, Y, uuid_to_role, neg_bound, rtol, **kw):
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    raw = dict(infr.params.trainable_params())
    assert set(uuid_to_role) == set(raw), (
        "trainable inventory changed; update the oracle map")
    init = {role: np.asarray(raw[u]) for u, role in uuid_to_role.items()}

    fw_losses = []
    infr.run(max_iter=STEPS, learning_rate=LR, optimizer="adam", X=X,
             Y=Y, callback=lambda i, l: fw_losses.append(float(l)))
    or_losses, _ = oracle.run_bound_trajectory(
        neg_bound, init, X, Y, lr=LR, n_steps=STEPS, **kw)
    assert len(fw_losses) == STEPS
    np.testing.assert_allclose(fw_losses, or_losses, rtol=rtol)


@pytest.mark.slow
def test_gpr_trajectory_matches_torch_oracle():
    """Exact GP, the ladder's 1k-point config."""
    N, D = 1024, 1
    rng = np.random.default_rng(0)
    X = rng.random((N, D)) * 4.0
    Y = np.sin(X[:, :1]) + rng.standard_normal((N, 1)) * 0.1

    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    kernel = RBF(input_dim=D, variance=1.2, lengthscale=0.7,
                 dtype="float64")
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, 1),
        dtype="float64")
    _fit_and_compare(
        m, X, Y,
        {m.noise_var.uuid: "raw_noise",
         kernel.variance.uuid: "raw_variance",
         kernel.lengthscale.uuid: "raw_lengthscale"},
        oracle.gpr_neg_mll, rtol=1e-5)


@pytest.mark.slow
def test_sparsegp_trajectory_matches_torch_oracle():
    """Titsias collapsed bound, 10k points / 50 inducing."""
    N, M, D = 10_000, 50, 2
    JITTER = 1e-5
    rng = np.random.default_rng(1)
    X = rng.random((N, D)) * 4.0
    Y = (np.sin(X[:, :1]) + np.cos(0.5 * X[:, 1:2])
         + rng.standard_normal((N, 1)) * 0.1)
    Z0 = rng.random((M, D)) * 4.0

    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    kernel = RBF(input_dim=D, variance=1.2, lengthscale=0.7,
                 dtype="float64")
    zvar = Variable(shape=(M, D), initial_value=Z0)
    m.Y = SparseGPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, 1),
        inducing_inputs=zvar, dtype="float64", jitter=JITTER)
    _fit_and_compare(
        m, X, Y,
        {zvar.uuid: "Z",
         m.noise_var.uuid: "raw_noise",
         kernel.variance.uuid: "raw_variance",
         kernel.lengthscale.uuid: "raw_lengthscale"},
        oracle.titsias_neg_bound, rtol=1e-5, jitter=JITTER)
