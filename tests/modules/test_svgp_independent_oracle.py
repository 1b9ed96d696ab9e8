"""North-star trajectory oracle: the framework's SVGP training run
(bound + gradients + adam, step by step) must match an INDEPENDENT
implementation — torch autograd + a hand-rolled textbook adam, float64,
no mxfusion_tpu imports inside the oracle (tests/oracles/
svgp_torch_oracle.py).

This is the honest stand-in for the reference's external GPy oracle
(/root/reference/testing/modules/gpregression_test.py:82-109) and for
BASELINE.json's unreachable MXNet-trajectory north star ("SVGP 10^6
points matches the reference ELBO trajectory to 1e-5"): it makes the
frozen golden trajectories (tests/test_golden_trajectories.py)
trustworthy rather than self-referential, because the trajectory is
now pinned to a second, framework-independent derivation.

Config: the BASELINE.json ladder's "SVGP 100k points / 100 inducing"
shape, full batch (B=N removes data-subsampling stochasticity; the
bound is identical), 50 adam steps at lr=1e-2.
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
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import MAP, GradBasedInference

from oracles import svgp_torch_oracle as oracle  # noqa: E402

N, M, D = 100_000, 100, 2
STEPS = 50
LR = 1e-2
JITTER = 1e-5


@pytest.mark.slow
def test_svgp_trajectory_matches_torch_oracle():
    rng = np.random.default_rng(0)
    X = rng.random((N, D)) * 4.0
    Y = (np.sin(X[:, :1]) + np.cos(X[:, 1:2] * 0.5)
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
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, 1),
        inducing_inputs=zvar, dtype="float64", jitter=JITTER)

    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)

    post = m.Y.factor._extra_graphs[0]
    uuid_to_role = {
        zvar.uuid: "Z",
        m.noise_var.uuid: "raw_noise",
        kernel.variance.uuid: "raw_variance",
        kernel.lengthscale.uuid: "raw_lengthscale",
        post.qU_mean.uuid: "qU_mean",
        post.qU_cov_W.uuid: "qU_cov_W",
        post.qU_cov_diag.uuid: "raw_qU_cov_diag",
    }
    raw = dict(infr.params.param_dict)
    assert set(uuid_to_role) == set(raw), (
        "trainable-parameter inventory changed; update the oracle map")
    init = {role: np.asarray(raw[u]) for u, role in uuid_to_role.items()}

    # ---- framework trajectory
    fw_losses = []
    infr.run(max_iter=STEPS, learning_rate=LR, optimizer="adam", X=X,
             Y=Y, callback=lambda i, l: fw_losses.append(float(l)))

    # ---- independent torch trajectory from the same start
    or_losses, or_final = oracle.run_trajectory(
        init, X, Y, jitter=JITTER, lr=LR, n_steps=STEPS)

    assert len(fw_losses) == len(or_losses) == STEPS
    np.testing.assert_allclose(fw_losses, or_losses, rtol=1e-5)

    # the optimized states agree too (not just the loss curve)
    fw_qmu = np.asarray(infr.params.param_dict[post.qU_mean.uuid])
    np.testing.assert_allclose(fw_qmu, or_final["qU_mean"], rtol=1e-4,
                               atol=1e-8)
    fw_ls = np.asarray(
        infr.params.param_dict[kernel.lengthscale.uuid])
    np.testing.assert_allclose(fw_ls, or_final["raw_lengthscale"],
                               rtol=1e-4)
