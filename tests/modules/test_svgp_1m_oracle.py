"""The north-star oracle at its LITERAL scale (VERDICT r4 item 3).

BASELINE.json's north star says "SVGP regression on 10^6 points matches
the reference ELBO trajectory to 1e-5". The 100k-point torch-trajectory
oracle (test_svgp_independent_oracle.py) proves the cross-framework
contract at ladder scale; this test runs the SAME contract at the
literal 10^6-point config: the framework's full-batch SVGP training
trajectory (bound value + gradients + adam updates, float64) must match
an independent chunked-autograd torch implementation
(tests/oracles/svgp_torch_oracle.py run_trajectory_chunked) step for
step to 1e-5 — the reference's external-oracle pattern
(/root/reference/testing/modules/gpregression_test.py:82-109, GPy).

5 steps, M=128: sized so the f64 CPU run finishes in slow-tier time
while every term of the bound (data fit, both trace corrections, KL)
contributes at full N.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytest.importorskip("torch")

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import MAP, GradBasedInference

from oracles import svgp_torch_oracle as oracle  # noqa: E402

N, M, D = 1_000_000, 128, 2
STEPS = 5
LR = 1e-2
JITTER = 1e-5


def test_chunked_oracle_equals_unchunked_on_small_n():
    """The chunked-accumulation oracle is the same math as the one the
    100k test already trusts: identical losses on a size where both
    run (pure torch-vs-torch, no framework involved)."""
    rng = np.random.default_rng(3)
    X = rng.random((600, D)) * 4.0
    Y = np.sin(X[:, :1]) + rng.standard_normal((600, 1)) * 0.1
    init = {
        "Z": rng.random((16, D)) * 4.0,
        "raw_noise": np.array([-1.0]),
        "raw_variance": np.array([0.3]),
        "raw_lengthscale": np.array([0.2]),
        "qU_mean": rng.standard_normal((16, 1)) * 0.1,
        "qU_cov_W": np.eye(16) * 0.5,
        "raw_qU_cov_diag": np.full((16,), -2.0),
    }
    full, _ = oracle.run_trajectory(init, X, Y, jitter=JITTER, lr=LR,
                                    n_steps=4)
    chunked, _ = oracle.run_trajectory_chunked(
        init, X, Y, jitter=JITTER, lr=LR, n_steps=4, chunk=150)
    np.testing.assert_allclose(chunked, full, rtol=1e-12)


@pytest.mark.slow
def test_svgp_1m_trajectory_matches_torch_oracle():
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

    fw_losses = []
    infr.run(max_iter=STEPS, learning_rate=LR, optimizer="adam", X=X,
             Y=Y, callback=lambda i, l: fw_losses.append(float(l)))

    or_losses, or_final = oracle.run_trajectory_chunked(
        init, X, Y, jitter=JITTER, lr=LR, n_steps=STEPS)

    assert len(fw_losses) == len(or_losses) == STEPS
    # the literal north-star tolerance at the literal north-star scale
    np.testing.assert_allclose(fw_losses, or_losses, rtol=1e-5)

    fw_qmu = np.asarray(infr.params.param_dict[post.qU_mean.uuid])
    np.testing.assert_allclose(fw_qmu, or_final["qU_mean"], rtol=1e-4,
                               atol=1e-8)
    fw_ls = np.asarray(
        infr.params.param_dict[kernel.lengthscale.uuid])
    np.testing.assert_allclose(fw_ls, or_final["raw_lengthscale"],
                               rtol=1e-4)
