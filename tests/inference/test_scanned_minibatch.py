"""Scanned (batches_per_call) minibatch loop tests."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield, MAP, MinibatchInferenceLoop,
    ModulePredictionAlgorithm, TransferInference)

N, B = 240, 40


def test_scanned_minibatch_svi_converges():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(m.s, (m.n, 1)),
                                 shape=(m.n, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=8, model=m,
                                         posterior=q, observed=[m.y])
    loop = MinibatchInferenceLoop(batch_size=B, rv_scaling={m.y: N / B},
                                  batches_per_call=3)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=40, learning_rate=0.1, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.5


def test_scanned_minibatch_svgp_with_prediction():
    rng = np.random.default_rng(1)
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
    Z0 = np.linspace(0, 4, 12)[:, None]
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1), noise_var=m.noise_var,
        shape=(m.n, 1),
        inducing_inputs=Variable(shape=(12, 1), initial_value=Z0))
    loop = MinibatchInferenceLoop(batch_size=B, rv_scaling={m.Y: N / B},
                                  batches_per_call=4)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)
    infr.run(max_iter=60, learning_rate=0.05, X=X, Y=Y)
    Xt = np.linspace(0, 4, 15)[:, None]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, _ = pred.run(X=Xt)[0]
    err = np.abs(np.asarray(mu)[0] - np.sin(Xt)).mean()
    assert err < 0.25


def test_minibatch_batch_size_exceeds_dataset():
    """batch_size > N (even > 2N) must clamp to N-sized batches matching
    the bound symbolic dim (ADVICE r1: short-batch shape error)."""
    rng = np.random.default_rng(3)
    n_small = 25
    y = rng.standard_normal((n_small, 1)) + 1.5
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(m.s, (m.n, 1)),
                                 shape=(m.n, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=8, model=m,
                                         posterior=q, observed=[m.y])
    loop = MinibatchInferenceLoop(batch_size=64, rv_scaling={m.y: 1.0})
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=30, learning_rate=0.1, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.6
