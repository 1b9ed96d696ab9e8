"""End-to-end inference algorithm tests.

Mirrors the reference's inference test tier
(/root/reference/testing/inference/: meanfield_test.py:62-106,
map_test.py, score_function_test.py, forward_sampling, expectation).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield, MAP, MinibatchInferenceLoop,
    ScoreFunctionInference, ScoreFunctionRBInference,
    VariationalPosteriorForwardSampling, ForwardSampling,
    ExpectationAlgorithm, Inference, TransferInference)

N = 120
TRUE_MEAN, TRUE_STD = 3.0, 2.0


def make_model(n=N, symbolic=False):
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    if symbolic:
        m.n = Variable()
        shape = (m.n, 1)
    else:
        shape = (n, 1)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, shape),
                                 variance=broadcast_to(m.s, shape),
                                 shape=shape)
    return m


def make_data(n=N, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 1)) * TRUE_STD + TRUE_MEAN


def test_meanfield_svi_batch():
    m = make_model()
    y = make_data()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=300, learning_rate=0.1, y=y,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0]
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.3
    s_post = np.asarray(infr.params[m.s]).item()
    assert abs(s_post - y.var()) < 1.0


def test_meanfield_svi_minibatch():
    m = make_model(symbolic=True)
    y = make_data()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q, observed=[m.y])
    loop = MinibatchInferenceLoop(batch_size=40, rv_scaling={m.y: N / 40.})
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=60, learning_rate=0.1, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.5


def test_map():
    m = make_model()
    y = make_data()
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(max_iter=400, learning_rate=0.1, y=y)
    mu_map = np.asarray(
        infr.params[alg.posterior.mu.factor.location]).item()
    assert abs(mu_map - y.mean()) < 0.1


@pytest.mark.parametrize("alg_cls", [ScoreFunctionInference,
                                     ScoreFunctionRBInference])
def test_score_function(alg_cls):
    m = make_model()
    y = make_data()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = alg_cls(num_samples=40, model=m, posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(max_iter=500, learning_rate=0.05, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.6


def test_variational_posterior_forward_sampling():
    m = make_model()
    y = make_data()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(max_iter=300, learning_rate=0.1, y=y)

    infr_fwd = VariationalPosteriorForwardSampling(
        num_samples=2000, observed=[], inherited_inference=infr,
        target_variables=[m.y])
    (samples,) = infr_fwd.run()
    s = np.asarray(samples)
    assert s.shape[0] == 2000
    # predictive mean should track the data mean
    assert abs(s.mean() - y.mean()) < 0.5


def test_expectation_algorithm():
    m = Model()
    m.x = Normal.define_variable(mean=2., variance=1., shape=(1,))
    m.z = m.x * 3.0
    alg = ExpectationAlgorithm(model=m, observed=[], num_samples=5000,
                               target_variables=[m.z.uuid])
    infr = Inference(inference_algorithm=alg)
    (ez,) = infr.run(key=jax.random.PRNGKey(3))
    assert abs(float(np.asarray(ez).ravel()[0]) - 6.0) < 0.3


def test_transfer_inference_carries_params():
    m = make_model()
    y = make_data()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(max_iter=50, learning_rate=0.1, y=y)
    fwd = ForwardSampling(num_samples=10, model=m, observed=[],
                          infr_params=infr.params,
                          target_variables=[m.y])
    (samples,) = fwd.run()
    assert np.asarray(samples).shape == (10, N, 1)
    # the trained noise parameter carried over
    assert np.isclose(np.asarray(fwd.params[m.s]).item(),
                      np.asarray(infr.params[m.s]).item())
