"""ChEES-HMC tests (beyond-reference; accelerator-native NUTS
alternative). Oracle tier: conjugate posteriors; adaptation tier: the
trajectory length must move away from its (bad) initial value toward
the posterior scale."""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.inference import (ChEESHMCAlgorithm, ChEESHMCInference,
                                    potential_scale_reduction)


def test_chees_conjugate_gaussian_mean():
    N, s2, tau2 = 50, 4.0, 100.0
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * np.sqrt(s2) + 3.0

    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=tau2, shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=s2), (N, 1)),
                                 shape=(N, 1))
    alg = ChEESHMCAlgorithm(model=m, observed=[m.y], num_samples=400,
                            num_warmup=400, num_chains=8,
                            trajectory_length=0.1)
    infr = ChEESHMCInference(inference_algorithm=alg)
    samples = infr.run(y=y, key=jax.random.PRNGKey(0))

    post_var = 1.0 / (N / s2 + 1.0 / tau2)
    post_mean = post_var * y.sum() / s2
    draws = np.asarray(samples[m.mu.uuid]).reshape(-1)
    assert abs(draws.mean() - post_mean) < 4 * np.sqrt(post_var), \
        (draws.mean(), post_mean)
    assert np.isclose(draws.var(), post_var, rtol=0.35)
    d = infr.diagnostics
    assert np.all(d["accept_rate"] > 0.3)
    # posterior sd ~0.28: ChEES should adapt T toward O(sd), well above
    # the deliberately tiny 0.1 start is fine, but it must not collapse
    assert d["trajectory_length"] > float(d["step_size"]), d
    assert d["mean_leapfrog_steps"] >= 1.0
    rhat = float(potential_scale_reduction(
        np.asarray(samples[m.mu.uuid])[..., 0]))
    assert rhat < 1.1, rhat


def test_chees_adapts_trajectory_to_correlated_posterior():
    """Bayesian linear regression with correlated design: fixed-tiny
    trajectories mix poorly; ChEES must stretch T and still match the
    closed-form posterior."""
    N, D, s2 = 80, 3, 0.25
    rng = np.random.default_rng(1)
    A = rng.standard_normal((D, D))
    X = rng.standard_normal((N, D)) @ (np.eye(D) + 0.5 * A)
    w_true = np.array([[1.0], [-0.5], [0.25]])
    y = X @ w_true + rng.standard_normal((N, 1)) * np.sqrt(s2)

    m = Model()
    m.X = Variable(shape=(N, D))
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (D, 1)),
        variance=broadcast_to(Variable(value=1.), (D, 1)),
        shape=(D, 1))
    m.f = dot(m.X, m.w)
    m.y = Normal.define_variable(mean=m.f,
                                 variance=broadcast_to(
                                     Variable(value=s2), (N, 1)),
                                 shape=(N, 1))
    alg = ChEESHMCAlgorithm(model=m, observed=[m.X, m.y],
                            num_samples=500, num_warmup=500,
                            num_chains=8, trajectory_length=0.05,
                            step_size=0.05)
    infr = ChEESHMCInference(inference_algorithm=alg)
    samples = infr.run(X=X, y=y, key=jax.random.PRNGKey(1))

    Sigma = np.linalg.inv(X.T @ X / s2 + np.eye(D))
    mu = Sigma @ X.T @ y[:, 0] / s2
    draws = np.asarray(samples[m.w.uuid]).reshape(-1, D)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(draws.var(0), np.diag(Sigma), rtol=0.5,
                               atol=5e-4)
    # adaptation actually ran: multiple leapfrog steps on average
    assert infr.diagnostics["mean_leapfrog_steps"] > 1.5, \
        infr.diagnostics


def test_chees_deterministic_and_shapes():
    N = 20
    rng = np.random.default_rng(2)
    y = rng.standard_normal((N, 1))
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=10., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.), (N, 1)),
                                 shape=(N, 1))

    def run():
        alg = ChEESHMCAlgorithm(model=m, observed=[m.y], num_samples=25,
                                num_warmup=20, num_chains=3)
        infr = ChEESHMCInference(inference_algorithm=alg)
        return np.asarray(infr.run(
            y=y, key=jax.random.PRNGKey(5))[m.mu.uuid])

    a, b = run(), run()
    assert a.shape == (25, 3, 1)
    np.testing.assert_array_equal(a, b)


def test_chees_sample_predictive():
    N = 25
    rng = np.random.default_rng(3)
    y = rng.standard_normal((N, 1)) + 2.0
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=50., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.), (N, 1)),
                                 shape=(N, 1))
    alg = ChEESHMCAlgorithm(model=m, observed=[m.y], num_samples=50,
                            num_warmup=50, num_chains=2)
    infr = ChEESHMCInference(inference_algorithm=alg)
    infr.run(y=y, key=jax.random.PRNGKey(3))
    pred = infr.sample_predictive(key=jax.random.PRNGKey(4))
    yp = np.asarray(pred[m.y.uuid])
    assert yp.shape == (100, N, 1)
    assert abs(yp.mean() - y.mean()) < 0.6
