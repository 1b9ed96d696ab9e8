"""SGLD sampling tests (no reference counterpart — TPU-native extension).

Oracle tier: conjugate Gaussian posteriors in closed form — the
minibatch N/B likelihood rescaling is exactly what these tests pin: an
unscaled stochastic gradient would land on a posterior that is too wide
by ~N/B."""
import numpy as np
import jax
import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.common.exceptions import InferenceError
from mxfusion_tpu.inference import (SGLDAlgorithm, SGLDInference,
                                    potential_scale_reduction)


def _gaussian_mean_model(s2, tau2):
    # symbolic data dim: minibatch SGLD binds it to the batch size
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=tau2, shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(
                                     Variable(value=s2), (m.n, 1)),
                                 shape=(m.n, 1))
    return m


def test_sgld_minibatch_conjugate_gaussian_mean():
    """Minibatch SGLD recovers the closed-form posterior: mean AND
    variance — the variance check is what detects a wrong N/B scale."""
    N, s2, tau2, B = 512, 1.0, 100.0, 64
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) + 2.0

    m = _gaussian_mean_model(s2, tau2)
    alg = SGLDAlgorithm(model=m, observed=[m.y], num_samples=3000,
                        num_burnin=1000, num_chains=4, batch_size=B,
                        step_size=2e-4, step_decay_gamma=0.0)
    infr = SGLDInference(inference_algorithm=alg)
    samples = infr.run(y=y, key=jax.random.PRNGKey(0))

    post_var = 1.0 / (N / s2 + 1.0 / tau2)
    post_mean = post_var * y.sum() / s2
    draws = np.asarray(samples[m.mu.uuid]).reshape(-1)
    assert abs(draws.mean() - post_mean) < 4 * np.sqrt(post_var), \
        (draws.mean(), post_mean)
    # minibatch gradient noise inflates variance slightly at finite
    # step size; rtol accommodates it — but an unscaled likelihood
    # would give var ~ N/B times too large (x8 here), far outside
    assert np.isclose(draws.var(), post_var, rtol=0.5), \
        (draws.var(), post_var)
    rhat = float(potential_scale_reduction(
        np.asarray(samples[m.mu.uuid])[..., 0]))
    assert rhat < 1.2, rhat
    assert "step_size_final" in infr.diagnostics
    assert np.isfinite(
        infr.diagnostics["final_minibatch_log_joint"]).all()


def test_sgld_fullbatch_linear_regression():
    """batch_size=None: unadjusted Langevin on a Gaussian posterior."""
    N, D, s2 = 128, 3, 0.25
    rng = np.random.default_rng(1)
    X = rng.standard_normal((N, D))
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
    alg = SGLDAlgorithm(model=m, observed=[m.X, m.y], num_samples=4000,
                        num_burnin=1000, num_chains=4, batch_size=None,
                        step_size=4e-4, step_decay_gamma=0.0)
    infr = SGLDInference(inference_algorithm=alg)
    samples = infr.run(X=X, y=y, key=jax.random.PRNGKey(1))

    Sigma = np.linalg.inv(X.T @ X / s2 + np.eye(D))
    mu = Sigma @ X.T @ y[:, 0] / s2
    draws = np.asarray(samples[m.w.uuid]).reshape(-1, D)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.08)
    np.testing.assert_allclose(draws.var(0), np.diag(Sigma),
                               rtol=0.5, atol=1e-3)


def test_psgld_preconditioning_handles_scale_mismatch():
    """Two latents with 1e4-different posterior scales: pSGLD mixes
    both with one step size."""
    N = 256
    rng = np.random.default_rng(2)
    y = rng.standard_normal((N, 1)) * np.sqrt(2.0) + 1.0

    m = Model()
    # wide-prior mean (posterior sd ~ 0.09) and a near-pinned latent
    # (prior sd 1e-2, barely informed by data: posterior ~ prior)
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.z = Normal.define_variable(mean=0., variance=1e-4, shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(
                                     Variable(value=2.0), (m.n, 1)),
                                 shape=(m.n, 1))
    alg = SGLDAlgorithm(model=m, observed=[m.y], num_samples=3000,
                        num_burnin=1500, num_chains=4, batch_size=64,
                        step_size=2e-2, step_decay_gamma=0.0,
                        preconditioning=True)
    infr = SGLDInference(inference_algorithm=alg)
    samples = infr.run(y=y, key=jax.random.PRNGKey(2))

    mu_draws = np.asarray(samples[m.mu.uuid]).reshape(-1)
    z_draws = np.asarray(samples[m.z.uuid]).reshape(-1)
    post_var = 1.0 / (N / 2.0 + 1.0 / 100.0)
    post_mean = post_var * y.sum() / 2.0
    assert abs(mu_draws.mean() - post_mean) < 5 * np.sqrt(post_var)
    # the pinned latent stays at its prior scale (not blown up by the
    # shared step size)
    assert abs(z_draws.mean()) < 5e-2
    assert z_draws.var() < 5e-4


def test_sgld_predictive_and_errors():
    N = 64
    rng = np.random.default_rng(3)
    y = rng.standard_normal((N, 1)) + 1.0
    m = _gaussian_mean_model(1.0, 100.0)
    alg = SGLDAlgorithm(model=m, observed=[m.y], num_samples=50,
                        num_burnin=50, num_chains=2, batch_size=16,
                        step_size=2e-4, thin=2)
    infr = SGLDInference(inference_algorithm=alg)
    samples = infr.run(y=y, key=jax.random.PRNGKey(3))
    assert np.asarray(samples[m.mu.uuid]).shape == (50, 2, 1)

    # predictive draws realize the bound (batch-sized) data dim
    pred = infr.sample_predictive(key=jax.random.PRNGKey(4))
    assert np.asarray(pred[m.y.uuid]).shape == (100, 16, 1)

    with pytest.raises(InferenceError):
        bad = SGLDAlgorithm(model=m, observed=[m.y], batch_size=N + 1,
                            num_samples=2, num_burnin=0)
        SGLDInference(inference_algorithm=bad).run(
            y=y, key=jax.random.PRNGKey(5))
