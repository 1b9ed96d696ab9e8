"""Importance-weighted variational bound (beyond-reference).

Oracle tier: with q set to the EXACT conjugate posterior the weights
are constant, so the bound equals the closed-form log evidence for any
S — an equality test, not a statistical one. Behavior tier: the bound
is tighter than the ELBO for a mismatched q, and training with it
converges."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, ImportanceWeightedVariationalInference,
    StochasticVariationalInference, create_Gaussian_meanfield,
    create_executor)

N, S2, TAU2 = 40, 4.0, 25.0


def _setup(num_samples, algorithm_cls):
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=TAU2, shape=(1,))
    m.y = Normal.define_variable(
        mean=broadcast_to(m.mu, (N, 1)),
        variance=broadcast_to(Variable(value=S2), (N, 1)),
        shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = algorithm_cls(num_samples=num_samples, model=m, posterior=q,
                        observed=[m.y])
    return m, q, alg


def _posterior_moments(y):
    post_var = 1.0 / (N / S2 + 1.0 / TAU2)
    post_mean = post_var * y.sum() / S2
    return post_mean, post_var


def _log_evidence(y):
    # y ~ N(0, S2 I + TAU2 11^T)
    cov = S2 * np.eye(N) + TAU2 * np.ones((N, N))
    return stats.multivariate_normal.logpdf(y[:, 0], np.zeros(N), cov)


def _bound_value(alg, infr, y, key):
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [y], key)
    return -float(np.asarray(loss))


def test_iw_bound_exact_at_true_posterior():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * 2.0 + 1.0
    for S in (1, 3, 16):
        m, q, alg = _setup(S, ImportanceWeightedVariationalInference)
        infr = GradBasedInference(inference_algorithm=alg,
                                  dtype="float64")
        infr.initialize(y=y)
        pm, pv = _posterior_moments(y)
        infr.params[q.mu.factor.mean] = jnp.asarray([pm])
        infr.params[q.mu.factor.variance] = jnp.asarray([pv])
        bound = _bound_value(alg, infr, y, jax.random.PRNGKey(S))
        assert np.isclose(bound, _log_evidence(y), rtol=1e-9), \
            (S, bound, _log_evidence(y))


def test_iw_bound_tighter_than_elbo_for_mismatched_q():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((N, 1)) * 2.0 + 1.0
    pm, pv = _posterior_moments(y)

    def with_q(algorithm_cls, S, key):
        m, q, alg = _setup(S, algorithm_cls)
        infr = GradBasedInference(inference_algorithm=alg,
                                  dtype="float64")
        infr.initialize(y=y)
        # deliberately too-wide q centered off the posterior mean
        infr.params[q.mu.factor.mean] = jnp.asarray([pm + 0.3])
        infr.params[q.mu.factor.variance] = jnp.asarray([pv * 25.0])
        return _bound_value(alg, infr, y, key)

    # average over keys: both are MC estimates
    keys = [jax.random.PRNGKey(k) for k in range(30)]
    elbo = np.mean([with_q(StochasticVariationalInference, 64, k)
                    for k in keys])
    iw = np.mean([with_q(ImportanceWeightedVariationalInference, 64, k)
                  for k in keys])
    log_z = _log_evidence(y)
    assert iw > elbo + 0.5, (iw, elbo)
    assert iw <= log_z + 0.05, (iw, log_z)


def test_iw_training_approaches_log_evidence():
    """IWAE trains q to make the BOUND tight — with S=16 the bound
    tolerates a q wider than the posterior (the known IWAE signal
    property), so the convergence criterion is bound → log p(y), not
    q → posterior."""
    rng = np.random.default_rng(2)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m, q, alg = _setup(16, ImportanceWeightedVariationalInference)
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(y=y, max_iter=1500, learning_rate=0.1, verbose=False)
    # evaluate the trained bound averaged over fresh keys
    bounds = [_bound_value(alg, infr, y, jax.random.PRNGKey(100 + k))
              for k in range(20)]
    bound = float(np.mean(bounds))
    log_z = _log_evidence(y)
    assert bound > log_z - 0.5, (bound, log_z)
    assert bound < log_z + 0.2, (bound, log_z)
