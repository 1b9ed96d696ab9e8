"""HMC sampling tests (no reference counterpart — TPU-native extension).

Oracle tier: conjugate posteriors in closed form, matched within
Monte-Carlo error; convergence tier: split R-hat ~ 1.
"""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.inference import (HMCAlgorithm, HMCInference,
                                    potential_scale_reduction)


def test_hmc_conjugate_gaussian_mean():
    """y ~ N(mu, s2) with mu ~ N(0, tau2): posterior closed form."""
    N, s2, tau2 = 50, 4.0, 100.0
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * np.sqrt(s2) + 3.0

    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=tau2, shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=s2), (N, 1)),
                                 shape=(N, 1))
    alg = HMCAlgorithm(model=m, observed=[m.y], num_samples=400,
                       num_warmup=300, num_chains=4, num_leapfrog=8)
    infr = HMCInference(inference_algorithm=alg)
    samples = infr.run(y=y, key=jax.random.PRNGKey(0))

    post_var = 1.0 / (N / s2 + 1.0 / tau2)
    post_mean = post_var * y.sum() / s2
    draws = np.asarray(samples[m.mu.uuid]).reshape(-1)
    se = np.sqrt(post_var / max(1.0, len(draws) / 10))  # ESS-conservative
    assert abs(draws.mean() - post_mean) < 5 * se + 0.05, \
        (draws.mean(), post_mean)
    assert np.isclose(draws.var(), post_var, rtol=0.35)
    acc = infr.diagnostics["accept_rate"]
    assert np.all(acc > 0.4) and np.all(acc <= 1.0)
    rhat = float(potential_scale_reduction(
        np.asarray(samples[m.mu.uuid])[..., 0]))
    assert rhat < 1.1, rhat


def test_hmc_bayesian_linear_regression_posterior():
    """w ~ N(0, I), y ~ N(Xw, s2 I): Gaussian posterior closed form."""
    N, D, s2 = 80, 3, 0.25
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
    alg = HMCAlgorithm(model=m, observed=[m.X, m.y], num_samples=400,
                       num_warmup=400, num_chains=4, num_leapfrog=12)
    infr = HMCInference(inference_algorithm=alg)
    samples = infr.run(X=X, y=y, key=jax.random.PRNGKey(1))

    Sigma = np.linalg.inv(X.T @ X / s2 + np.eye(D))
    mu = Sigma @ X.T @ y[:, 0] / s2
    draws = np.asarray(samples[m.w.uuid]).reshape(-1, D)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(draws.var(0), np.diag(Sigma),
                               rtol=0.5, atol=5e-4)


def test_hmc_shapes_targets_and_determinism():
    N = 20
    rng = np.random.default_rng(2)
    y = rng.standard_normal((N, 1))
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=10., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.), (N, 1)),
                                 shape=(N, 1))
    alg = HMCAlgorithm(model=m, observed=[m.y], num_samples=30,
                       num_warmup=20, num_chains=2, num_leapfrog=5,
                       target_variables=[m.mu])
    infr = HMCInference(inference_algorithm=alg)
    s1 = infr.run(y=y, key=jax.random.PRNGKey(3))
    assert set(s1) == {m.mu.uuid}
    assert np.asarray(s1[m.mu.uuid]).shape == (30, 2, 1)
    s2 = HMCInference(inference_algorithm=HMCAlgorithm(
        model=m, observed=[m.y], num_samples=30, num_warmup=20,
        num_chains=2, num_leapfrog=5, target_variables=[m.mu])
    ).run(y=y, key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(s1[m.mu.uuid]),
                                  np.asarray(s2[m.mu.uuid]))


def test_hmc_mass_adaptation_handles_anisotropy():
    """Prior-only target with variances (100, 0.01): the adapted
    diagonal metric must recover both scales, where the identity
    metric's step size is pinned by the narrow dimension and
    under-explores the wide one at the same budget."""
    m = Model()
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (2,)),
        variance=Variable(value=np.array([100.0, 0.01])),
        shape=(2,))

    def run(adapt):
        alg = HMCAlgorithm(model=m, observed=[], num_samples=300,
                           num_warmup=300, num_chains=4,
                           num_leapfrog=8, adapt_mass=adapt)
        infr = HMCInference(inference_algorithm=alg)
        s = infr.run(key=jax.random.PRNGKey(5))
        return (np.asarray(s[m.w.uuid]).reshape(-1, 2),
                float(infr.diagnostics["step_size"]),
                infr.diagnostics["accept_rate"])

    adapted, eps_adapted, acc = run(True)
    _, eps_plain, _ = run(False)
    # both scales recovered through the adapted metric
    assert abs(adapted[:, 0].var() - 100.0) / 100.0 < 0.4
    assert abs(adapted[:, 1].var() - 0.01) / 0.01 < 0.4
    assert np.all(acc > 0.5)
    # with inverse-metric ~ posterior variance the dynamics are
    # unit-scale, so dual averaging settles on a much larger step size
    # than the identity metric (whose eps is pinned by the 0.1-scale
    # dimension)
    assert eps_adapted > 3 * eps_plain, (eps_adapted, eps_plain)


def test_hmc_posterior_predictive():
    """Predictive moments of the conjugate model: var = s2 + post_var."""
    N, s2, tau2 = 50, 4.0, 100.0
    rng = np.random.default_rng(6)
    y = rng.standard_normal((N, 1)) * np.sqrt(s2) + 3.0
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=tau2, shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=s2), (N, 1)),
                                 shape=(N, 1))
    alg = HMCAlgorithm(model=m, observed=[m.y], num_samples=500,
                       num_warmup=300, num_chains=4, num_leapfrog=8)
    infr = HMCInference(inference_algorithm=alg)
    infr.run(y=y, key=jax.random.PRNGKey(0))
    pred = infr.sample_predictive(key=jax.random.PRNGKey(1))
    yrep = np.asarray(pred[m.y.uuid])        # (2000, N, 1)
    assert yrep.shape == (2000, N, 1)
    post_var = 1.0 / (N / s2 + 1.0 / tau2)
    post_mean = post_var * y.sum() / s2
    flat = yrep.reshape(yrep.shape[0], -1)
    assert abs(flat.mean() - post_mean) < 0.15
    assert np.isclose(flat.var(), s2 + post_var, rtol=0.15)


def test_effective_sample_size_estimator():
    from mxfusion_tpu.inference import effective_sample_size
    rng = np.random.default_rng(7)
    S, C = 2000, 4
    # iid draws: ESS ~ S*C
    iid = rng.standard_normal((S, C))
    ess_iid = effective_sample_size(iid)
    assert 0.6 * S * C < ess_iid < 1.4 * S * C, ess_iid
    # AR(1) with rho=0.9: ESS ~ S*C * (1-rho)/(1+rho) ~ 0.053 * S*C
    rho = 0.9
    e = rng.standard_normal((S, C))
    ar = np.zeros((S, C))
    for t in range(1, S):
        ar[t] = rho * ar[t - 1] + np.sqrt(1 - rho ** 2) * e[t]
    ess_ar = effective_sample_size(ar)
    expected = S * C * (1 - rho) / (1 + rho)
    assert 0.5 * expected < ess_ar < 2.0 * expected, (ess_ar, expected)
    assert ess_ar < 0.2 * ess_iid
    # vector shape support
    v = rng.standard_normal((500, 2, 3))
    assert effective_sample_size(v).shape == (3,)
