"""WAIC / PSIS-LOO model-comparison tests (beyond-reference).

Oracle tier: the pointwise log-likelihood matrix is checked against a
direct numpy recomputation from the SAME posterior draws; WAIC on a
hand-made matrix matches the definition exactly. Behavior tier: both
criteria prefer the correctly specified model."""
import numpy as np
import jax
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (HMCAlgorithm, HMCInference,
                                    pointwise_log_likelihood, waic,
                                    loo_psis)

N = 60


def _fit(y, lik_var):
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=lik_var), (N, 1)),
                                 shape=(N, 1))
    alg = HMCAlgorithm(model=m, observed=[m.y], num_samples=250,
                       num_warmup=200, num_chains=4, num_leapfrog=8)
    infr = HMCInference(inference_algorithm=alg)
    infr.run(y=y, key=jax.random.PRNGKey(0))
    return m, infr


def test_pointwise_loglik_matches_numpy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * 1.5 + 2.0
    m, infr = _fit(y, 2.25)
    ll = pointwise_log_likelihood(infr, y=y)["y"]
    draws = np.asarray(infr._samples[m.mu.uuid]).reshape(-1)
    assert ll.shape == (draws.shape[0], N)
    expected = stats.norm.logpdf(y[:, 0][None, :], draws[:, None],
                                 1.5)
    np.testing.assert_allclose(ll, expected, rtol=1e-5, atol=1e-6)


def test_waic_definition_on_fixed_matrix():
    rng = np.random.default_rng(1)
    ll = rng.standard_normal((40, 7)) * 0.3 - 1.0
    out = waic(ll)
    lppd = np.log(np.mean(np.exp(ll), axis=0))
    p = ll.var(axis=0, ddof=1)
    assert np.isclose(out["elpd_waic"], (lppd - p).sum(), rtol=1e-10)
    assert np.isclose(out["p_waic"], p.sum(), rtol=1e-10)
    assert out["pointwise"].shape == (7,)


def test_waic_and_loo_prefer_correct_model():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((N, 1)) * 1.0 + 2.0   # true var = 1
    _, infr_good = _fit(y, 1.0)
    _, infr_bad = _fit(y, 25.0)                    # wildly wrong var
    ll_good = pointwise_log_likelihood(infr_good, y=y)["y"]
    ll_bad = pointwise_log_likelihood(infr_bad, y=y)["y"]

    w_good, w_bad = waic(ll_good), waic(ll_bad)
    assert w_good["elpd_waic"] > w_bad["elpd_waic"] + 10

    l_good, l_bad = loo_psis(ll_good), loo_psis(ll_bad)
    assert l_good["elpd_loo"] > l_bad["elpd_loo"] + 10
    # a one-parameter model: effective parameter counts near 1, and
    # WAIC ~ LOO on a well-specified model
    assert 0.2 < w_good["p_waic"] < 3.0
    assert abs(l_good["elpd_loo"] - w_good["elpd_waic"]) < 2.0
    # healthy importance weights for the good model
    assert np.mean(l_good["pareto_k"] < 0.7) > 0.9


def test_gpd_fit_standard_xi_convention():
    """Pin the sign convention (r3 review finding: a Zhang–Stephens
    internal-k leak inverted the tail smoothing and the k diagnostic):
    heavy-tailed GPD data must fit xi > 0 and reproduce tail
    quantiles."""
    from mxfusion_tpu.inference.model_comparison import (_gpd_fit,
                                                         _gpd_quantiles)
    rng = np.random.default_rng(0)
    for xi_true, sig_true in [(0.5, 1.0), (-0.2, 1.0)]:
        u = rng.random(4000)
        x = sig_true * np.expm1(-xi_true * np.log1p(-u)) / xi_true
        xi, sig = _gpd_fit(x)
        assert abs(xi - xi_true) < 0.1, (xi, xi_true)
        p = np.array([0.5, 0.9, 0.99])
        q = _gpd_quantiles(p, xi, sig)
        q_true = sig_true * np.expm1(-xi_true * np.log1p(-p)) / xi_true
        np.testing.assert_allclose(q, q_true, rtol=0.25)


def test_loo_tiny_sample_guard():
    """S too small for a tail fit: plain truncated IS, k = NaN."""
    rng = np.random.default_rng(3)
    ll = rng.standard_normal((4, 5)) - 1.0
    out = loo_psis(ll)
    assert np.isnan(out["pareto_k"]).all()
    assert np.isfinite(out["elpd_loo"])


def test_pointwise_loglik_after_minibatch_sgld():
    """Minibatch SGLD binds symbolic dims to B; the pointwise
    evaluation must re-bind them to the full data shape."""
    from mxfusion_tpu.inference import SGLDAlgorithm, SGLDInference
    rng = np.random.default_rng(4)
    n_full = 96
    y = rng.standard_normal((n_full, 1)) + 1.0
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.0), (m.n, 1)),
                                 shape=(m.n, 1))
    alg = SGLDAlgorithm(model=m, observed=[m.y], num_samples=60,
                        num_burnin=40, num_chains=2, batch_size=16,
                        step_size=2e-4, step_decay_gamma=0.0)
    infr = SGLDInference(inference_algorithm=alg)
    infr.run(y=y, key=jax.random.PRNGKey(4))
    ll = pointwise_log_likelihood(infr, y=y)["y"]
    assert ll.shape == (120, n_full)
    draws = np.asarray(infr._samples[m.mu.uuid]).reshape(-1)
    expected = stats.norm.logpdf(y[:, 0][None, :], draws[:, None], 1.0)
    np.testing.assert_allclose(ll, expected, rtol=1e-5, atol=1e-6)


def test_pointwise_loglik_from_svgd_particles():
    from mxfusion_tpu.inference import SVGDAlgorithm, SVGDInference
    rng = np.random.default_rng(5)
    y = rng.standard_normal((N, 1)) + 1.0
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.0), (N, 1)),
                                 shape=(N, 1))
    alg = SVGDAlgorithm(model=m, observed=[m.y], num_particles=30,
                        num_iterations=300, step_size=0.1)
    infr = SVGDInference(inference_algorithm=alg)
    infr.run(y=y, key=jax.random.PRNGKey(5))
    ll = pointwise_log_likelihood(infr, has_chain_axis=False, y=y)["y"]
    assert ll.shape == (30, N)
    z = np.asarray(infr._samples[m.mu.uuid]).reshape(-1)
    expected = stats.norm.logpdf(y[:, 0][None, :], z[:, None], 1.0)
    np.testing.assert_allclose(ll, expected, rtol=1e-5, atol=1e-6)
    assert np.isfinite(waic(ll)["elpd_waic"])


def test_posterior_predictive_check_calibration():
    # well-specified model: variance statistic p-value is moderate;
    # misspecified (heavy-tailed data under a Normal model): the max
    # statistic is extreme
    import jax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.distributions import Normal
    from mxfusion_tpu.components.functions.operators import broadcast_to
    from mxfusion_tpu.inference.hmc import HMCInference, HMCAlgorithm
    from mxfusion_tpu.inference import posterior_predictive_check

    rng = np.random.default_rng(0)
    N = 80

    def fit(y):
        m = Model()
        m.mu = Normal.define_variable(mean=0., variance=100.,
                                      shape=(1,))
        m.y = Normal.define_variable(
            mean=broadcast_to(m.mu, (N, 1)),
            variance=broadcast_to(Variable(value=1.0), (N, 1)),
            shape=(N, 1))
        infr = HMCInference(HMCAlgorithm(
            model=m, observed=[m.y], num_samples=200, num_chains=2,
            num_warmup=200))
        infr.run(y=y, key=jax.random.PRNGKey(0))
        return infr

    y_good = rng.standard_normal((N, 1)) + 1.5
    ppc = posterior_predictive_check(
        fit(y_good), lambda y: y.var(), "y", y=y_good,
        key=jax.random.PRNGKey(1))
    assert 0.05 < ppc["p_value"] < 0.95, ppc["p_value"]
    assert ppc["T_rep"].shape == (400,)

    y_heavy = rng.standard_t(df=1.5, size=(N, 1)) + 1.5  # Cauchy-ish
    ppc2 = posterior_predictive_check(
        fit(y_heavy), lambda y: np.abs(y).max(), "y", y=y_heavy,
        key=jax.random.PRNGKey(2))
    assert ppc2["p_value"] < 0.05, ppc2["p_value"]
