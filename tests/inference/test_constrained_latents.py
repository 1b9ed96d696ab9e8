"""MAP and meanfield SVI over constrained latents.

MAP's point-mass locations carry the latent's support transformation
(a free location over a Gamma latent walks negative and NaNs the
prior); create_Gaussian_meanfield picks the factor family by support
(Normal / LogNormal / LogitNormal — ADVI-style). Conjugate posteriors
give exact modes and near-exact moments to pin both."""
import numpy as np

from mxfusion_tpu import Model
from mxfusion_tpu.components.distributions import (Gamma, Exponential,
                                                   Beta, Bernoulli,
                                                   LogNormal,
                                                   LogitNormal)
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (GradBasedInference, MAP,
                                    StochasticVariationalInference,
                                    create_Gaussian_meanfield)


def _gamma_exponential(seed=0, n=60):
    rng = np.random.default_rng(seed)
    y = rng.exponential(1.0 / 1.7, (n, 1))
    m = Model()
    m.tau = Gamma.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.tau, (n, 1)), shape=(n, 1))
    return m, y


def test_map_gamma_latent_hits_posterior_mode():
    m, y = _gamma_exponential()
    N = y.shape[0]
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(alg)
    infr.run(y=y, max_iter=1000, learning_rate=0.05, verbose=False)
    loc = alg.posterior[m.tau].factor.location
    tau = float(np.asarray(infr.params[loc]).ravel()[0])
    mode = (2 + N - 1) / (2 + y.sum())
    np.testing.assert_allclose(tau, mode, rtol=1e-3)
    assert tau > 0


def test_map_beta_latent_hits_posterior_mode():
    rng = np.random.default_rng(1)
    N = 50
    y = (rng.random((N, 1)) < 0.3).astype(np.float64)
    m = Model()
    m.p = Beta.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Bernoulli.define_variable(
        prob_true=broadcast_to(m.p, (N, 1)), shape=(N, 1))
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(alg)
    infr.run(y=y, max_iter=1000, learning_rate=0.05, verbose=False)
    loc = alg.posterior[m.p].factor.location
    p = float(np.asarray(infr.params[loc]).ravel()[0])
    k = y.sum()
    mode = (2 + k - 1) / (2 + 2 + N - 2)
    np.testing.assert_allclose(p, mode, atol=1e-3)
    assert 0 < p < 1


def test_meanfield_family_follows_support():
    m, y = _gamma_exponential()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    assert isinstance(q.tau.factor, LogNormal)

    m2 = Model()
    m2.p = Beta.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m2.y = Bernoulli.define_variable(
        prob_true=broadcast_to(m2.p, (10, 1)), shape=(10, 1))
    q2 = create_Gaussian_meanfield(model=m2, observed=[m2.y])
    assert isinstance(q2.p.factor, LogitNormal)


def test_advi_meanfield_matches_conjugate_gamma_posterior():
    m, y = _gamma_exponential()
    N = y.shape[0]
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=20, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(y=y, max_iter=2000, learning_rate=0.05, verbose=False)
    mu = float(np.asarray(infr.params[q.tau.factor.mean]).ravel()[0])
    var = float(np.asarray(
        infr.params[q.tau.factor.variance]).ravel()[0])
    Eq = np.exp(mu + var / 2.0)
    Vq = (np.exp(var) - 1.0) * Eq ** 2
    a, b = 2 + N, 2 + y.sum()
    np.testing.assert_allclose(Eq, a / b, rtol=0.05)
    np.testing.assert_allclose(Vq, a / b ** 2, rtol=0.35)


def test_laplace_over_constrained_latent_matches_exact_evidence():
    # Gamma-Exponential has closed-form evidence:
    # p(y) = b^a Gamma(a+N) / (Gamma(a) (b+sum y)^(a+N)).
    # The Laplace estimate around the (support-transformed) MAP must
    # land within O(1/a_post) of it.
    from scipy.special import gammaln
    from mxfusion_tpu.inference.laplace import laplace_approximation
    m, y = _gamma_exponential(seed=7)
    N = y.shape[0]
    infr = GradBasedInference(MAP(model=m, observed=[m.y]))
    infr.run(y=y, max_iter=2000, learning_rate=0.05, verbose=False)
    res = laplace_approximation(infr, y=y)
    a, b = 2.0, 2.0
    exact = (a * np.log(b) + gammaln(a + N) - gammaln(a)
             - (a + N) * np.log(b + y.sum()))
    np.testing.assert_allclose(res.log_evidence, exact, atol=0.05)


def _dirichlet_categorical(seed=3, n=120, K=3, alpha=2.0):
    rng = np.random.default_rng(seed)
    p_true = np.array([0.6, 0.3, 0.1])
    y = rng.choice(K, size=(n, 1), p=p_true).astype(np.float64)
    from mxfusion_tpu.components.distributions import (Dirichlet,
                                                       Categorical)
    from mxfusion_tpu.components.functions.operators import log
    m = Model()
    m.p = Dirichlet.define_variable(alpha=np.full(K, alpha), shape=(K,))
    m.y = Categorical.define_variable(
        log_prob=log(broadcast_to(m.p, (n, K))), num_classes=K,
        shape=(n, 1))
    counts = np.bincount(y.ravel().astype(int), minlength=K)
    return m, y, counts


def test_map_dirichlet_latent_hits_posterior_mode():
    """Simplex-support MAP: the point-mass location is softmax-
    constrained, so the optimizer stays on the simplex and lands on
    the conjugate Dirichlet posterior mode."""
    K, alpha = 3, 2.0
    m, y, counts = _dirichlet_categorical(K=K, alpha=alpha)
    N = y.shape[0]
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(alg)
    infr.run(y=y, max_iter=1500, learning_rate=0.05, verbose=False)
    loc = alg.posterior[m.p].factor.location
    p = np.asarray(infr.params[loc]).ravel()
    assert np.all(p > 0) and np.isclose(p.sum(), 1.0)
    mode = (alpha + counts - 1) / (K * alpha + N - K)
    np.testing.assert_allclose(p, mode, atol=2e-3)


def test_meanfield_simplex_family_and_conjugate_posterior():
    """Simplex-support SVI: the factor family is StickBreakingNormal
    and the fitted posterior's moments track the conjugate Dirichlet
    posterior."""
    import jax
    from mxfusion_tpu.components.distributions import \
        StickBreakingNormal
    K, alpha = 3, 2.0
    m, y, counts = _dirichlet_categorical(K=K, alpha=alpha)
    N = y.shape[0]
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    assert isinstance(q.p.factor, StickBreakingNormal)
    alg = StochasticVariationalInference(num_samples=20, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(y=y, max_iter=2000, learning_rate=0.05, verbose=False)
    # moments of q via sampling the fitted factor
    env = {q.p.factor.mean.uuid:
           np.asarray(infr.params[q.p.factor.mean])[None],
           q.p.factor.variance.uuid:
           np.asarray(infr.params[q.p.factor.variance])[None]}
    s = np.asarray(q.p.factor.draw_samples(
        env, jax.random.PRNGKey(0), num_samples=100_000))
    post_alpha = alpha + counts
    post_mean = post_alpha / post_alpha.sum()
    a0 = post_alpha.sum()
    post_var = post_alpha * (a0 - post_alpha) / (a0 ** 2 * (a0 + 1))
    np.testing.assert_allclose(s.mean(0), post_mean, atol=0.03)
    np.testing.assert_allclose(s.var(0), post_var, rtol=0.5)
