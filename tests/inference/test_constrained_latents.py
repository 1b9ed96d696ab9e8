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
