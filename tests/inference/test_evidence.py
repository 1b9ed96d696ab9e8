"""Thermodynamic-integration evidence (power posteriors).

Oracles: conjugate models with CLOSED-FORM marginal likelihoods —
Gamma-Exponential (positive latent through the log bijector) and
Beta-Bernoulli (unit-interval latent through the logit bijector). The
posterior-rung samples must simultaneously match the conjugate
posterior."""
import numpy as np
import jax
import pytest
from scipy.special import gammaln, betaln

from mxfusion_tpu import Model
from mxfusion_tpu.components.distributions import (Gamma, Exponential,
                                                   Beta, Bernoulli)
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (PowerPosteriorInference,
                                    PowerPosteriorAlgorithm)


def test_ti_evidence_gamma_exponential():
    rng = np.random.default_rng(1)
    N = 60
    y = rng.exponential(1.0 / 1.7, (N, 1))
    m = Model()
    m.tau = Gamma.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.tau, (N, 1)), shape=(N, 1))
    infr = PowerPosteriorInference(PowerPosteriorAlgorithm(
        model=m, observed=[m.y], num_samples=600, num_warmup=400,
        num_chains=2, num_temps=16))
    s = infr.run(y=y, key=jax.random.PRNGKey(0))
    a, b = 2.0, 2.0
    exact = (a * np.log(b) + gammaln(a + N) - gammaln(a)
             - (a + N) * np.log(b + y.sum()))
    np.testing.assert_allclose(infr.log_evidence, exact, atol=0.15)
    # the beta=1 rung is a valid posterior sampler at the same time
    tau = np.asarray(s[m.tau.uuid]).reshape(-1)
    np.testing.assert_allclose(tau.mean(), (a + N) / (b + y.sum()),
                               rtol=0.05)
    assert infr.diagnostics["swap_accept_rate"].min() > 0.3


def test_ti_evidence_beta_bernoulli():
    rng = np.random.default_rng(2)
    N = 40
    y = (rng.random((N, 1)) < 0.3).astype(np.float64)
    k = y.sum()
    m = Model()
    m.p = Beta.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Bernoulli.define_variable(
        prob_true=broadcast_to(m.p, (N, 1)), shape=(N, 1))
    infr = PowerPosteriorInference(PowerPosteriorAlgorithm(
        model=m, observed=[m.y], num_samples=600, num_warmup=400,
        num_chains=2, num_temps=16))
    infr.run(y=y, key=jax.random.PRNGKey(1))
    exact = betaln(2 + k, 2 + N - k) - betaln(2, 2)
    np.testing.assert_allclose(infr.log_evidence, exact, atol=0.15)


def test_ti_requires_two_rungs():
    m = Model()
    m.tau = Gamma.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.tau, (5, 1)), shape=(5, 1))
    with pytest.raises(ValueError, match="num_temps"):
        PowerPosteriorAlgorithm(model=m, observed=[m.y], num_temps=1)


@pytest.mark.slow
def test_ti_evidence_agrees_with_laplace_on_gp_module():
    # no closed form here: a GP-module marginal likelihood with a
    # Gamma prior on the noise — two INDEPENDENT evidence estimators
    # (quadratic approximation vs thermodynamic integration) must
    # agree within Laplace's O(1/n) error budget
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import GPRegression
    from mxfusion_tpu.inference import GradBasedInference, MAP
    from mxfusion_tpu.inference.laplace import laplace_approximation
    rng = np.random.default_rng(3)
    N = 40
    X = np.sort(rng.random((N, 1)) * 4, 0)
    Y = np.sin(2 * X) + rng.standard_normal((N, 1)) * 0.1

    def build():
        m = Model()
        m.n = __import__("mxfusion_tpu").Variable()
        m.X = __import__("mxfusion_tpu").Variable(shape=(m.n, 1))
        m.noise_var = Gamma.define_variable(alpha=2.0, beta=20.0,
                                            shape=(1,))
        m.Y = GPRegression.define_variable(
            X=m.X, kernel=RBF(input_dim=1, variance=1.0,
                              lengthscale=1.0),
            noise_var=m.noise_var, shape=(m.n, 1))
        return m

    m1 = build()
    map_infr = GradBasedInference(MAP(model=m1, observed=[m1.X, m1.Y]))
    map_infr.run(X=X, Y=Y, max_iter=1500, learning_rate=0.03,
                 verbose=False)
    lap = laplace_approximation(map_infr, X=X, Y=Y)

    m2 = build()
    ti = PowerPosteriorInference(PowerPosteriorAlgorithm(
        model=m2, observed=[m2.X, m2.Y], num_samples=600,
        num_warmup=400, num_chains=2, num_temps=16))
    ti.run(X=X, Y=Y, key=jax.random.PRNGKey(5))
    # one scalar latent: Laplace is accurate to O(1/curvature) here
    np.testing.assert_allclose(ti.log_evidence, lap.log_evidence,
                               atol=0.3)
