"""Samplers over models CONTAINING modules.

The module factor marginalizes its internals (exact GP: collapsed
marginal likelihood), so an MCMC chain over the remaining latents —
e.g. kernel/noise hyperparameters with priors — is exactly Bayesian
hyperparameter inference. Regression guards for two fixes: (a)
FactorGraph.draw_samples skips module factors whose outputs are
observed (chain init used to crash), (b) sampler env copies stay
VariableEnv so module algorithms can look up by Variable key."""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Gamma
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression
from mxfusion_tpu.inference.hmc import HMCInference, HMCAlgorithm
from mxfusion_tpu.inference.svgd import SVGDInference, SVGDAlgorithm


def _gp_model():
    rng = np.random.default_rng(0)
    N = 40
    X = np.sort(rng.random((N, 1)) * 4, 0)
    Y = np.sin(2 * X) + rng.standard_normal((N, 1)) * 0.1
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.noise_var = Gamma.define_variable(alpha=2.0, beta=20.0, shape=(1,))
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1))
    return m, X, Y


def test_hmc_over_gp_module_hyperparameter():
    m, X, Y = _gp_model()
    infr = HMCInference(HMCAlgorithm(
        model=m, observed=[m.X, m.Y], num_samples=200, num_chains=2,
        num_warmup=200))
    samples = infr.run(X=X, Y=Y, key=jax.random.PRNGKey(0))
    (nv,) = samples.values()
    nv = np.asarray(nv)
    assert nv.shape == (200, 2, 1)
    assert np.all(nv > 0)
    # true noise var is 0.01; the prior mean is 0.1 — the data must
    # have pulled the posterior well below the prior
    post_mean = nv.mean()
    assert 0.005 < post_mean < 0.05, post_mean
    assert infr.diagnostics["accept_rate"].min() > 0.5


def test_svgd_over_gp_module_hyperparameter():
    m, X, Y = _gp_model()
    infr = SVGDInference(SVGDAlgorithm(
        model=m, observed=[m.X, m.Y], num_particles=16,
        num_iterations=150, step_size=0.05))
    particles = infr.run(X=X, Y=Y, key=jax.random.PRNGKey(1))
    (nv,) = particles.values()
    nv = np.asarray(nv)
    assert nv.shape == (16, 1)
    assert 0.003 < nv.mean() < 0.06, nv.mean()


# ---- conjugate oracles for the support bijectors (the Jacobian must
# be exactly right, not just NaN-free) ------------------------------

def test_hmc_beta_bernoulli_conjugate():
    # p ~ Beta(2, 2); y_i ~ Bern(p). Posterior: Beta(2+k, 2+N-k).
    from mxfusion_tpu.components.distributions import Beta, Bernoulli
    from mxfusion_tpu.components.functions.operators import broadcast_to
    rng = np.random.default_rng(0)
    N = 50
    y = (rng.random((N, 1)) < 0.3).astype(np.float64)
    k = y.sum()
    m = Model()
    m.p = Beta.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Bernoulli.define_variable(
        prob_true=broadcast_to(m.p, (N, 1)), shape=(N, 1))
    infr = HMCInference(HMCAlgorithm(
        model=m, observed=[m.y], num_samples=1000, num_chains=4,
        num_warmup=500))
    samples = infr.run(y=y, key=jax.random.PRNGKey(0))
    p = np.asarray(samples[m.p.uuid]).reshape(-1)
    assert np.all((p > 0) & (p < 1))
    a, b = 2 + k, 2 + N - k
    np.testing.assert_allclose(p.mean(), a / (a + b), atol=0.02)
    np.testing.assert_allclose(
        p.var(), a * b / ((a + b) ** 2 * (a + b + 1)), rtol=0.3)


def test_hmc_gamma_exponential_conjugate():
    # tau ~ Gamma(2, 2); y_i ~ Exp(tau). Posterior: Gamma(2+N, 2+Σy).
    from mxfusion_tpu.components.distributions import Gamma, Exponential
    from mxfusion_tpu.components.functions.operators import broadcast_to
    rng = np.random.default_rng(1)
    N = 60
    y = rng.exponential(1.0 / 1.7, (N, 1))
    m = Model()
    m.tau = Gamma.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.tau, (N, 1)), shape=(N, 1))
    infr = HMCInference(HMCAlgorithm(
        model=m, observed=[m.y], num_samples=1000, num_chains=4,
        num_warmup=500))
    samples = infr.run(y=y, key=jax.random.PRNGKey(2))
    tau = np.asarray(samples[m.tau.uuid]).reshape(-1)
    assert np.all(tau > 0)
    a, b = 2 + N, 2 + y.sum()
    np.testing.assert_allclose(tau.mean(), a / b, rtol=0.05)
    np.testing.assert_allclose(tau.var(), a / b ** 2, rtol=0.35)


def test_chees_gamma_exponential_conjugate():
    from mxfusion_tpu.components.distributions import Gamma, Exponential
    from mxfusion_tpu.components.functions.operators import broadcast_to
    from mxfusion_tpu.inference.chees import (ChEESHMCInference,
                                              ChEESHMCAlgorithm)
    rng = np.random.default_rng(3)
    N = 60
    y = rng.exponential(1.0 / 1.7, (N, 1))
    m = Model()
    m.tau = Gamma.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.tau, (N, 1)), shape=(N, 1))
    infr = ChEESHMCInference(ChEESHMCAlgorithm(
        model=m, observed=[m.y], num_samples=600, num_chains=8,
        num_warmup=400))
    samples = infr.run(y=y, key=jax.random.PRNGKey(4))
    tau = np.asarray(samples[m.tau.uuid]).reshape(-1)
    a, b = 2 + N, 2 + y.sum()
    np.testing.assert_allclose(tau.mean(), a / b, rtol=0.05)


def test_sgld_gamma_exponential_conjugate():
    from mxfusion_tpu.components.distributions import Gamma, Exponential
    from mxfusion_tpu.components.functions.operators import broadcast_to
    from mxfusion_tpu.inference.sgld import (SGLDInference,
                                             SGLDAlgorithm)
    rng = np.random.default_rng(5)
    N = 60
    y = rng.exponential(1.0 / 1.7, (N, 1))
    m = Model()
    m.tau = Gamma.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.tau, (N, 1)), shape=(N, 1))
    infr = SGLDInference(SGLDAlgorithm(
        model=m, observed=[m.y], num_samples=2000, num_chains=4,
        num_burnin=1000, batch_size=None, step_size=5e-4))
    samples = infr.run(y=y, key=jax.random.PRNGKey(6))
    tau = np.asarray(samples[m.tau.uuid]).reshape(-1)
    a, b = 2 + N, 2 + y.sum()
    # Langevin with finite step: looser tolerance
    np.testing.assert_allclose(tau.mean(), a / b, rtol=0.1)


def test_simplex_bijector_round_trip_and_jacobian():
    # stick-breaking: constrain(unconstrain(x)) == x, and the Jacobian
    # matches the numerical logdet of the (K-1)x(K-1) forward map
    from mxfusion_tpu.inference.hmc import SupportTransforms
    import jax.numpy as jnp
    tr = SupportTransforms({"u": "simplex"})
    rng = np.random.default_rng(0)
    for K in (2, 3, 6):
        x = rng.dirichlet(np.ones(K) * 1.5, size=(4,))
        z = tr.unconstrain({"u": jnp.asarray(x)})["u"]
        assert z.shape == (4, K - 1)
        x2 = tr.constrain({"u": z})["u"]
        np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-9,
                                   atol=1e-12)
        # numerical Jacobian of z -> x_head (first K-1 coords)
        def fwd(zrow):
            return np.asarray(tr.constrain(
                {"u": jnp.asarray(zrow)[None]})["u"])[0, :-1]
        z0 = np.asarray(z)[0]
        eps = 1e-6
        J = np.stack([(fwd(z0 + eps * np.eye(K - 1)[i]) -
                       fwd(z0 - eps * np.eye(K - 1)[i])) / (2 * eps)
                      for i in range(K - 1)], axis=1)
        num_logdet = np.linalg.slogdet(J)[1]
        ana = float(np.asarray(tr.log_jacobian(
            {"u": jnp.asarray(z0)[None]})).ravel()[0])
        np.testing.assert_allclose(ana, num_logdet, rtol=1e-5)


def test_hmc_dirichlet_categorical_conjugate():
    # p ~ Dir(2, 2, 2); y_i ~ Cat(p). Posterior: Dir(2 + counts).
    from mxfusion_tpu.components.distributions import (Dirichlet,
                                                       Categorical)
    from mxfusion_tpu.components.functions.operators import (
        log, broadcast_to)
    rng = np.random.default_rng(2)
    K, N = 3, 90
    labels = rng.choice(K, size=N, p=[0.6, 0.3, 0.1])
    Y = np.eye(K)[labels]
    counts = Y.sum(0)
    m = Model()
    m.p = Dirichlet.define_variable(
        alpha=Variable(value=np.full(K, 2.0)), shape=(K,))
    m.y = Categorical.define_variable(
        log_prob=broadcast_to(log(m.p), (N, K)), num_classes=K,
        one_hot_encoding=True, normalization=True, shape=(N, K))
    infr = HMCInference(HMCAlgorithm(
        model=m, observed=[m.y], num_samples=800, num_chains=4,
        num_warmup=500))
    samples = infr.run(y=Y, key=jax.random.PRNGKey(3))
    p = np.asarray(samples[m.p.uuid]).reshape(-1, K)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-6)
    alpha_post = 2.0 + counts
    a0 = alpha_post.sum()
    np.testing.assert_allclose(p.mean(0), alpha_post / a0, atol=0.02)
    var_exact = alpha_post * (a0 - alpha_post) / (a0 ** 2 * (a0 + 1))
    np.testing.assert_allclose(p.var(0), var_exact, rtol=0.3)


def test_drivers_attach_rhat_diagnostics():
    m, X, Y = _gp_model()
    infr = HMCInference(HMCAlgorithm(
        model=m, observed=[m.X, m.Y], num_samples=100, num_chains=2,
        num_warmup=100))
    infr.run(X=X, Y=Y, key=jax.random.PRNGKey(0))
    assert "r_hat_max" in infr.diagnostics
    assert infr.diagnostics["r_hat_max"] < 1.2
    (rh,) = infr.diagnostics["r_hat"].values()
    assert np.all(np.asarray(rh) > 0.9)
