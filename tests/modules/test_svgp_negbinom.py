"""SVGPNegBinomialRegression and the NegativeBinomial distribution:
scipy oracle, quadrature ELBO vs numpy, overdispersion recovery.
"""
import numpy as np
import jax
from scipy import stats
from scipy.special import gammaln as np_gammaln

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import NegativeBinomial
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPNegBinomialRegression
from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                    TransferInference, create_executor)
from mxfusion_tpu.inference.prediction import ModulePredictionAlgorithm
from mxfusion_tpu.util.testutils import prepare_runtime_array


def test_negative_binomial_log_pdf_vs_scipy():
    """Mean/dispersion NB vs scipy.stats.nbinom (n=r, p=r/(r+mu))."""
    rng = np.random.default_rng(0)
    mu = rng.random((7, 1)) * 5 + 0.5
    alpha = rng.random((7, 1)) * 2 + 0.1
    y = rng.integers(0, 20, (7, 1)).astype(np.float64)

    m_v, d_v = Variable(), Variable()
    dist = NegativeBinomial(mean=m_v, dispersion=d_v, dtype="float64")
    dist._generate_outputs(shape=(7, 1))
    env = {m_v.uuid: prepare_runtime_array(mu, False, "float64"),
           d_v.uuid: prepare_runtime_array(alpha, False, "float64"),
           dist.random_variable.uuid: prepare_runtime_array(
               y[None], True, "float64")}
    got = np.asarray(dist.log_pdf(env)).ravel()
    r = 1.0 / alpha
    expected = stats.nbinom.logpmf(y, r, r / (r + mu)).ravel()
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)


def test_negative_binomial_sampling_moments():
    """Gamma-Poisson mixture sampling: E[y] = mu, Var[y] = mu + a mu^2."""
    mu, alpha = 4.0, 0.5
    m_v, d_v = Variable(), Variable()
    dist = NegativeBinomial(mean=m_v, dispersion=d_v, dtype="float64")
    dist._generate_outputs(shape=(1,))
    import jax.numpy as jnp
    env = {m_v.uuid: jnp.full((1, 1), mu),
           d_v.uuid: jnp.full((1, 1), alpha)}
    s = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                     num_samples=200_000)).ravel()
    assert np.all(s >= 0) and np.allclose(s, np.round(s))
    np.testing.assert_allclose(s.mean(), mu, rtol=0.02)
    np.testing.assert_allclose(s.var(), mu + alpha * mu ** 2, rtol=0.05)


def _nb_data(n=200, alpha=0.6, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.random((n, 1)) * 4, 0)
    rate = np.exp(np.sin(X[:, 0]) + 1.0)
    r = 1.0 / alpha
    g = rng.gamma(r, rate * alpha)          # Gamma-Poisson mixture
    Y = rng.poisson(g)[:, None].astype(np.float64)
    return X, Y, rate


def test_negbinom_elbo_vs_numpy_quadrature():
    """Quadrature ELBO at the initial q(U) against an independent
    numpy Gauss-Hermite computation of the same expectation."""
    X, Y, _ = _nb_data(n=25)
    M, ls, var = 6, 0.9, 1.3
    Z0 = np.linspace(0.2, 3.8, M)[:, None]
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.Y = SVGPNegBinomialRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=var, lengthscale=ls,
                          dtype="float64"),
        shape=(m.N, 1), dtype="float64", jitter=0.0, dispersion=0.4,
        num_quadrature_points=30,
        inducing_inputs=Variable(shape=(M, 1), initial_value=Z0))
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    post = m.Y.factor._extra_graphs[0]
    qU_mean = np.asarray(infr.params[post.qU_mean])
    qU_W = np.asarray(infr.params[post.qU_cov_W])
    qU_diag = np.asarray(infr.params[post.qU_cov_diag])
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, Y],
                    jax.random.PRNGKey(0))
    result = -float(loss)

    def np_rbf(A, B):
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1) / ls ** 2
        return var * np.exp(-0.5 * d2)

    S = qU_W @ qU_W.T + np.diag(qU_diag)
    Kuu = np_rbf(Z0, Z0)
    Kuf = np_rbf(Z0, X)
    Kuu_inv = np.linalg.inv(Kuu)
    A = Kuf.T @ Kuu_inv
    mu_f = (A @ qU_mean)[:, 0]
    var_f = (np_rbf(X, X).diagonal()
             - np.einsum("nm,mk,nk->n", A, Kuu, A)
             + np.einsum("nm,mk,nk->n", A, S, A))
    t, w = np.polynomial.hermite.hermgauss(30)
    w = w / np.sqrt(np.pi)
    f = mu_f[:, None] + np.sqrt(2 * var_f)[:, None] * t
    rr = 1.0 / 0.4
    y = Y[:, 0][:, None]
    mu = np.exp(f)
    log_lik = (np_gammaln(y + rr) - np_gammaln(rr) - np_gammaln(y + 1)
               + rr * np.log(rr) - (y + rr) * np.log(rr + mu)
               + y * f)
    exp_lik = (log_lik * w).sum()
    M_ = M
    KL = 0.5 * (np.trace(Kuu_inv @ S)
                + qU_mean[:, 0] @ Kuu_inv @ qU_mean[:, 0]
                - M_ + np.linalg.slogdet(Kuu)[1]
                - np.linalg.slogdet(S)[1])
    np.testing.assert_allclose(result, exp_lik - KL, rtol=1e-6)


def test_negbinom_training_recovers_rate_and_dispersion():
    X, Y, rate = _nb_data(n=300, alpha=0.6, seed=2)
    M = 12
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.Y = SVGPNegBinomialRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        shape=(m.N, 1),
        inducing_inputs=Variable(
            shape=(M, 1),
            initial_value=np.linspace(0.1, 3.9, M)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    losses = []
    infr.run(X=X, Y=Y, max_iter=800, learning_rate=0.05,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0] - 10.0
    # the trainable dispersion moved toward the generating value
    disp_var = dict(m.Y.factor.inputs)["dispersion"]
    alpha_hat = float(np.asarray(infr.params[disp_var]).ravel()[0])
    assert 0.2 < alpha_hat < 1.5, alpha_hat
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mean, var = pred.run(X=X)[0]
    mean = np.asarray(mean)[0, :, 0]
    var = np.asarray(var)[0, :, 0]
    assert np.corrcoef(mean, rate)[0, 1] > 0.85
    # overdispersion: predicted count variance well above the mean
    assert np.all(var > mean)


def test_negbinom_svgp_sampling_path():
    """draw_samples walks U -> F -> exp -> NegativeBinomial (the
    Gamma-Poisson mixture with per-point broadcast dispersion) and
    yields nonnegative integer counts."""
    X, _, _ = _nb_data(n=30)
    M = 6
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.Y = SVGPNegBinomialRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.3, lengthscale=0.9,
                          dtype="float64"),
        shape=(m.N, 1), dtype="float64", jitter=1e-5,
        inducing_inputs=Variable(
            shape=(M, 1),
            initial_value=np.linspace(0.2, 3.8, M)[:, None]))
    from mxfusion_tpu.inference import ForwardSamplingAlgorithm, Inference
    alg = ForwardSamplingAlgorithm(model=m, observed=[m.X],
                                   num_samples=8,
                                   target_variables=[m.Y.uuid])
    infr = Inference(inference_algorithm=alg, dtype="float64")
    (samples,) = infr.run(X=X, key=jax.random.PRNGKey(0))
    s = np.asarray(samples)
    assert s.shape == (8, 30, 1)
    assert np.all(s >= 0)
    assert np.allclose(s, np.round(s))


def test_nb_log_pmf_overflow_free_at_tail_nodes():
    """nb_log_pmf takes log-space mu: at float32 a Gauss-Hermite tail
    node f ~ 120 would overflow exp(f) to inf — the logaddexp form must
    stay finite and match the f64 closed form (r4 advisor finding)."""
    import jax.numpy as jnp
    from mxfusion_tpu.components.distributions.negative_binomial import \
        nb_log_pmf
    f = jnp.asarray([120.0, -120.0, 3.0], dtype=jnp.float32)
    y = jnp.asarray([2.0, 0.0, 5.0], dtype=jnp.float32)
    alpha = jnp.asarray(0.5, dtype=jnp.float32)
    got = np.asarray(nb_log_pmf(y, f, alpha), dtype=np.float64)
    assert np.all(np.isfinite(got)), got
    # f64 closed form via scipy at the same (y, mu, alpha)
    r = 2.0
    mu = np.exp(np.asarray(f, dtype=np.float64))
    expected = stats.nbinom.logpmf(np.asarray(y, np.float64), r,
                                   r / (r + mu))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_negbinom_per_point_dispersion_bound_and_prediction():
    """A per-point dispersion Variable (shape (N, 1)) flows through the
    quadrature bound and the prediction without reshape errors, and
    reduces to the scalar result when all entries are equal (r4
    advisor finding: the old scalar-only reshape raised)."""
    X, Y, _ = _nb_data(n=40)
    M = 6
    Z0 = np.linspace(0.2, 3.8, M)[:, None]

    def build(disp):
        m = Model()
        m.N = Variable()
        m.X = Variable(shape=(m.N, 1))
        m.Y = SVGPNegBinomialRegression.define_variable(
            X=m.X, kernel=RBF(input_dim=1, variance=1.3, lengthscale=0.9,
                              dtype="float64"),
            shape=(m.N, 1), dtype="float64", jitter=0.0,
            dispersion=disp,
            inducing_inputs=Variable(shape=(M, 1), initial_value=Z0))
        alg = MAP(model=m, observed=[m.X, m.Y])
        infr = GradBasedInference(inference_algorithm=alg,
                                  dtype="float64")
        infr.initialize(X=X, Y=Y)
        ex = create_executor(alg, infr.params)
        loss, _, _ = ex(infr.params.trainable_params(),
                        infr.params.fixed_params(), [X, Y],
                        jax.random.PRNGKey(0))
        pred = TransferInference(ModulePredictionAlgorithm(
            model=m, observed=[m.X], target_variables=[m.Y.uuid]),
            infr_params=infr.params)
        mean, var = pred.run(X=X)[0]
        return float(loss), np.asarray(mean), np.asarray(var)

    l_scalar, mu_s, var_s = build(0.4)
    l_vec, mu_v, var_v = build(Variable(
        shape=(40, 1), initial_value=np.full((40, 1), 0.4)))
    np.testing.assert_allclose(l_vec, l_scalar, rtol=1e-10)
    np.testing.assert_allclose(mu_v, mu_s, rtol=1e-10)
    np.testing.assert_allclose(var_v, var_s, rtol=1e-10)

    # genuinely heterogeneous dispersion also evaluates finitely
    disp = np.linspace(0.1, 1.2, 40)[:, None]
    l_h, mu_h, var_h = build(Variable(shape=(40, 1),
                                      initial_value=disp))
    assert np.isfinite(l_h)
    assert np.all(np.isfinite(var_h))
    assert not np.allclose(var_h, var_s)
