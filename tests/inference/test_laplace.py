"""Laplace approximation tests.

On linear-Gaussian models the Laplace approximation is EXACT: the
posterior is Gaussian (mean/cov in closed form) and the log evidence is
the exact marginal likelihood — a machine-precision oracle.
"""
import numpy as np
import jax
import pytest
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.inference import (GradBasedInference, MAP,
                                    laplace_approximation)
from mxfusion_tpu.common.exceptions import InferenceError


def _fit_linreg(N=40, D=3, s2=0.25, seed=0, max_iter=3000):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, D))
    w_true = rng.standard_normal((D, 1))
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
    alg = MAP(model=m, observed=[m.X, m.y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.run(max_iter=max_iter, learning_rate=0.05, X=X, y=y,
             key=jax.random.PRNGKey(0))
    return m, infr, X, y, s2


def test_laplace_exact_on_linear_gaussian():
    m, infr, X, y, s2 = _fit_linreg()
    N, D = X.shape
    res = laplace_approximation(infr, X=X, y=y)

    Sigma = np.linalg.inv(X.T @ X / s2 + np.eye(D))
    mu = Sigma @ X.T @ y[:, 0] / s2
    mean, cov = res.marginal(m.w)
    np.testing.assert_allclose(np.asarray(mean).reshape(-1), mu,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(cov, Sigma, rtol=1e-6, atol=1e-10)

    # exact marginal likelihood: y ~ N(0, X Xᵀ + s2 I)
    exact = stats.multivariate_normal.logpdf(
        y[:, 0], np.zeros(N), X @ X.T + s2 * np.eye(N))
    assert np.isclose(res.log_evidence, exact, rtol=1e-8), \
        (res.log_evidence, exact)


def test_laplace_evidence_selects_the_right_model():
    """Evidence comparison: data generated from a 2-feature model must
    prefer the true feature set over a pure-noise feature set."""
    rng = np.random.default_rng(1)
    N = 60
    X_good = rng.standard_normal((N, 2))
    y = (X_good @ np.array([[1.0], [-0.7]])
         + rng.standard_normal((N, 1)) * 0.3)
    X_bad = rng.standard_normal((N, 2))  # independent of y

    def evidence(X):
        m = Model()
        m.X = Variable(shape=(N, 2))
        m.w = Normal.define_variable(
            mean=broadcast_to(Variable(value=0.), (2, 1)),
            variance=broadcast_to(Variable(value=1.), (2, 1)),
            shape=(2, 1))
        m.f = dot(m.X, m.w)
        m.y = Normal.define_variable(
            mean=m.f, variance=broadcast_to(Variable(value=0.09),
                                            (N, 1)),
            shape=(N, 1))
        alg = MAP(model=m, observed=[m.X, m.y])
        infr = GradBasedInference(inference_algorithm=alg,
                                  dtype="float64")
        infr.run(max_iter=2500, learning_rate=0.05, X=X, y=y,
                 key=jax.random.PRNGKey(0))
        return laplace_approximation(infr, X=X, y=y).log_evidence

    assert evidence(X_good) > evidence(X_bad) + 10


def test_laplace_hessian_through_wide_svgp_bound():
    """Regression (r5): the wide-regime SVGP bound routes through
    guarded_forward_matmul / wide_triangular_solve, which were briefly
    a jax.custom_vjp — forward-mode AD (jax.hessian in
    laplace_approximation) raised TypeError. Now a custom_jvp: the
    Laplace pass over a module model with N >= 4M must run."""
    from mxfusion_tpu.components.distributions import Gamma
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression

    rng = np.random.default_rng(2)
    N, M = 48, 8
    X = np.sort(rng.random((N, 1)) * 4, 0)
    Y = np.sin(2 * X) + rng.standard_normal((N, 1)) * 0.1

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.noise_var = Gamma.define_variable(alpha=2.0, beta=20.0,
                                        shape=(1,))
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M, 1),
                                 initial_value=np.linspace(
                                     0, 4, M)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]),
                              dtype="float64")
    infr.run(max_iter=200, learning_rate=0.03, X=X, Y=Y,
             key=jax.random.PRNGKey(0))
    res = laplace_approximation(infr, X=X, Y=Y)
    assert np.isfinite(res.log_evidence)
    mean, cov = res.marginal(m.noise_var)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(cov)).all()


def test_laplace_disables_fused_gram(monkeypatch):
    """Regression (r5): the fused Pallas gram op is a custom_vjp, so a
    jax.hessian trace through a bound inside its envelope raises
    TypeError. laplace_approximation must force the XLA fallback for
    its own traces (pfg.disabled()). The stand-in op raises if engaged
    — the test passes iff Laplace never routes through the fused path
    even when the envelope says it could."""
    from mxfusion_tpu.components.distributions import Gamma
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.ops import pallas_fused_gram as pfg

    rng = np.random.default_rng(2)
    N, M = 48, 8
    X = np.sort(rng.random((N, 1)) * 4, 0)
    Y = np.sin(2 * X) + rng.standard_normal((N, 1)) * 0.1

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.noise_var = Gamma.define_variable(alpha=2.0, beta=20.0,
                                        shape=(1,))
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M, 1),
                                 initial_value=np.linspace(
                                     0, 4, M)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]),
                              dtype="float64")
    infr.run(max_iter=100, learning_rate=0.03, X=X, Y=Y,
             key=jax.random.PRNGKey(0))

    def _boom(*args, **kwargs):
        raise AssertionError(
            "fused gram op engaged inside a Laplace trace")

    monkeypatch.setattr(pfg, "supported", lambda *a, **k: True)
    monkeypatch.setattr(pfg, "fused_linv_rbf_gram", _boom)
    res = laplace_approximation(infr, X=X, Y=Y)
    assert np.isfinite(res.log_evidence)


def test_laplace_requires_map():
    from mxfusion_tpu.inference import (StochasticVariationalInference,
                                        create_Gaussian_meanfield)
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=10., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (5, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.), (5, 1)),
                                 shape=(5, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=2, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(max_iter=2, learning_rate=0.1, y=np.zeros((5, 1)))
    with pytest.raises(InferenceError, match="PointMass"):
        laplace_approximation(infr, y=np.zeros((5, 1)))
