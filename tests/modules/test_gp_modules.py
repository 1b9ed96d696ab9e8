"""GP module oracle tests.

Mirrors /root/reference/testing/modules/{gpregression,sparsegpregression,
svgpregression}_test.py, replacing the GPy oracle with hand-rolled
closed forms in numpy float64.
"""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import (GPRegression, SparseGPRegression,
                                  SVGPRegression)
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm, TransferInference,
    create_executor)


def np_rbf(X, X2, lengthscale, variance):
    Xs = X / lengthscale
    X2s = X2 / lengthscale
    r2 = ((Xs[:, None, :] - X2s[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * r2)


def _data(n=20, d=1, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.random((n, d)) * 4
    Y = np.sin(X[:, :1]) + rng.standard_normal((n, 1)) * 0.1
    return X, Y


def _build(cls, D, init_ls, init_var, init_noise, Z0=None, **kw):
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=init_noise)
    kernel = RBF(input_dim=D, variance=init_var, lengthscale=init_ls,
                 dtype="float64")
    kwargs = dict(X=m.X, kernel=kernel, noise_var=m.noise_var,
                  shape=(m.N, 1), dtype="float64", **kw)
    if Z0 is not None:
        kwargs["inducing_inputs"] = Variable(shape=Z0.shape,
                                             initial_value=Z0)
    m.Y = cls.define_variable(**kwargs)
    return m


def _log_pdf_value(m, X, Y):
    """Evaluate the module's log_pdf through the real executor."""
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, Y],
                    jax.random.PRNGKey(0))
    return -float(loss)  # MAP loss = -log_pdf; priors here are flat


def test_gp_regression_log_pdf_vs_closed_form():
    X, Y = _data()
    ls, var, noise = 0.9, 1.3, 0.04
    m = _build(GPRegression, 1, ls, var, noise)
    result = _log_pdf_value(m, X, Y)
    K = np_rbf(X, X, ls, var) + noise * np.eye(len(X))
    expected = stats.multivariate_normal.logpdf(Y[:, 0], np.zeros(len(X)),
                                                K)
    assert np.isclose(result, expected, rtol=1e-6)


def test_gp_regression_prediction_vs_closed_form():
    X, Y = _data()
    ls, var, noise = 0.9, 1.3, 0.04
    m = _build(GPRegression, 1, ls, var, noise)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    # a single zero-lr step populates the posterior cache
    infr.run(max_iter=1, learning_rate=0.0, X=X, Y=Y)
    Xt = np.linspace(0, 4, 7)[:, None]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, v = pred.run(X=Xt)[0]
    K = np_rbf(X, X, ls, var) + noise * np.eye(len(X))
    Kxt = np_rbf(X, Xt, ls, var)
    Kinv = np.linalg.inv(K)
    mu_exp = Kxt.T @ Kinv @ Y
    v_exp = var - np.einsum("nm,nk,km->m", Kxt, Kinv, Kxt)
    assert np.allclose(np.asarray(mu)[0], mu_exp, rtol=1e-5, atol=1e-6)
    assert np.allclose(np.asarray(v)[0], v_exp, rtol=1e-4, atol=1e-6)


def test_sparse_gp_collapsed_bound_vs_closed_form():
    """Titsias bound: logN(y|0, Qnn + σ²I) − tr(Knn − Qnn)/(2σ²)."""
    X, Y = _data(n=25)
    Z0 = np.linspace(0.2, 3.8, 6)[:, None]
    ls, var, noise = 0.9, 1.3, 0.04
    m = _build(SparseGPRegression, 1, ls, var, noise, Z0=Z0, jitter=0.0)
    result = _log_pdf_value(m, X, Y)
    Kuu = np_rbf(Z0, Z0, ls, var)
    Kuf = np_rbf(Z0, X, ls, var)
    Qnn = Kuf.T @ np.linalg.inv(Kuu) @ Kuf
    N = len(X)
    cov = Qnn + noise * np.eye(N)
    bound = stats.multivariate_normal.logpdf(Y[:, 0], np.zeros(N), cov) \
        - np.trace(np_rbf(X, X, ls, var) - Qnn) / (2 * noise)
    assert np.isclose(result, bound, rtol=1e-6)


def test_svgp_elbo_vs_closed_form():
    """Uncollapsed Hensman ELBO with explicit q(U) at its initial values."""
    X, Y = _data(n=25)
    M = 6
    Z0 = np.linspace(0.2, 3.8, M)[:, None]
    ls, var, noise = 0.9, 1.3, 0.04
    m = _build(SVGPRegression, 1, ls, var, noise, Z0=Z0, jitter=0.0)
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

    S = qU_W @ qU_W.T + np.diag(qU_diag)
    Kuu = np_rbf(Z0, Z0, ls, var)
    Kuf = np_rbf(Z0, X, ls, var)
    Kuu_inv = np.linalg.inv(Kuu)
    A = Kuf.T @ Kuu_inv                       # N x M
    mean_f = A @ qU_mean
    var_f = (np_rbf(X, X, ls, var).diagonal()
             - np.einsum("nm,mk,nk->n", A, Kuu, A)
             + np.einsum("nm,mk,nk->n", A, S, A))
    exp_lik = (stats.norm.logpdf(Y[:, 0], mean_f[:, 0],
                                 np.sqrt(noise)).sum()
               - (var_f / (2 * noise)).sum())
    KL = 0.5 * (np.trace(Kuu_inv @ S)
                + (qU_mean[:, 0] @ Kuu_inv @ qU_mean[:, 0])
                - M + np.linalg.slogdet(Kuu)[1]
                - np.linalg.slogdet(S)[1])
    expected = exp_lik - KL
    assert np.isclose(result, expected, rtol=1e-6)


def test_gp_module_draw_samples():
    X, _ = _data()
    m = _build(GPRegression, 1, 1.0, 1.0, 0.01)
    from mxfusion_tpu.inference import ForwardSamplingAlgorithm, Inference
    alg = ForwardSamplingAlgorithm(model=m, observed=[m.X],
                                   num_samples=8,
                                   target_variables=[m.Y.uuid])
    infr = Inference(inference_algorithm=alg)
    (samples,) = infr.run(X=X, key=jax.random.PRNGKey(0))
    assert np.asarray(samples).shape == (8, len(X), 1)
