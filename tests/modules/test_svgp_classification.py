"""SVGP binary classification module (beyond-reference capability).

Oracle tier: quadrature ELBO and predictive probability re-derived
independently in numpy float64; behavior tier: training separates a
nonlinear decision boundary; whitened equivalence under the variable
change m_u = L m_v, S_u = L S_v L^T."""
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPClassification
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor, ModulePredictionAlgorithm,
    TransferInference, Inference, ForwardSamplingAlgorithm)

M_IND = 6
Q_PTS = 20


def np_rbf(X, X2, lengthscale, variance):
    Xs = X / lengthscale
    X2s = X2 / lengthscale
    r2 = ((Xs[:, None, :] - X2s[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * r2)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _build(N, D, ls, var, Z0, whitened=False, jitter=0.0):
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.Y = SVGPClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=var, lengthscale=ls,
                          dtype="float64"),
        shape=(m.n, 1),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        dtype="float64", jitter=jitter, whitened=whitened,
        num_quadrature_points=Q_PTS)
    return m


def _np_q_f_moments(X, Z0, ls, var, qU_mean, S, jitter=0.0):
    Kuu = np_rbf(Z0, Z0, ls, var) + jitter * np.eye(len(Z0))
    Kuf = np_rbf(Z0, X, ls, var)
    Kuu_inv = np.linalg.inv(Kuu)
    A = Kuf.T @ Kuu_inv
    mean_f = (A @ qU_mean)[:, 0]
    var_f = (np_rbf(X, X, ls, var).diagonal()
             - np.einsum("nm,mk,nk->n", A, Kuu, A)
             + np.einsum("nm,mk,nk->n", A, S, A))
    return mean_f, var_f, Kuu, Kuu_inv


def _np_quad_expect(fn, mean_f, var_f):
    t, w = np.polynomial.hermite.hermgauss(Q_PTS)
    f = mean_f[:, None] + np.sqrt(2.0 * var_f)[:, None] * t[None, :]
    return (fn(f) * (w / np.sqrt(np.pi))[None, :]).sum(-1)


def test_svgp_classification_elbo_vs_closed_form():
    rng = np.random.default_rng(0)
    N, D, ls, var = 25, 2, 0.9, 1.3
    X = rng.random((N, D)) * 4
    y = (rng.random((N, 1)) > 0.5).astype(np.float64)
    Z0 = rng.random((M_IND, D)) * 4

    m = _build(N, D, ls, var, Z0)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=y)
    post = m.Y.factor._extra_graphs[0]
    # move q(U) off its init so every term is exercised
    rng2 = np.random.default_rng(7)
    qU_mean = rng2.standard_normal((M_IND, 1)) * 0.5
    W = rng2.standard_normal((M_IND, M_IND)) * 0.2 + np.eye(M_IND)
    diag = rng2.random(M_IND) * 0.1 + 0.05
    infr.params[post.qU_mean] = jnp.asarray(qU_mean)
    infr.params[post.qU_cov_W] = jnp.asarray(W)
    infr.params[post.qU_cov_diag] = jnp.asarray(diag)

    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, y],
                    jax.random.PRNGKey(0))
    result = -float(np.asarray(loss))

    S = W @ W.T + np.diag(diag)
    mean_f, var_f, Kuu, Kuu_inv = _np_q_f_moments(
        X, Z0, ls, var, qU_mean, S)
    sign = 2.0 * y[:, 0] - 1.0
    exp_lik = _np_quad_expect(
        lambda f: -np.log1p(np.exp(-np.clip(sign[:, None] * f,
                                            -700, 700))),
        mean_f, var_f).sum()
    KL = 0.5 * (np.trace(Kuu_inv @ S)
                + (qU_mean[:, 0] @ Kuu_inv @ qU_mean[:, 0])
                - M_IND + np.linalg.slogdet(Kuu)[1]
                - np.linalg.slogdet(S)[1])
    expected = exp_lik - KL
    assert np.isclose(result, expected, rtol=1e-6), (result, expected)


def test_svgp_classification_predictive_probability_oracle():
    rng = np.random.default_rng(1)
    N, D, ls, var = 15, 1, 1.1, 0.8
    X = rng.random((N, D)) * 4
    y = (rng.random((N, 1)) > 0.5).astype(np.float64)
    Z0 = np.linspace(0.2, 3.8, M_IND)[:, None]
    Xt = np.linspace(0.0, 4.0, 9)[:, None]

    m = _build(N, D, ls, var, Z0)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=y)
    post = m.Y.factor._extra_graphs[0]
    rng2 = np.random.default_rng(8)
    qU_mean = rng2.standard_normal((M_IND, 1))
    infr.params[post.qU_mean] = jnp.asarray(qU_mean)

    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    p, pvar = pred.run(X=Xt)[0]
    p = np.asarray(p)[0, :, 0]

    W = np.asarray(infr.params[post.qU_cov_W])
    diag = np.asarray(infr.params[post.qU_cov_diag])
    S = W @ W.T + np.diag(diag)
    mean_f, var_f, _, _ = _np_q_f_moments(Xt, Z0, ls, var, qU_mean, S)
    p_exp = _np_quad_expect(_sigmoid, mean_f, var_f)
    assert np.allclose(p, p_exp, rtol=1e-8, atol=1e-10)
    assert np.allclose(np.asarray(pvar)[0, :, 0], p_exp * (1 - p_exp),
                       rtol=1e-7)


def test_svgp_classification_trains_and_separates():
    rng = np.random.default_rng(2)
    N = 200
    X = rng.random((N, 1)) * 4
    p_true = _sigmoid(3.0 * np.sin(2.0 * X[:, :1]))
    y = (rng.random((N, 1)) < p_true).astype(np.float64)
    Z0 = np.linspace(0.1, 3.9, 12)[:, None]

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.Y = SVGPClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=2.0, lengthscale=0.7,
                          dtype="float64"),
        shape=(m.n, 1),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        dtype="float64", jitter=1e-8)
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    loss0 = float(np.asarray(infr.run(
        X=X, Y=y, max_iter=1, learning_rate=0.0, verbose=False)))
    infr2 = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    loss = float(np.asarray(infr2.run(
        X=X, Y=y, max_iter=400, learning_rate=0.05, verbose=False)))
    assert loss < loss0 - 10.0

    Xt = np.linspace(0.05, 3.95, 60)[:, None]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr2.params)
    p, _ = pred.run(X=Xt)[0]
    p = np.asarray(p)[0, :, 0]
    assert np.all((p >= 0) & (p <= 1))
    yt_true = (np.sin(2.0 * Xt[:, 0]) > 0)
    acc = ((p > 0.5) == yt_true).mean()
    assert acc > 0.85, acc


def test_svgp_classification_whitened_elbo_equivalence():
    rng = np.random.default_rng(3)
    N, D, ls, var = 20, 2, 1.0, 1.0
    X = rng.random((N, D)) * 4
    y = (rng.random((N, 1)) > 0.5).astype(np.float64)
    Z0 = rng.random((M_IND, D)) * 4
    jit = 1e-8

    m_w = _build(N, D, ls, var, Z0, whitened=True, jitter=jit)
    m_u = _build(N, D, ls, var, Z0, whitened=False, jitter=jit)

    def executor_and_params(m):
        alg = MAP(model=m, observed=[m.X, m.Y])
        infr = GradBasedInference(inference_algorithm=alg,
                                  dtype="float64")
        infr.initialize(X=X, Y=y)
        return create_executor(alg, infr.params), infr

    ex_w, infr_w = executor_and_params(m_w)
    ex_u, infr_u = executor_and_params(m_u)

    rng2 = np.random.default_rng(9)
    m_v = rng2.standard_normal((M_IND, 1))
    W_v = rng2.standard_normal((M_IND, M_IND)) * 0.3 + np.eye(M_IND)
    d_small = 1e-12
    Kuu = np_rbf(Z0, Z0, ls, var) + jit * np.eye(M_IND)
    L = np.linalg.cholesky(Kuu)
    S_v = W_v @ W_v.T + d_small * np.eye(M_IND)
    Ls_v = np.linalg.cholesky(S_v)

    def set_q(infr, m, mean, W):
        q = m.Y.factor._extra_graphs[0]
        infr.params[q.qU_mean] = jnp.asarray(mean)
        infr.params[q.qU_cov_W] = jnp.asarray(W)
        infr.params[q.qU_cov_diag] = jnp.asarray(np.full(M_IND, d_small))

    set_q(infr_w, m_w, m_v, W_v)
    set_q(infr_u, m_u, L @ m_v, L @ Ls_v)
    lw, _, _ = ex_w(infr_w.params.trainable_params(),
                    infr_w.params.fixed_params(), [X, y],
                    jax.random.PRNGKey(0))
    lu, _, _ = ex_u(infr_u.params.trainable_params(),
                    infr_u.params.fixed_params(), [X, y],
                    jax.random.PRNGKey(0))
    assert np.isclose(float(np.asarray(lw)), float(np.asarray(lu)),
                      rtol=1e-8)


def test_svgp_classification_draw_samples_binary():
    rng = np.random.default_rng(4)
    N = 12
    X = rng.random((N, 1)) * 4
    Z0 = np.linspace(0.2, 3.8, M_IND)[:, None]
    m = _build(N, 1, 1.0, 1.0, Z0, jitter=1e-8)
    alg = ForwardSamplingAlgorithm(model=m, observed=[m.X],
                                   num_samples=7,
                                   target_variables=[m.Y.uuid])
    infr = Inference(inference_algorithm=alg, dtype="float64")
    out = infr.run(X=X, key=jax.random.PRNGKey(0))
    s = np.asarray(out[0]).astype(np.float64)
    assert s.shape == (7, N, 1)
    assert set(np.unique(s)).issubset({0.0, 1.0})
