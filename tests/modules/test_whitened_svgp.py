"""Whitened SVGP parameterization (q over v = L^-1 u; beyond-reference).

The two parameterizations define the same bound under the variable
change m_u = L m_v, S_u = L S_v L^T — checked exactly — and whitened
training must converge and predict correctly end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor, ModulePredictionAlgorithm,
    TransferInference)

M_IND = 8


def _build(whitened, rng, N=30):
    X = rng.random((N, 2)) * 4
    Y = np.sin(X[:, :1]) + rng.standard_normal((N, 1)) * 0.1
    Z0 = rng.random((M_IND, 2)) * 4
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=2, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M_IND, 2), initial_value=Z0),
        jitter=1e-8, whitened=whitened)
    return m, X, Y


def test_whitened_elbo_equals_unwhitened_under_variable_change():
    rng = np.random.default_rng(0)
    m_w, X, Y = _build(True, np.random.default_rng(0))
    m_u, _, _ = _build(False, np.random.default_rng(0))

    def executor_and_params(m):
        alg = MAP(model=m, observed=[m.X, m.Y])
        infr = GradBasedInference(inference_algorithm=alg)
        infr.initialize(X=X, Y=Y)
        return create_executor(alg, infr.params), infr

    ex_w, infr_w = executor_and_params(m_w)
    ex_u, infr_u = executor_and_params(m_u)

    # a random whitened q(v): v-mean and a full-rank cov factor
    rng2 = np.random.default_rng(7)
    m_v = rng2.standard_normal((M_IND, 1))
    W_v = rng2.standard_normal((M_IND, M_IND)) * 0.3 + np.eye(M_IND)
    d_small = 1e-12  # positive-transformed diag; negligible

    # compute L = chol(Kuu) for the shared Z / kernel params
    Z = np.asarray(infr_w.params[m_w.Y.factor.inducing_inputs])
    r2 = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    Kuu = np.exp(-0.5 * r2) + 1e-8 * np.eye(M_IND)
    L = np.linalg.cholesky(Kuu)
    # the unwhitened q(u) equivalent: m_u = L m_v, chol(S_u) = L Ls_v
    S_v = W_v @ W_v.T + d_small * np.eye(M_IND)
    Ls_v = np.linalg.cholesky(S_v)
    W_u = L @ Ls_v

    def set_q(infr, m, mean, W):
        q = m.Y.factor._extra_graphs[0]
        infr.params[q.qU_mean] = jnp.asarray(mean)
        infr.params[q.qU_cov_W] = jnp.asarray(W)
        infr.params[q.qU_cov_diag] = jnp.asarray(
            np.full(M_IND, d_small))

    set_q(infr_w, m_w, m_v, W_v)
    set_q(infr_u, m_u, L @ m_v, W_u)

    key = jax.random.PRNGKey(0)
    loss_w = float(ex_w(infr_w.params.trainable_params(),
                        infr_w.params.fixed_params(), [X, Y], key)[0])
    loss_u = float(ex_u(infr_u.params.trainable_params(),
                        infr_u.params.fixed_params(), [X, Y], key)[0])
    assert np.isclose(loss_w, loss_u, rtol=1e-6), (loss_w, loss_u)


def test_whitened_svgp_trains_and_predicts():
    rng = np.random.default_rng(1)
    m, X, Y = _build(True, rng, N=120)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    losses = []
    infr.run(max_iter=150, learning_rate=0.05, X=X, Y=Y,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0]

    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, var = p.run(X=X[:40])[0]
    err = float(np.abs(np.asarray(mu)[0, :, 0] -
                       np.sin(X[:40, 0])).mean())
    assert err < 0.25, err
    assert np.all(np.asarray(var) > -1e-8)
