"""Oracle tests for the r3 completeness extras: InverseGamma,
Polynomial kernel, tanh/softplus/probit operators, probit-link
classification."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import InverseGamma
from mxfusion_tpu.components.distributions.gp.kernels import Polynomial
from mxfusion_tpu.util.testutils import prepare_runtime_array


def test_inverse_gamma_log_pdf_vs_scipy():
    rng = np.random.default_rng(0)
    a = rng.random((3, 2)) * 3 + 0.5
    b = rng.random((3, 2)) * 2 + 0.5
    rv = rng.random((5, 3, 2)) + 0.1
    a_v, b_v = Variable(), Variable()
    dist = InverseGamma(alpha=a_v, beta=b_v, dtype="float64")
    dist._generate_outputs(shape=(3, 2))
    env = {a_v.uuid: prepare_runtime_array(a, False, "float64"),
           b_v.uuid: prepare_runtime_array(b, False, "float64"),
           dist.random_variable.uuid: prepare_runtime_array(
               rv, True, "float64")}
    result = np.asarray(dist.log_pdf(env))
    expected = stats.invgamma.logpdf(rv, a[None], scale=b[None])
    assert np.allclose(result, expected, rtol=1e-7, atol=1e-10)


def test_inverse_gamma_samples_match_distribution():
    a_v, b_v = Variable(), Variable()
    dist = InverseGamma(alpha=a_v, beta=b_v, dtype="float64")
    dist._generate_outputs(shape=(1,))
    env = {a_v.uuid: jnp.asarray([[3.0]]), b_v.uuid: jnp.asarray([[2.0]])}
    s = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                     num_samples=20000)).ravel()
    _, p = stats.kstest(s, stats.invgamma(3.0, scale=2.0).cdf)
    assert p > 1e-3


def test_polynomial_kernel_vs_numpy():
    rng = np.random.default_rng(1)
    X = rng.random((7, 3))
    X2 = rng.random((5, 3))
    ls, var, off, deg = 0.8, 1.7, 0.5, 3
    k = Polynomial(input_dim=3, degree=deg, variance=var,
                   lengthscale=ls, offset=off, dtype="float64")
    env = {v.uuid: jnp.asarray(np.atleast_1d(val))[None]
           for v, val in [(k.variance, var), (k.lengthscale, ls),
                          (k.offset, off)]}
    params = k.fetch_parameters(env)
    K = np.asarray(k.K(jnp.asarray(X)[None], jnp.asarray(X2)[None],
                       **params))[0]
    expected = var * (off + (X / ls) @ (X2 / ls).T) ** deg
    assert np.allclose(K, expected, rtol=1e-10)
    Kd = np.asarray(k.Kdiag(jnp.asarray(X)[None], **params))[0]
    assert np.allclose(Kd, np.diag(
        var * (off + (X / ls) @ (X / ls).T) ** deg), rtol=1e-10)


def test_polynomial_kernel_psd_and_composes():
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    rng = np.random.default_rng(2)
    X = rng.random((20, 2))
    k = Polynomial(input_dim=2, degree=2, dtype="float64") + \
        RBF(input_dim=2, dtype="float64")
    env = {v.uuid: jnp.asarray(np.atleast_1d(1.0))[None]
           for v in k.parameters.values()}
    params = k.fetch_parameters(env)
    K = np.asarray(k.K(jnp.asarray(X)[None], **params))[0]
    eig = np.linalg.eigvalsh(K)
    assert eig.min() > -1e-10


def test_unary_operators_in_graph():
    from mxfusion_tpu.components.functions.operators import (
        tanh, softplus, probit)
    from scipy.special import ndtr as np_ndtr
    m = Model()
    m.x = Variable(shape=(4,))
    m.t = tanh(m.x)
    m.s = softplus(m.x)
    m.p = probit(m.x)
    x = np.linspace(-3, 3, 4)
    env = {m.x.uuid: jnp.asarray(x)[None]}
    for var, fn in [(m.t, np.tanh),
                    (m.s, lambda v: np.log1p(np.exp(v))),
                    (m.p, np_ndtr)]:
        out = var.factor.eval(env)
        val = np.asarray(list(out.values())[0])[0]
        assert np.allclose(val, fn(x), rtol=1e-6)


def test_probit_svgp_classification_elbo_and_prediction_oracle():
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPClassification
    from mxfusion_tpu.inference import (GradBasedInference, MAP,
        create_executor, ModulePredictionAlgorithm, TransferInference)

    rng = np.random.default_rng(3)
    N, D, M, ls, var = 20, 1, 5, 1.0, 1.2
    X = rng.random((N, D)) * 4
    y = (rng.random((N, 1)) > 0.5).astype(np.float64)
    Z0 = np.linspace(0.2, 3.8, M)[:, None]

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.Y = SVGPClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=var, lengthscale=ls,
                          dtype="float64"),
        shape=(m.n, 1),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        dtype="float64", jitter=0.0, link="probit")
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=y)
    post = m.Y.factor._extra_graphs[0]
    qU_mean = rng.standard_normal((M, 1)) * 0.7
    infr.params[post.qU_mean] = jnp.asarray(qU_mean)

    def np_rbf(A, B):
        r2 = (((A / ls)[:, None, :] - (B / ls)[None, :, :]) ** 2).sum(-1)
        return var * np.exp(-0.5 * r2)

    W = np.asarray(infr.params[post.qU_cov_W])
    dg = np.asarray(infr.params[post.qU_cov_diag])
    S = W @ W.T + np.diag(dg)
    Kuu = np_rbf(Z0, Z0)
    Kuu_inv = np.linalg.inv(Kuu)
    A = np_rbf(Z0, X).T @ Kuu_inv
    mean_f = (A @ qU_mean)[:, 0]
    var_f = (np_rbf(X, X).diagonal()
             - np.einsum("nm,mk,nk->n", A, Kuu, A)
             + np.einsum("nm,mk,nk->n", A, S, A))

    # ELBO vs numpy quadrature of log Phi
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, y],
                    jax.random.PRNGKey(0))
    t, w = np.polynomial.hermite.hermgauss(20)
    sign = 2 * y[:, 0] - 1
    f = mean_f[:, None] + np.sqrt(2 * var_f)[:, None] * t[None]
    exp_lik = (stats.norm.logcdf(sign[:, None] * f)
               * (w / np.sqrt(np.pi))[None]).sum()
    KL = 0.5 * (np.trace(Kuu_inv @ S)
                + qU_mean[:, 0] @ Kuu_inv @ qU_mean[:, 0]
                - M + np.linalg.slogdet(Kuu)[1]
                - np.linalg.slogdet(S)[1])
    assert np.isclose(-float(np.asarray(loss)), exp_lik - KL,
                      rtol=1e-6)

    # closed-form probit predictive: p = Phi(mu / sqrt(1 + var))
    Xt = np.linspace(0.1, 3.9, 11)[:, None]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    p, _ = pred.run(X=Xt)[0]
    p = np.asarray(p)[0, :, 0]
    At = np_rbf(Z0, Xt).T @ Kuu_inv
    mean_t = (At @ qU_mean)[:, 0]
    var_t = (np_rbf(Xt, Xt).diagonal()
             - np.einsum("nm,mk,nk->n", At, Kuu, At)
             + np.einsum("nm,mk,nk->n", At, S, At))
    p_exp = stats.norm.cdf(mean_t / np.sqrt(1.0 + var_t))
    assert np.allclose(p, p_exp, rtol=1e-9, atol=1e-12)
