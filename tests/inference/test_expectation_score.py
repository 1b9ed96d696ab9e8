"""Score-function expectation gradient + heteroscedastic SVGP tests."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (
    ExpectationScoreFunctionAlgorithm, Inference, GradBasedInference,
    MAP, create_executor)


def test_expectation_score_function_gradient_direction():
    """Minimize E[(x - 3)^2] over the mean of x via the score trick."""
    m = Model()
    m.mean = Variable(initial_value=0.0)
    m.x = Normal.define_variable(mean=broadcast_to(m.mean, (1,)),
                                 variance=1., shape=(1,))
    m.loss = (m.x - 3.0) ** 2.0
    alg = ExpectationScoreFunctionAlgorithm(
        model=m, observed=[], num_samples=2000,
        target_variables=[m.loss.uuid])
    infr = Inference(inference_algorithm=alg)
    infr.initialize()
    ex = create_executor(alg, infr.params)

    def surrogate(tr):
        _, grad_objective, _ = ex(tr, infr.params.fixed_params(), [],
                                  jax.random.PRNGKey(0))
        return grad_objective

    g = jax.grad(lambda tr: surrogate(tr))(
        infr.params.trainable_params())
    g_mean = float(np.asarray(g[m.mean.uuid]).ravel()[0])
    # d/dmean E[(x-3)^2] = 2(mean-3) = -6 at mean=0
    assert abs(g_mean - (-6.0)) < 1.0


def test_svgp_heteroscedastic_noise():
    """Per-datapoint noise variances through the SVGP ELBO."""
    rng = np.random.default_rng(0)
    N, M = 30, 6
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
    noise = (0.01 + 0.05 * rng.random((N, 1)))
    Z0 = np.linspace(0.2, 3.8, M)[:, None]

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.noise_var = Variable(shape=(m.n, 1))  # observed heteroscedastic
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.3, lengthscale=0.9,
                          dtype="float64"),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M, 1), initial_value=Z0),
        dtype="float64", jitter=0.0)
    alg = MAP(model=m, observed=[m.X, m.Y, m.noise_var])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y, noise_var=noise)
    post = m.Y.factor._extra_graphs[0]
    qU_mean = np.asarray(infr.params[post.qU_mean])
    qU_W = np.asarray(infr.params[post.qU_cov_W])
    qU_diag = np.asarray(infr.params[post.qU_cov_diag])
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, Y, noise],
                    jax.random.PRNGKey(0))
    result = -float(loss)

    # closed-form heteroscedastic ELBO
    def np_rbf(A, B, ls, var):
        r2 = ((A / ls)[:, None, :] - (B / ls)[None, :, :]) ** 2
        return var * np.exp(-0.5 * r2.sum(-1))
    ls, var = 0.9, 1.3
    S = qU_W @ qU_W.T + np.diag(qU_diag)
    Kuu = np_rbf(Z0, Z0, ls, var)
    Kuf = np_rbf(Z0, X, ls, var)
    Kuu_inv = np.linalg.inv(Kuu)
    A = Kuf.T @ Kuu_inv
    mean_f = A @ qU_mean
    var_f = (np_rbf(X, X, ls, var).diagonal()
             - np.einsum("nm,mk,nk->n", A, Kuu, A)
             + np.einsum("nm,mk,nk->n", A, S, A))
    sigma2 = noise[:, 0]
    exp_lik = (stats.norm.logpdf(Y[:, 0], mean_f[:, 0],
                                 np.sqrt(sigma2)).sum()
               - (var_f / (2 * sigma2)).sum())
    KL = 0.5 * (np.trace(Kuu_inv @ S)
                + (qU_mean[:, 0] @ Kuu_inv @ qU_mean[:, 0])
                - M + np.linalg.slogdet(Kuu)[1]
                - np.linalg.slogdet(S)[1])
    expected = exp_lik - KL
    assert np.isclose(result, expected, rtol=1e-6)
