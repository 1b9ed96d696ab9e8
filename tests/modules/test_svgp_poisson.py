"""SVGPPoissonRegression: numpy-oracle ELBO, training recovery,
prediction moments, serialization surface.

Count-data GP module beyond the reference's set; the log-link bound is
quadrature-free (lognormal-mean identity), pinned here against an
independent numpy computation and a Monte-Carlo check.
"""
import numpy as np
import pytest
import jax
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPPoissonRegression
from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                    TransferInference, create_executor)
from mxfusion_tpu.inference.prediction import ModulePredictionAlgorithm


def np_rbf(X, X2, ls, var):
    d2 = ((X[:, None, :] - X2[None, :, :]) ** 2).sum(-1) / ls ** 2
    return var * np.exp(-0.5 * d2)


def _count_data(n=60, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.random((n, 1)) * 4, 0)
    rate = np.exp(np.sin(X[:, 0]) + 0.5)
    Y = rng.poisson(rate)[:, None].astype(np.float64)
    return X, Y, rate


def _build(link="log", M=6, ls=0.9, var=1.3, jitter=0.0):
    X_, Y_, _ = _count_data()
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    Z0 = np.linspace(0.2, 3.8, M)[:, None]
    m.Y = SVGPPoissonRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=var, lengthscale=ls,
                          dtype="float64"),
        shape=(m.N, 1), dtype="float64", jitter=jitter, link=link,
        inducing_inputs=Variable(shape=(M, 1), initial_value=Z0))
    return m, Z0


def test_poisson_elbo_vs_numpy_closed_form():
    """Log-link ELBO at the initial q(U) against an independent numpy
    computation: y mu - exp(mu + var/2) - log y! summed, minus the
    Gaussian KL."""
    X, Y, _ = _count_data(n=25)
    M, ls, var = 6, 0.9, 1.3
    m, Z0 = _build(M=M, ls=ls, var=var)
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
    A = Kuf.T @ Kuu_inv
    mu_f = (A @ qU_mean)[:, 0]
    var_f = (np_rbf(X, X, ls, var).diagonal()
             - np.einsum("nm,mk,nk->n", A, Kuu, A)
             + np.einsum("nm,mk,nk->n", A, S, A))
    y = Y[:, 0]
    from scipy.special import gammaln as np_gammaln
    exp_lik = (y * mu_f - np.exp(mu_f + 0.5 * var_f)
               - np_gammaln(y + 1.0)).sum()
    KL = 0.5 * (np.trace(Kuu_inv @ S)
                + qU_mean[:, 0] @ Kuu_inv @ qU_mean[:, 0]
                - M + np.linalg.slogdet(Kuu)[1]
                - np.linalg.slogdet(S)[1])
    assert np.isclose(result, exp_lik - KL, rtol=1e-6)


def test_poisson_closed_form_expected_loglik_vs_monte_carlo():
    """The lognormal-mean identity behind the quadrature-free bound:
    E_{f~N(mu,v)}[y f - e^f] == y mu - exp(mu + v/2), MC-checked."""
    rng = np.random.default_rng(1)
    mu, v, y = 0.7, 0.35, 3.0
    f = rng.normal(mu, np.sqrt(v), size=2_000_000)
    mc = np.mean(y * f - np.exp(f))
    closed = y * mu - np.exp(mu + v / 2.0)
    se = np.std(y * f - np.exp(f)) / np.sqrt(f.size)
    assert abs(mc - closed) < 5 * se, (mc, closed, se)


def test_poisson_svgp_training_recovers_rate():
    X, Y, rate = _count_data(n=200, seed=2)
    M = 12
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.Y = SVGPPoissonRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        shape=(m.N, 1),
        inducing_inputs=Variable(
            shape=(M, 1),
            initial_value=np.linspace(0.1, 3.9, M)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    losses = []
    infr.run(X=X, Y=Y, max_iter=600, learning_rate=0.05,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0] - 10.0  # bound improved materially

    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mean, var = pred.run(X=X)[0]
    mean = np.asarray(mean)[0, :, 0]
    var = np.asarray(var)[0, :, 0]
    # fitted rate tracks the generating rate
    rel = np.abs(mean - rate) / rate
    assert np.median(rel) < 0.35, np.median(rel)
    assert np.corrcoef(mean, rate)[0, 1] > 0.9
    # count variance >= count mean (Poisson noise + rate uncertainty)
    assert np.all(var >= mean - 1e-9)


def test_poisson_softplus_link_trains_and_predicts():
    X, Y, rate = _count_data(n=120, seed=3)
    M = 10
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.Y = SVGPPoissonRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        shape=(m.N, 1), link="softplus",
        inducing_inputs=Variable(
            shape=(M, 1),
            initial_value=np.linspace(0.1, 3.9, M)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    losses = []
    infr.run(X=X, Y=Y, max_iter=400, learning_rate=0.05,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mean, var = pred.run(X=X)[0]
    mean = np.asarray(mean)[0, :, 0]
    assert np.all(np.isfinite(mean)) and np.all(mean > 0)
    assert np.corrcoef(mean, rate)[0, 1] > 0.8


def test_poisson_svgp_sampling_path():
    """draw_samples walks the generative graph U -> F -> exp -> Poisson
    and yields nonnegative integer counts."""
    X, _, _ = _count_data(n=30)
    # default jitter: the conditional covariance of 30 points given 6
    # inducing points is numerically rank-6; jitter=0 NaNs its Cholesky
    m, _ = _build(jitter=1e-5)
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


def test_poisson_softplus_link_zero_counts_extreme_negative_f():
    """softplus(f) underflows to 0 at strongly negative f; with zero
    counts the naive y*log(rate) is 0*(-inf) = NaN (r4 review
    finding). The stable log-softplus form must keep the ELBO and its
    gradients finite."""
    import jax.numpy as jnp
    from mxfusion_tpu.inference import create_executor
    X = np.linspace(0, 4, 20)[:, None]
    Y = np.zeros((20, 1))                  # all-zero counts
    m, _ = _build(link="softplus", jitter=1e-5)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    post = m.Y.factor._extra_graphs[0]
    # drive q(f) far negative: rate underflows at every quadrature node
    infr.params.param_dict[post.qU_mean.uuid] = \
        jnp.full((6, 1), -500.0)
    ex = create_executor(alg, infr.params)
    tr = infr.params.trainable_params()
    fx = infr.params.fixed_params()

    def loss_fn(t):
        loss, lg, _ = ex(t, fx, [X, Y], jax.random.PRNGKey(0))
        return lg
    val, grads = jax.value_and_grad(loss_fn)(tr)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))
