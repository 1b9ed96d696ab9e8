"""GaussianProcess / ConditionalGaussianProcess density tests vs numpy
oracles (the reference uses GPy here; we compute the closed forms
directly)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu.components.variables.variable import Variable
from mxfusion_tpu.components.distributions import (
    GaussianProcess, ConditionalGaussianProcess)
from mxfusion_tpu.components.distributions.gp.kernels import RBF


def np_rbf(X, X2, lengthscale, variance):
    Xs = X / lengthscale
    X2s = X2 / lengthscale
    r2 = ((Xs[:, None, :] - X2s[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * r2)


def _gp_env(dist, values):
    env = {}
    for name, var in dist.inputs:
        env[var.uuid] = jnp.asarray(values[name])[None]
    return env


def test_gp_log_pdf_matches_mvn():
    rng = np.random.default_rng(0)
    N, D = 8, 2
    X = rng.standard_normal((N, D))
    ls, var = np.asarray([0.9]), np.asarray([1.4])
    f = rng.standard_normal((N, 1))
    kernel = RBF(input_dim=D, dtype="float64")
    X_v = Variable(shape=(N, D))
    gp_var = GaussianProcess.define_variable(X=X_v, kernel=kernel,
                                             shape=(N, 1), dtype="float64")
    dist = gp_var.factor
    env = _gp_env(dist, {
        "X": X,
        dist.kernel.name + "_lengthscale": ls,
        dist.kernel.name + "_variance": var})
    env[gp_var.uuid] = jnp.asarray(f)[None]
    result = np.asarray(dist.log_pdf(env))
    K = np_rbf(X, X, ls, var[0])
    expected = stats.multivariate_normal.logpdf(f[:, 0], np.zeros(N), K)
    assert np.allclose(result.ravel()[0], expected, rtol=1e-7, atol=1e-8)


def test_gp_sampling_covariance():
    rng = np.random.default_rng(1)
    N, D = 4, 1
    X = rng.standard_normal((N, D))
    kernel = RBF(input_dim=D, dtype="float64")
    X_v = Variable(shape=(N, D))
    gp_var = GaussianProcess.define_variable(X=X_v, kernel=kernel,
                                             shape=(N, 1), dtype="float64",
                                             jitter=1e-10)
    dist = gp_var.factor
    env = _gp_env(dist, {
        "X": X,
        dist.kernel.name + "_lengthscale": np.asarray([1.0]),
        dist.kernel.name + "_variance": np.asarray([1.0])})
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=40000))[:, :, 0]
    K = np_rbf(X, X, np.asarray([1.0]), 1.0)
    emp = np.cov(samples.T)
    assert np.allclose(emp, K, atol=0.05)


def test_cond_gp_log_pdf_matches_conditional_mvn():
    rng = np.random.default_rng(2)
    N, M, D = 6, 5, 2
    X = rng.standard_normal((N, D))
    Z = rng.standard_normal((M, D))
    U = rng.standard_normal((M, 1))
    f = rng.standard_normal((N, 1))
    ls, var = np.asarray([1.1]), np.asarray([0.8])
    kernel = RBF(input_dim=D, dtype="float64")
    X_v = Variable(shape=(N, D))
    Z_v = Variable(shape=(M, D))
    U_v = Variable(shape=(M, 1))
    gp_var = ConditionalGaussianProcess.define_variable(
        X=X_v, X_cond=Z_v, Y_cond=U_v, kernel=kernel, shape=(N, 1),
        dtype="float64")
    dist = gp_var.factor
    env = _gp_env(dist, {
        "X": X, "X_cond": Z, "Y_cond": U,
        dist.kernel.name + "_lengthscale": ls,
        dist.kernel.name + "_variance": var})
    env[gp_var.uuid] = jnp.asarray(f)[None]
    result = np.asarray(dist.log_pdf(env))
    Kzz = np_rbf(Z, Z, ls, var[0])
    Kxz = np_rbf(X, Z, ls, var[0])
    Kxx = np_rbf(X, X, ls, var[0])
    Kzz_inv = np.linalg.inv(Kzz)
    mean_c = Kxz @ Kzz_inv @ U
    cov_c = Kxx - Kxz @ Kzz_inv @ Kxz.T
    expected = stats.multivariate_normal.logpdf(
        f[:, 0], mean_c[:, 0], cov_c, allow_singular=True)
    assert np.allclose(result.ravel()[0], expected, rtol=1e-6, atol=1e-6)
