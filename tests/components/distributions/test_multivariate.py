"""Multivariate distributions vs scipy oracles (batched, no Python loops)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu.components.variables.variable import Variable
from mxfusion_tpu.components.distributions import (
    MultivariateNormal, MultivariateNormalMeanPrecision, Categorical,
    Dirichlet, Wishart)
from mxfusion_tpu.util.testutils import make_spd_matrix, \
    prepare_runtime_array


def _build(dist_cls, param_values, rv_value, rv_has_samples, dtype,
           **dist_kw):
    inputs = {name: Variable() for name in param_values}
    dist = dist_cls(dtype=dtype, **inputs, **dist_kw)
    dist._generate_outputs(shape=np.asarray(rv_value).shape[
        1 if rv_has_samples else 0:])
    env = {}
    for name, (value, has_samples) in param_values.items():
        env[inputs[name].uuid] = prepare_runtime_array(value, has_samples,
                                                       dtype)
    env[dist.random_variable.uuid] = prepare_runtime_array(
        rv_value, rv_has_samples, dtype)
    return dist, env


def test_multivariate_normal_log_pdf():
    rng = np.random.default_rng(0)
    D, B, S = 3, 4, 5
    mean = rng.standard_normal((B, D))
    cov = np.stack([make_spd_matrix(D, rng) for _ in range(B)])
    rv = rng.standard_normal((S, B, D))
    dist, env = _build(MultivariateNormal,
                       {"mean": (mean, False), "covariance": (cov, False)},
                       rv, True, "float64")
    result = np.asarray(dist.log_pdf(env))
    expected = np.stack([
        [stats.multivariate_normal.logpdf(rv[s, b], mean[b], cov[b])
         for b in range(B)] for s in range(S)])
    assert result.shape == (S, B)
    assert np.allclose(result, expected, rtol=1e-7, atol=1e-10)


def test_multivariate_normal_sampling_moments():
    rng = np.random.default_rng(1)
    D = 3
    mean = rng.standard_normal((1, D))
    cov = make_spd_matrix(D, rng)[None]
    dist, env = _build(MultivariateNormal,
                       {"mean": (mean, False), "covariance": (cov, False)},
                       np.zeros((1, D)), False, "float64")
    del env[dist.random_variable.uuid]
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=40000))
    emp_cov = np.cov(samples[:, 0, :].T)
    assert np.allclose(samples[:, 0, :].mean(0), mean[0], atol=0.1)
    assert np.allclose(emp_cov, cov[0], rtol=0.1, atol=0.15)


def test_multivariate_normal_mean_precision_log_pdf():
    rng = np.random.default_rng(2)
    D, B, S = 3, 4, 5
    mean = rng.standard_normal((B, D))
    prec = np.stack([make_spd_matrix(D, rng) for _ in range(B)])
    rv = rng.standard_normal((S, B, D))
    dist, env = _build(MultivariateNormalMeanPrecision,
                       {"mean": (mean, False), "precision": (prec, False)},
                       rv, True, "float64")
    result = np.asarray(dist.log_pdf(env))
    expected = np.stack([
        [stats.multivariate_normal.logpdf(rv[s, b], mean[b],
                                          np.linalg.inv(prec[b]))
         for b in range(B)] for s in range(S)])
    assert np.allclose(result, expected, rtol=1e-7, atol=1e-8)


def test_mvn_mean_precision_sampling_covariance():
    rng = np.random.default_rng(3)
    D = 2
    prec = make_spd_matrix(D, rng)
    dist, env = _build(MultivariateNormalMeanPrecision,
                       {"mean": (np.zeros((1, D)), False),
                        "precision": (prec[None], False)},
                       np.zeros((1, D)), False, "float64")
    del env[dist.random_variable.uuid]
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=50000))
    emp_cov = np.cov(samples[:, 0, :].T)
    assert np.allclose(emp_cov, np.linalg.inv(prec), rtol=0.1, atol=0.01)


@pytest.mark.parametrize("one_hot", [False, True])
def test_categorical_log_pdf(one_hot):
    rng = np.random.default_rng(4)
    K, N, S = 4, 6, 3
    log_prob = rng.standard_normal((N, K))
    idx = rng.integers(0, K, size=(S, N))
    if one_hot:
        rv = np.eye(K)[idx]
        rv_shape_ok = (S, N, K)
    else:
        rv = idx[..., None].astype(np.float64)
        rv_shape_ok = (S, N, 1)
    dist, env = _build(Categorical, {"log_prob": (log_prob, False)},
                       rv, True, "float64",
                       num_classes=K, one_hot_encoding=one_hot)
    result = np.asarray(dist.log_pdf(env))
    p = np.exp(log_prob) / np.exp(log_prob).sum(-1, keepdims=True)
    expected = np.log(p[np.arange(N)[None, :], idx])
    assert rv.shape == rv_shape_ok
    assert np.allclose(result, expected, rtol=1e-7, atol=1e-10)


def test_categorical_sampling_frequencies():
    rng = np.random.default_rng(5)
    K = 3
    log_prob = np.log(np.asarray([[0.2, 0.5, 0.3]]))
    dist, env = _build(Categorical, {"log_prob": (log_prob, False)},
                       np.zeros((1, 1)), False, "float64",
                       num_classes=K, normalization=True)
    del env[dist.random_variable.uuid]
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=20000))
    freqs = np.bincount(samples.astype(int).ravel(), minlength=K) / 20000
    assert np.allclose(freqs, [0.2, 0.5, 0.3], atol=0.02)


def test_dirichlet_log_pdf():
    rng = np.random.default_rng(6)
    K, S = 4, 5
    alpha = rng.random((1, K)) * 3 + 0.5
    x = rng.random((S, 1, K)) + 0.1
    x = x / x.sum(-1, keepdims=True)
    dist, env = _build(Dirichlet, {"alpha": (alpha, False)}, x, True,
                       "float64", normalization=False)
    result = np.asarray(dist.log_pdf(env))
    expected = np.stack([stats.dirichlet.logpdf(x[s, 0], alpha[0])
                         for s in range(S)])[:, None]
    assert np.allclose(result, expected, rtol=1e-7, atol=1e-9)


def test_dirichlet_sampling_moments():
    alpha = np.asarray([[2.0, 3.0, 5.0]])
    dist, env = _build(Dirichlet, {"alpha": (alpha, False)},
                       np.zeros((1, 3)), False, "float64")
    del env[dist.random_variable.uuid]
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=20000))
    assert np.allclose(samples.sum(-1), 1.0, atol=1e-6)
    assert np.allclose(samples[:, 0, :].mean(0), alpha[0] / alpha.sum(),
                       atol=0.01)


def test_wishart_log_pdf():
    rng = np.random.default_rng(7)
    D, S = 3, 4
    dof = np.asarray([[5.0]])
    scale = make_spd_matrix(D, rng)[None]
    rv = np.stack([make_spd_matrix(D, rng) for _ in range(S)])[:, None]
    dist, env = _build(Wishart, {"degrees_of_freedom": (dof, False),
                                 "scale": (scale, False)},
                       rv, True, "float64")
    result = np.asarray(dist.log_pdf(env))
    expected = np.stack([stats.wishart.logpdf(rv[s, 0], 5.0, scale[0])
                         for s in range(S)])[:, None]
    assert np.allclose(result.ravel(), expected.ravel(), rtol=1e-7,
                       atol=1e-8)


def test_wishart_sampling_mean():
    # E[W] = n * scale; the Bartlett sampler is fully batched (no loops)
    rng = np.random.default_rng(8)
    D = 2
    dof = np.asarray([[6.0]])
    scale = make_spd_matrix(D, rng)[None] / D
    dist, env = _build(Wishart, {"degrees_of_freedom": (dof, False),
                                 "scale": (scale, False)},
                       np.zeros((1, D, D)), False, "float64")
    del env[dist.random_variable.uuid]
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=20000))
    emp_mean = samples[:, 0].mean(0)
    assert np.allclose(emp_mean, 6.0 * scale[0], rtol=0.05, atol=0.05)
