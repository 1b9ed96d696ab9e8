"""Sampling-path coverage: moment/KS checks for every remaining
distribution sampler, plus one-hot Categorical draws."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu.components.variables.variable import Variable
from mxfusion_tpu.components.distributions import (
    NormalMeanPrecision, Gamma, GammaMeanVariance, Bernoulli, Categorical,
    Uniform, Laplace)
from mxfusion_tpu.util.testutils import check_sampling_univariate


def _sample(dist_cls, params, shape, n, dist_kw=None, key=0):
    inputs = {name: Variable() for name in params}
    dist = dist_cls(dtype="float64", **inputs, **(dist_kw or {}))
    dist._generate_outputs(shape=shape)
    env = {inputs[k].uuid: jnp.asarray(v).reshape(1, 1)
           for k, v in params.items()}
    return np.asarray(dist.draw_samples(env, jax.random.PRNGKey(key),
                                        num_samples=n))


def test_normal_mean_precision_sampling():
    s = _sample(NormalMeanPrecision, {"mean": 2.0, "precision": 4.0},
                (1,), 20000)
    assert check_sampling_univariate(s, lambda x: stats.norm.cdf(
        x, 2.0, 0.5))


def test_gamma_sampling():
    s = _sample(Gamma, {"alpha": 3.0, "beta": 2.0}, (1,), 20000)
    assert check_sampling_univariate(s, lambda x: stats.gamma.cdf(
        x, 3.0, scale=0.5))


def test_gamma_mean_variance_sampling():
    mean, var = 2.0, 0.5
    s = _sample(GammaMeanVariance, {"mean": mean, "variance": var}, (1,),
                20000)
    beta = mean / var
    alpha = mean * beta
    assert check_sampling_univariate(s, lambda x: stats.gamma.cdf(
        x, alpha, scale=1 / beta))


def test_bernoulli_sampling():
    s = _sample(Bernoulli, {"prob_true": 0.3}, (1,), 20000)
    assert abs(s.mean() - 0.3) < 0.02


def test_uniform_sampling():
    s = _sample(Uniform, {"low": -1.0, "high": 2.0}, (1,), 20000)
    assert check_sampling_univariate(s, lambda x: stats.uniform.cdf(
        x, -1.0, 3.0))


def test_laplace_sampling():
    s = _sample(Laplace, {"location": 1.0, "scale": 0.7}, (1,), 20000)
    assert check_sampling_univariate(s, lambda x: stats.laplace.cdf(
        x, 1.0, 0.7))


def test_categorical_one_hot_sampling():
    logp_v = Variable()
    dist = Categorical(log_prob=logp_v, num_classes=3,
                       one_hot_encoding=True, dtype="float64")
    dist._generate_outputs(shape=(1, 3))
    env = {logp_v.uuid: jnp.log(jnp.asarray([[[0.5, 0.2, 0.3]]]))}
    s = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                     num_samples=20000))
    assert s.shape == (20000, 1, 3)
    assert np.all(s.sum(-1) == 1.0)
    freqs = s.mean(axis=0).ravel()
    assert np.allclose(freqs, [0.5, 0.2, 0.3], atol=0.02)
