"""Scipy-oracle tests for the beyond-reference univariate distributions
(Exponential, Poisson, StudentT, LogNormal), in the same style as
tests/components/distributions/test_univariate.py."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu.components.variables.variable import Variable
from mxfusion_tpu.components.distributions import (
    Exponential, Poisson, StudentT, LogNormal, FixedRandomGenerator)

from mxfusion_tpu.util.testutils import prepare_runtime_array


def _tols(dtype):
    return (1e-7, 1e-10) if dtype == "float64" else (1e-3, 1e-3)


def eval_log_pdf(dist_cls, param_values, rv_value, rv_has_samples,
                 dtype, **dist_kw):
    """Build the factor with fresh input Variables, run log_pdf on a raw
    env, and return the per-sample result as numpy (same helper as
    test_univariate.py)."""
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
    return np.asarray(dist.log_pdf(env))


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_exponential_log_pdf(dtype):
    rng = np.random.default_rng(20)
    rate = rng.random((3, 2)) * 2 + 0.2
    rv = rng.random((5, 3, 2)) * 3
    result = eval_log_pdf(Exponential, {"rate": (rate, False)}, rv, True,
                          dtype)
    expected = stats.expon.logpdf(rv, scale=1.0 / rate[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_exponential_log_pdf_outside_support():
    rate = np.ones((2, 2))
    rv = np.full((1, 2, 2), -0.5)
    result = eval_log_pdf(Exponential, {"rate": (rate, False)}, rv, True,
                          "float64")
    assert np.all(np.isneginf(result))


def test_exponential_draw_samples_exact():
    rng = np.random.default_rng(21)
    raw = rng.random((4, 3, 2)) + 0.1
    gen = FixedRandomGenerator(raw)
    rate_v = Variable()
    dist = Exponential(rate=rate_v, rand_gen=gen, dtype="float64")
    dist._generate_outputs(shape=(3, 2))
    env = {rate_v.uuid: jnp.asarray([[2.0]])}
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=4))
    assert np.allclose(samples, raw / 2.0, rtol=1e-6)


def test_exponential_samples_distribution():
    rate_v = Variable()
    dist = Exponential(rate=rate_v, dtype="float64")
    dist._generate_outputs(shape=(1,))
    env = {rate_v.uuid: jnp.asarray([[1.5]])}
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(3),
                                           num_samples=20000)).ravel()
    # KS test against the oracle CDF
    _, p = stats.kstest(samples, stats.expon(scale=1 / 1.5).cdf)
    assert p > 1e-3


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_poisson_log_pdf(dtype):
    rng = np.random.default_rng(22)
    rate = rng.random((3, 2)) * 5 + 0.5
    rv = rng.poisson(3.0, (5, 3, 2)).astype(np.float64)
    result = eval_log_pdf(Poisson, {"rate": (rate, False)}, rv, True,
                          dtype)
    expected = stats.poisson.logpmf(rv, rate[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_poisson_samples_match_moments():
    rate_v = Variable()
    dist = Poisson(rate=rate_v, dtype="float64")
    dist._generate_outputs(shape=(1,))
    env = {rate_v.uuid: jnp.asarray([[4.0]])}
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(5),
                                           num_samples=20000)).ravel()
    assert np.all(samples == np.round(samples))
    assert abs(samples.mean() - 4.0) < 0.1
    assert abs(samples.var() - 4.0) < 0.25


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_studentt_log_pdf(dtype):
    rng = np.random.default_rng(23)
    nu = rng.random((3, 2)) * 5 + 2.0
    loc = rng.standard_normal((3, 2))
    scale = rng.random((3, 2)) + 0.3
    rv = rng.standard_normal((5, 3, 2)) * 2
    result = eval_log_pdf(
        StudentT, {"degrees_of_freedom": (nu, False),
                   "location": (loc, False), "scale": (scale, False)},
        rv, True, dtype)
    expected = stats.t.logpdf(rv, nu[None], loc[None], scale[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_studentt_draw_samples_exact():
    rng = np.random.default_rng(24)
    raw = rng.standard_normal((4, 3, 2))
    gen = FixedRandomGenerator(raw)
    nu_v, loc_v, sc_v = Variable(), Variable(), Variable()
    dist = StudentT(degrees_of_freedom=nu_v, location=loc_v, scale=sc_v,
                    rand_gen=gen, dtype="float64")
    dist._generate_outputs(shape=(3, 2))
    env = {nu_v.uuid: jnp.asarray([[5.0]]),
           loc_v.uuid: jnp.asarray([[1.0]]),
           sc_v.uuid: jnp.asarray([[2.0]])}
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=4))
    assert np.allclose(samples, 1.0 + 2.0 * raw, rtol=1e-6)


def test_studentt_samples_distribution():
    nu_v, loc_v, sc_v = Variable(), Variable(), Variable()
    dist = StudentT(degrees_of_freedom=nu_v, location=loc_v, scale=sc_v,
                    dtype="float64")
    dist._generate_outputs(shape=(1,))
    env = {nu_v.uuid: jnp.asarray([[4.0]]),
           loc_v.uuid: jnp.asarray([[0.5]]),
           sc_v.uuid: jnp.asarray([[1.5]])}
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(7),
                                           num_samples=20000)).ravel()
    _, p = stats.kstest(samples, stats.t(4.0, 0.5, 1.5).cdf)
    assert p > 1e-3


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_lognormal_log_pdf(dtype):
    rng = np.random.default_rng(25)
    mean = rng.standard_normal((3, 2)) * 0.5
    var = rng.random((3, 2)) + 0.2
    rv = rng.random((5, 3, 2)) * 2 + 0.1
    result = eval_log_pdf(LogNormal, {"mean": (mean, False),
                                      "variance": (var, False)},
                          rv, True, dtype)
    expected = stats.lognorm.logpdf(rv, np.sqrt(var)[None],
                                    scale=np.exp(mean)[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_lognormal_draw_samples_exact():
    rng = np.random.default_rng(26)
    raw = rng.standard_normal((4, 3, 2))
    gen = FixedRandomGenerator(raw)
    m_v, v_v = Variable(), Variable()
    dist = LogNormal(mean=m_v, variance=v_v, rand_gen=gen, dtype="float64")
    dist._generate_outputs(shape=(3, 2))
    env = {m_v.uuid: jnp.asarray([[0.5]]), v_v.uuid: jnp.asarray([[4.0]])}
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=4))
    assert np.allclose(samples, np.exp(0.5 + 2.0 * raw), rtol=1e-6)


def test_extra_distributions_in_model_inference():
    """The new distributions compose with the inference machinery:
    recover a rate from Poisson observations via MAP."""
    from mxfusion_tpu import Model
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.inference import GradBasedInference, MAP

    rng = np.random.default_rng(30)
    true_rate = 3.5
    y = rng.poisson(true_rate, (200, 1)).astype(np.float64)

    m = Model()
    m.rate = Variable(transformation=PositiveTransformation(),
                      initial_value=1.0)
    m.y = Poisson.define_variable(rate=m.rate, shape=(200, 1))

    infr = GradBasedInference(MAP(model=m, observed=[m.y]))
    infr.run(y=y, max_iter=300, learning_rate=0.05, verbose=False)
    rate_hat = float(np.asarray(
        infr.params[m.rate]).ravel()[0])
    assert abs(rate_hat - y.mean()) < 0.05
