"""Univariate distribution log_pdf/draw_samples vs scipy oracles.

Mirrors the reference's test strategy
(/root/reference/testing/components/distributions/normal_test.py:24-68):
parametrize dtype × sample/no-sample per argument, compare against
scipy.stats with dtype-dependent tolerances; test sampling exactly by
injecting a deterministic FixedRandomGenerator.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu.components.variables.variable import Variable
from mxfusion_tpu.components.distributions import (
    Normal, NormalMeanPrecision, Gamma, GammaMeanVariance, Bernoulli, Beta,
    Uniform, Laplace, PointMass, FixedRandomGenerator)
from mxfusion_tpu.util.testutils import (
    numpy_array_reshape, prepare_runtime_array)


def _tols(dtype):
    # float64 matches the reference's oracle tolerances
    # (normal_test.py:63-67); float32 is slightly looser because the
    # oracle itself runs in float64.
    return (1e-7, 1e-10) if dtype == "float64" else (1e-3, 1e-3)


def eval_log_pdf(dist_cls, param_values, rv_value, rv_has_samples,
                 dtype, **dist_kw):
    """Build the factor with fresh input Variables, run log_pdf on a raw
    env, and return the per-sample result as numpy."""
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


@pytest.mark.parametrize(
    "dtype, mean_s, var_s, rv_s, n_samples",
    [("float64", True, True, True, 5),
     ("float64", False, True, True, 5),
     ("float64", True, False, True, 5),
     ("float64", False, False, False, 1),
     ("float32", True, True, True, 5)])
def test_normal_log_pdf(dtype, mean_s, var_s, rv_s, n_samples):
    rng = np.random.default_rng(0)
    mean = rng.standard_normal((n_samples, 3, 2) if mean_s else (3, 2))
    var = rng.random((n_samples, 3, 2) if var_s else (3, 2)) + 0.1
    rv = rng.standard_normal((n_samples, 3, 2) if rv_s else (3, 2))
    result = eval_log_pdf(
        Normal, {"mean": (mean, mean_s), "variance": (var, var_s)},
        rv, rv_s, dtype)
    mean_np = numpy_array_reshape(mean, mean_s, 3)
    var_np = numpy_array_reshape(var, var_s, 3)
    rv_np = numpy_array_reshape(rv, rv_s, 3)
    expected = stats.norm.logpdf(rv_np, mean_np, np.sqrt(var_np))
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_normal_draw_samples_exact():
    # injecting a fixed generator makes sampling deterministic
    rng = np.random.default_rng(1)
    eps = rng.standard_normal((4, 3, 2))
    gen = FixedRandomGenerator(eps)
    mean_v, var_v = Variable(), Variable()
    dist = Normal(mean=mean_v, variance=var_v, rand_gen=gen,
                  dtype="float64")
    dist._generate_outputs(shape=(3, 2))
    env = {mean_v.uuid: jnp.asarray([[2.0]]),
           var_v.uuid: jnp.asarray([[4.0]])}
    samples = dist.draw_samples(env, jax.random.PRNGKey(0), num_samples=4)
    expected = 2.0 + 2.0 * eps
    assert np.allclose(np.asarray(samples), expected, rtol=1e-6)


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_normal_mean_precision_log_pdf(dtype):
    rng = np.random.default_rng(2)
    mean = rng.standard_normal((3, 2))
    prec = rng.random((3, 2)) + 0.5
    rv = rng.standard_normal((5, 3, 2))
    result = eval_log_pdf(
        NormalMeanPrecision,
        {"mean": (mean, False), "precision": (prec, False)}, rv, True,
        dtype)
    expected = stats.norm.logpdf(rv, mean[None], np.sqrt(1.0 / prec)[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_gamma_log_pdf(dtype):
    rng = np.random.default_rng(3)
    alpha = rng.random((3, 2)) * 3 + 0.5
    beta = rng.random((3, 2)) * 2 + 0.5
    rv = rng.random((5, 3, 2)) + 0.1
    result = eval_log_pdf(Gamma, {"alpha": (alpha, False),
                                  "beta": (beta, False)}, rv, True, dtype)
    expected = stats.gamma.logpdf(rv, alpha[None], scale=1.0 / beta[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_gamma_mean_variance_log_pdf():
    rng = np.random.default_rng(4)
    mean = rng.random((3, 2)) * 2 + 0.5
    var = rng.random((3, 2)) + 0.2
    rv = rng.random((5, 3, 2)) + 0.1
    result = eval_log_pdf(GammaMeanVariance, {"mean": (mean, False),
                                              "variance": (var, False)},
                          rv, True, "float64")
    beta = mean / var
    alpha = mean * beta
    expected = stats.gamma.logpdf(rv, alpha[None], scale=1.0 / beta[None])
    assert np.allclose(result, expected, rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_bernoulli_log_pdf(dtype):
    rng = np.random.default_rng(5)
    p = rng.random((3, 2)) * 0.8 + 0.1
    rv = (rng.random((5, 3, 2)) > 0.5).astype(np.float64)
    result = eval_log_pdf(Bernoulli, {"prob_true": (p, False)}, rv, True,
                          dtype)
    expected = stats.bernoulli.logpmf(rv, p[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_beta_log_pdf(dtype):
    rng = np.random.default_rng(6)
    a = rng.random((3, 2)) * 2 + 0.5
    b = rng.random((3, 2)) * 2 + 0.5
    rv = rng.random((5, 3, 2)) * 0.8 + 0.1
    result = eval_log_pdf(Beta, {"alpha": (a, False), "beta": (b, False)},
                          rv, True, dtype)
    expected = stats.beta.logpdf(rv, a[None], b[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_beta_draw_samples_composed_from_gammas():
    rng = np.random.default_rng(7)
    raw = rng.random((2, 4, 3, 2)) + 0.5
    gen = FixedRandomGenerator(raw)
    a_v, b_v = Variable(), Variable()
    dist = Beta(alpha=a_v, beta=b_v, rand_gen=gen, dtype="float64")
    dist._generate_outputs(shape=(3, 2))
    env = {a_v.uuid: jnp.asarray([[2.0]]), b_v.uuid: jnp.asarray([[3.0]])}
    samples = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                           num_samples=4))
    g = raw.reshape(-1)[:24].reshape(4, 3, 2)
    h = raw.reshape(-1)[24:48].reshape(4, 3, 2)
    assert np.allclose(samples, g / (g + h), rtol=1e-6)


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_uniform_log_pdf(dtype):
    rng = np.random.default_rng(8)
    low = rng.random((3, 2))
    high = low + rng.random((3, 2)) + 0.5
    rv = low[None] + (high - low)[None] * rng.random((5, 3, 2))
    result = eval_log_pdf(Uniform, {"low": (low, False),
                                    "high": (high, False)}, rv, True, dtype)
    expected = stats.uniform.logpdf(rv, low[None], (high - low)[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_uniform_log_pdf_outside_support():
    low = np.zeros((2, 2))
    high = np.ones((2, 2))
    rv = np.full((1, 2, 2), 2.0)
    result = eval_log_pdf(Uniform, {"low": (low, False),
                                    "high": (high, False)}, rv, True,
                          "float64")
    assert np.all(np.isneginf(result))


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_laplace_log_pdf(dtype):
    rng = np.random.default_rng(9)
    loc = rng.standard_normal((3, 2))
    scale = rng.random((3, 2)) + 0.3
    rv = rng.standard_normal((5, 3, 2))
    result = eval_log_pdf(Laplace, {"location": (loc, False),
                                    "scale": (scale, False)}, rv, True,
                          dtype)
    expected = stats.laplace.logpdf(rv, loc[None], scale[None])
    rtol, atol = _tols(dtype)
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_pointmass_log_pdf_zero_and_sampling():
    loc_v = Variable()
    dist = PointMass(location=loc_v, dtype="float64")
    dist._generate_outputs(shape=(3,))
    loc = jnp.asarray([[1.0, 2.0, 3.0]])
    env = {loc_v.uuid: loc, dist.random_variable.uuid: loc}
    assert np.all(np.asarray(dist.log_pdf(env)) == 0.0)
    samples = dist.draw_samples(env, jax.random.PRNGKey(0), num_samples=3)
    assert samples.shape == (3, 3)
    assert np.allclose(np.asarray(samples), np.asarray(loc))


def test_distributional_sampling_moments():
    # histogram-free analogue of the reference's plot checks: KS test
    key = jax.random.PRNGKey(0)
    mean_v, var_v = Variable(), Variable()
    dist = Normal(mean=mean_v, variance=var_v, dtype="float64")
    dist._generate_outputs(shape=(1,))
    env = {mean_v.uuid: jnp.asarray([[1.5]]), var_v.uuid: jnp.asarray([[2.0]])}
    samples = np.asarray(dist.draw_samples(env, key,
                                           num_samples=20000)).ravel()
    _, pvalue = stats.kstest(samples, "norm",
                             args=(1.5, np.sqrt(2.0)))
    assert pvalue > 0.01


# ---------------------------------------------------------------------------
# Full per-argument sample/no-sample x dtype product sweeps, mirroring the
# reference's parametrization (normal_test.py:24-68): every univariate
# distribution is checked against its scipy oracle for every combination of
# "parameter carries a sample axis" per parameter and for the random
# variable, in both dtypes.
# ---------------------------------------------------------------------------

def _sweep_case(rng, shape, n_samples, has_s, positive=False, offset=0.0):
    full = (n_samples,) + shape if has_s else shape
    a = rng.random(full) + 0.1 if positive else rng.standard_normal(full)
    return a + offset


_SWEEP_SPECS = {
    "normal": (Normal, ("mean", "variance"), (False, True),
               lambda mean, variance, rv: stats.norm.logpdf(
                   rv, mean, np.sqrt(variance))),
    "normal_mean_precision": (
        NormalMeanPrecision, ("mean", "precision"), (False, True),
        lambda mean, precision, rv: stats.norm.logpdf(
            rv, mean, np.sqrt(1.0 / precision))),
    "gamma": (Gamma, ("alpha", "beta"), (True, True),
              lambda alpha, beta, rv: stats.gamma.logpdf(
                  rv, alpha, scale=1.0 / beta)),
    "gamma_mean_variance": (
        GammaMeanVariance, ("mean", "variance"), (True, True),
        lambda mean, variance, rv: stats.gamma.logpdf(
            rv, mean * mean / variance, scale=variance / mean)),
    "beta": (Beta, ("alpha", "beta"), (True, True),
             lambda alpha, beta, rv: stats.beta.logpdf(rv, alpha, beta)),
    "laplace": (Laplace, ("location", "scale"), (False, True),
                lambda location, scale, rv: stats.laplace.logpdf(
                    rv, location, scale)),
}


@pytest.mark.parametrize("name", sorted(_SWEEP_SPECS))
@pytest.mark.parametrize("dtype", ["float64", "float32"])
@pytest.mark.parametrize("p1_s,p2_s,rv_s", [
    (True, True, True), (True, False, True), (False, True, True),
    (False, False, True), (True, True, False), (False, False, False)])
def test_univariate_log_pdf_sweep(name, dtype, p1_s, p2_s, rv_s):
    dist_cls, pnames, positive, oracle = _SWEEP_SPECS[name]
    import zlib
    rng = np.random.default_rng(zlib.crc32(repr(
        (name, dtype, p1_s, p2_s, rv_s)).encode()))
    shape, S = (3, 2), 4
    p1 = _sweep_case(rng, shape, S, p1_s, positive=positive[0])
    p2 = _sweep_case(rng, shape, S, p2_s, positive=positive[1])
    if name == "beta":
        rv = _sweep_case(rng, shape, S, rv_s, positive=True) % 0.8 + 0.1
    elif name in ("gamma", "gamma_mean_variance"):
        rv = _sweep_case(rng, shape, S, rv_s, positive=True)
    else:
        rv = _sweep_case(rng, shape, S, rv_s)
    result = eval_log_pdf(
        dist_cls, {pnames[0]: (p1, p1_s), pnames[1]: (p2, p2_s)},
        rv, rv_s, dtype)
    n_out = S if (p1_s or p2_s or rv_s) else 1
    p1_np = numpy_array_reshape(p1, p1_s, 3)
    p2_np = numpy_array_reshape(p2, p2_s, 3)
    rv_np = numpy_array_reshape(rv, rv_s, 3)
    expected = np.broadcast_to(oracle(p1_np, p2_np, rv_np),
                               (n_out,) + shape)
    rtol, atol = _tols(dtype)
    assert result.shape == (n_out,) + shape
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


@pytest.mark.parametrize("name", sorted(_SWEEP_SPECS))
def test_univariate_log_pdf_gradients_finite(name):
    """d(log_pdf)/d(params) exists and matches finite differences."""
    dist_cls, pnames, positive, oracle = _SWEEP_SPECS[name]
    rng = np.random.default_rng(17)
    shape = (2,)
    p1 = _sweep_case(rng, shape, 1, False, positive=positive[0],
                     offset=0.5 if positive[0] else 0.0)
    p2 = _sweep_case(rng, shape, 1, False, positive=positive[1],
                     offset=0.5)
    rv = (_sweep_case(rng, shape, 1, False, positive=True) % 0.8 + 0.1
          if name == "beta" else
          _sweep_case(rng, shape, 1, False,
                      positive=name.startswith("gamma")))

    def f(p1v, p2v):
        inputs = {pnames[0]: Variable(), pnames[1]: Variable()}
        dist = dist_cls(dtype="float64", **inputs)
        dist._generate_outputs(shape=shape)
        env = {inputs[pnames[0]].uuid: p1v[None],
               inputs[pnames[1]].uuid: p2v[None],
               dist.random_variable.uuid: jnp.asarray(rv)[None]}
        return jnp.sum(dist.log_pdf(env))

    g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.asarray(p1), jnp.asarray(p2))
    eps = 1e-6
    for i in range(shape[0]):
        e = np.zeros(shape)
        e[i] = eps
        fd1 = (f(jnp.asarray(p1 + e), jnp.asarray(p2)) -
               f(jnp.asarray(p1 - e), jnp.asarray(p2))) / (2 * eps)
        fd2 = (f(jnp.asarray(p1), jnp.asarray(p2 + e)) -
               f(jnp.asarray(p1), jnp.asarray(p2 - e))) / (2 * eps)
        assert np.isclose(float(g1[i]), float(fd1), rtol=1e-4), name
        assert np.isclose(float(g2[i]), float(fd2), rtol=1e-4), name
