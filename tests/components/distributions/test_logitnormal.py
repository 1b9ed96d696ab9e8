"""LogitNormal: density vs an independent numpy change-of-variables
derivation, sampling vs the underlying normal, and KS check."""
import numpy as np
import pytest
from scipy import stats

from mxfusion_tpu.components.variables.variable import Variable
from mxfusion_tpu.components.distributions import (LogitNormal,
                                                   FixedRandomGenerator)
from mxfusion_tpu.util.testutils import prepare_runtime_array


def eval_log_pdf(param_values, rv_value, dtype):
    inputs = {name: Variable() for name in param_values}
    dist = LogitNormal(dtype=dtype, **inputs)
    dist._generate_outputs(shape=np.asarray(rv_value).shape[1:])
    env = {}
    for name, (value, has_samples) in param_values.items():
        env[inputs[name].uuid] = prepare_runtime_array(value, has_samples,
                                                       dtype)
    env[dist.random_variable.uuid] = prepare_runtime_array(
        rv_value, True, dtype)
    return np.asarray(dist.log_pdf(env))


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_logitnormal_log_pdf(dtype):
    rng = np.random.default_rng(0)
    mean = rng.standard_normal((3, 2))
    variance = rng.random((3, 2)) + 0.3
    rv = rng.random((5, 3, 2)) * 0.98 + 0.01
    result = eval_log_pdf({"mean": (mean, False),
                           "variance": (variance, False)}, rv, dtype)
    # change of variables: z = logit(x), |dz/dx| = 1/(x (1-x))
    z = np.log(rv) - np.log1p(-rv)
    expected = stats.norm.logpdf(z, loc=mean[None],
                                 scale=np.sqrt(variance)[None]) \
        - np.log(rv) - np.log1p(-rv)
    rtol, atol = ((1e-7, 1e-10) if dtype == "float64" else (1e-3, 1e-3))
    assert np.allclose(result, expected, rtol=rtol, atol=atol)


def test_logitnormal_sampling_matches_transformed_normal():
    rng = np.random.default_rng(1)
    raw = rng.standard_normal(1000)
    gen = FixedRandomGenerator(raw)
    mean_v, var_v = Variable(), Variable()
    dist = LogitNormal(mean=mean_v, variance=var_v, rand_gen=gen,
                       dtype="float64")
    dist._generate_outputs(shape=(1000,))
    import jax
    env = {mean_v.uuid: prepare_runtime_array(np.array(0.4), False,
                                              "float64"),
           var_v.uuid: prepare_runtime_array(np.array(2.1), False,
                                             "float64")}
    s = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                     num_samples=1))[0]
    expected = 1.0 / (1.0 + np.exp(-(0.4 + np.sqrt(2.1) * raw)))
    np.testing.assert_allclose(s, expected, rtol=1e-12)
    assert np.all((s > 0) & (s < 1))


def test_logitnormal_density_integrates_to_one():
    # trapezoid over (0,1) at f64: the Jacobian term must normalize
    x = np.linspace(1e-6, 1 - 1e-6, 200001)
    lp = eval_log_pdf({"mean": (np.array(0.7), False),
                       "variance": (np.array(1.3), False)},
                      x[None], "float64")[0]
    total = np.trapezoid(np.exp(lp), x)
    np.testing.assert_allclose(total, 1.0, atol=1e-4)
