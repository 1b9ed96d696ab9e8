"""GaussianAR1: density vs numpy, sampling stationarity, and the
stochastic-volatility workload (HMC over the latent path)."""
import numpy as np
import jax
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables.variable import Variable as V
from mxfusion_tpu.components.distributions import GaussianAR1, Normal
from mxfusion_tpu.components.functions.operators import exp
from mxfusion_tpu.util.testutils import prepare_runtime_array


def test_ar1_log_pdf_vs_numpy():
    rng = np.random.default_rng(0)
    T = 15
    phi, nv, m0, v0 = 0.8, 0.3, -0.5, 1.2
    x = rng.standard_normal((4, T))
    inputs = {n: V() for n in ("phi", "noise_var", "init_mean",
                               "init_var")}
    dist = GaussianAR1(dtype="float64", **inputs)
    dist._generate_outputs(shape=(T,))
    env = {inputs["phi"].uuid: prepare_runtime_array(
               np.array(phi), False, "float64"),
           inputs["noise_var"].uuid: prepare_runtime_array(
               np.array(nv), False, "float64"),
           inputs["init_mean"].uuid: prepare_runtime_array(
               np.array(m0), False, "float64"),
           inputs["init_var"].uuid: prepare_runtime_array(
               np.array(v0), False, "float64"),
           dist.random_variable.uuid: prepare_runtime_array(
               x, True, "float64")}
    result = np.asarray(dist.log_pdf(env))
    expected = stats.norm.logpdf(x[:, 0], m0, np.sqrt(v0)) + \
        stats.norm.logpdf(x[:, 1:], phi * x[:, :-1],
                          np.sqrt(nv)).sum(-1)
    np.testing.assert_allclose(result.sum(-1), expected, rtol=1e-9)


def test_ar1_sampling_stationary_statistics():
    T, phi, nv = 400, 0.9, 0.19
    var_stat = nv / (1 - phi ** 2)
    inputs = {n: V() for n in ("phi", "noise_var", "init_mean",
                               "init_var")}
    dist = GaussianAR1(dtype="float64", **inputs)
    dist._generate_outputs(shape=(T,))
    env = {inputs["phi"].uuid: prepare_runtime_array(
               np.array(phi), False, "float64"),
           inputs["noise_var"].uuid: prepare_runtime_array(
               np.array(nv), False, "float64"),
           inputs["init_mean"].uuid: prepare_runtime_array(
               np.array(0.0), False, "float64"),
           inputs["init_var"].uuid: prepare_runtime_array(
               np.array(var_stat), False, "float64")}
    s = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                     num_samples=200))
    assert s.shape == (200, T)
    np.testing.assert_allclose(s.var(), var_stat, rtol=0.1)
    # lag-1 autocorrelation ~ phi
    ac = np.mean([np.corrcoef(s[i, :-1], s[i, 1:])[0, 1]
                  for i in range(50)])
    np.testing.assert_allclose(ac, phi, atol=0.05)


def test_stochastic_volatility_hmc_recovers_latent_path():
    from mxfusion_tpu.inference.hmc import HMCInference, HMCAlgorithm
    rng = np.random.default_rng(0)
    T = 150
    phi_true, sig_true = 0.95, 0.25
    x = np.zeros(T)
    x[0] = rng.standard_normal() * 0.5 - 1.0
    for t in range(1, T):
        x[t] = phi_true * x[t - 1] + sig_true * rng.standard_normal()
    y = np.exp(x / 2) * rng.standard_normal(T)

    m = Model()
    m.x = GaussianAR1.define_variable(
        phi=Variable(value=phi_true),
        noise_var=Variable(value=sig_true ** 2),
        init_mean=Variable(value=-1.0), init_var=Variable(value=1.0),
        shape=(T,))
    m.y = Normal.define_variable(mean=Variable(value=np.zeros(T)),
                                 variance=exp(m.x), shape=(T,))
    infr = HMCInference(HMCAlgorithm(
        model=m, observed=[m.y], num_samples=300, num_chains=2,
        num_warmup=300, num_leapfrog=16))
    s = infr.run(y=y, key=jax.random.PRNGKey(0))
    xs = np.asarray(s[m.x.uuid])
    x_mean = xs.mean(axis=(0, 1))
    corr = np.corrcoef(x_mean, x)[0, 1]
    assert corr > 0.5, corr
    assert infr.diagnostics["accept_rate"].min() > 0.5


def test_ar1_rejects_time_shaped_parameters():
    import pytest
    T = 10
    inputs = {n: V() for n in ("phi", "noise_var", "init_mean",
                               "init_var")}
    dist = GaussianAR1(dtype="float64", **inputs)
    dist._generate_outputs(shape=(T,))
    env = {inputs["phi"].uuid: prepare_runtime_array(
               np.full(T, 0.9), False, "float64"),   # (T,): invalid
           inputs["noise_var"].uuid: prepare_runtime_array(
               np.array(0.1), False, "float64"),
           inputs["init_mean"].uuid: prepare_runtime_array(
               np.array(0.0), False, "float64"),
           inputs["init_var"].uuid: prepare_runtime_array(
               np.array(1.0), False, "float64"),
           dist.random_variable.uuid: prepare_runtime_array(
               np.zeros((2, T)), True, "float64")}
    with pytest.raises(ValueError, match="time-constant"):
        dist.log_pdf(env)
