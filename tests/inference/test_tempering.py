"""Parallel-tempering HMC.

Oracle: the y = x² posterior (observe y=4) is symmetric-bimodal at
±2 — plain HMC provably cannot cross between modes (sign-flip rate 0)
while PT's cold chains must visit both with equal weight. A conjugate
Gamma-Exponential run pins the support-bijector integration."""
import numpy as np
import jax

from mxfusion_tpu import Model
from mxfusion_tpu.components.distributions import (Normal, Gamma,
                                                   Exponential)
from mxfusion_tpu.components.functions.operators import (square,
                                                         broadcast_to)
from mxfusion_tpu.inference import (
    HMCInference, HMCAlgorithm, ParallelTemperingInference,
    ParallelTemperingAlgorithm)


def _bimodal():
    m = Model()
    m.x = Normal.define_variable(mean=0., variance=25., shape=(1,))
    m.y = Normal.define_variable(mean=square(m.x), variance=0.25,
                                 shape=(1,))
    return m


def test_pt_mixes_across_modes_where_hmc_cannot():
    y = np.array([4.0])
    m = _bimodal()
    hmc = HMCInference(HMCAlgorithm(
        model=m, observed=[m.y], num_samples=600, num_chains=4,
        num_warmup=400))
    x = np.asarray(hmc.run(y=y, key=jax.random.PRNGKey(0))[m.x.uuid])
    x = x[:, :, 0]
    hmc_flips = (np.sign(x[:-1]) != np.sign(x[1:])).mean(axis=0)
    assert np.all(hmc_flips < 0.01), hmc_flips   # stuck in one mode

    m2 = _bimodal()
    pt = ParallelTemperingInference(ParallelTemperingAlgorithm(
        model=m2, observed=[m2.y], num_samples=600, num_chains=4,
        num_temps=6, num_warmup=400))
    x2 = np.asarray(pt.run(y=y, key=jax.random.PRNGKey(0))[m2.x.uuid])
    x2 = x2[:, :, 0]
    pt_flips = (np.sign(x2[:-1]) != np.sign(x2[1:])).mean(axis=0)
    assert np.all(pt_flips > 0.05), pt_flips     # every chain crosses
    # symmetric modes at +-2 with equal weight
    assert 0.35 < (x2 > 0).mean() < 0.65
    np.testing.assert_allclose(x2[x2 > 0].mean(), 2.0, atol=0.1)
    np.testing.assert_allclose(x2[x2 < 0].mean(), -2.0, atol=0.1)
    # ladder health: every adjacent pair exchanges
    assert pt.diagnostics["swap_accept_rate"].min() > 0.2
    assert pt.diagnostics["swap_accept_rate"].shape == (5,)


def test_pt_constrained_latent_conjugate():
    # tau ~ Gamma(2,2); y ~ Exp(tau): posterior Gamma(2+N, 2+sum y) —
    # unimodal, so PT must simply agree with the closed form (pins the
    # support-bijector + tempered-Jacobian integration)
    rng = np.random.default_rng(1)
    N = 60
    y = rng.exponential(1.0 / 1.7, (N, 1))
    m = Model()
    m.tau = Gamma.define_variable(alpha=2.0, beta=2.0, shape=(1,))
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.tau, (N, 1)), shape=(N, 1))
    pt = ParallelTemperingInference(ParallelTemperingAlgorithm(
        model=m, observed=[m.y], num_samples=800, num_chains=4,
        num_temps=4, num_warmup=400))
    tau = np.asarray(pt.run(y=y, key=jax.random.PRNGKey(2))[m.tau.uuid])
    tau = tau.reshape(-1)
    assert np.all(tau > 0)
    a, b = 2 + N, 2 + y.sum()
    np.testing.assert_allclose(tau.mean(), a / b, rtol=0.05)


def test_pt_single_temperature_degenerates_to_hmc():
    y = np.array([4.0])
    m = _bimodal()
    pt = ParallelTemperingInference(ParallelTemperingAlgorithm(
        model=m, observed=[m.y], num_samples=50, num_chains=2,
        num_temps=1, num_warmup=50))
    s = pt.run(y=y, key=jax.random.PRNGKey(3))
    x = np.asarray(s[m.x.uuid])
    assert x.shape == (50, 2, 1)
    assert np.isfinite(x).all()
    assert pt.diagnostics["swap_accept_rate"].shape == (0,)
