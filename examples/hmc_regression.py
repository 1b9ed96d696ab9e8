"""Bayesian linear regression by HMC (TPU-native extension).

The reference has no MCMC; this shows the HMC sampler added in
mxfusion_tpu.inference.hmc — multi-chain, prior-initialized,
dual-averaging warmup, the whole chain one XLA program — recovering the
closed-form Gaussian posterior over the regression weights, with split
R-hat as the convergence check.
"""
import os
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.inference import (HMCAlgorithm, HMCInference,
                                    potential_scale_reduction)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N, D, S2 = 120, 4, 0.25
NUM_SAMPLES = 60 if SMOKE else 1000
NUM_WARMUP = 40 if SMOKE else 500


def main():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D))
    w_true = rng.standard_normal((D, 1))
    y = X @ w_true + rng.standard_normal((N, 1)) * np.sqrt(S2)

    m = Model()
    m.X = Variable(shape=(N, D))
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (D, 1)),
        variance=broadcast_to(Variable(value=1.), (D, 1)),
        shape=(D, 1))
    m.f = dot(m.X, m.w)
    m.y = Normal.define_variable(
        mean=m.f, variance=broadcast_to(Variable(value=S2), (N, 1)),
        shape=(N, 1))

    alg = HMCAlgorithm(model=m, observed=[m.X, m.y],
                       num_samples=NUM_SAMPLES, num_warmup=NUM_WARMUP,
                       num_chains=4, num_leapfrog=12)
    infr = HMCInference(inference_algorithm=alg)
    samples = infr.run(X=X, y=y)

    draws = np.asarray(samples[m.w.uuid])       # (S, chains, D, 1)
    flat = draws.reshape(-1, D)
    Sigma = np.linalg.inv(X.T @ X / S2 + np.eye(D))
    mu = Sigma @ X.T @ y[:, 0] / S2
    rhat = np.asarray(potential_scale_reduction(draws[..., 0]))
    print("posterior mean (HMC):   ", flat.mean(0).round(3))
    print("posterior mean (exact): ", mu.round(3))
    print("accept rate per chain:  ",
          infr.diagnostics["accept_rate"].round(2))
    print("split R-hat:            ", rhat.round(3))
    err = np.abs(flat.mean(0) - mu).max()
    print("max abs error:", err)
    return err


if __name__ == "__main__":
    main()
