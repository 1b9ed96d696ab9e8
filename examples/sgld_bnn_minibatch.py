"""Large-N Bayesian regression by minibatch SGLD (TPU-native extension).

The reference has no MCMC; this shows the stochastic-gradient Langevin
sampler added in mxfusion_tpu.inference.sgld: each chain step costs one
minibatch gradient (N/B-rescaled, assembled on device), so posterior
sampling scales to dataset sizes where HMC's full-data gradient is
wasteful. Four chains run vectorized on the sample axis; the entire
chain is one XLA program.
"""
import os
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.inference import (SGLDAlgorithm, SGLDInference,
                                    potential_scale_reduction)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N, D, S2, B = 20_000, 8, 0.25, 256
NUM_SAMPLES = 100 if SMOKE else 3000
NUM_BURNIN = 100 if SMOKE else 1500


def main():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D)).astype(np.float32)
    w_true = rng.standard_normal((D, 1)).astype(np.float32)
    y = X @ w_true + rng.standard_normal((N, 1)).astype(np.float32) \
        * np.sqrt(S2)

    m = Model()
    m.n = Variable()                       # symbolic data dim: binds to B
    m.X = Variable(shape=(m.n, D))
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (D, 1)),
        variance=broadcast_to(Variable(value=1.), (D, 1)),
        shape=(D, 1))
    m.f = dot(m.X, m.w)
    m.y = Normal.define_variable(
        mean=m.f, variance=broadcast_to(Variable(value=S2), (m.n, 1)),
        shape=(m.n, 1))

    alg = SGLDAlgorithm(model=m, observed=[m.X, m.y],
                        num_samples=NUM_SAMPLES, num_burnin=NUM_BURNIN,
                        num_chains=4, batch_size=B, step_size=5e-5,
                        step_decay_gamma=0.0, preconditioning=True)
    infr = SGLDInference(inference_algorithm=alg)
    samples = infr.run(X=X, y=y)

    draws = np.asarray(samples[m.w.uuid])       # (S, chains, D, 1)
    flat = draws.reshape(-1, D)
    Sigma = np.linalg.inv(X.T @ X / S2 + np.eye(D))
    mu = Sigma @ X.T @ y[:, 0] / S2
    rhat = np.asarray(potential_scale_reduction(draws[..., 0]))
    print("posterior mean (SGLD):  ", flat.mean(0).round(3))
    print("posterior mean (exact): ", mu.round(3))
    print("split R-hat:            ", rhat.round(3))
    err = np.abs(flat.mean(0) - mu).max()
    print("max abs error:", err)
    return err


if __name__ == "__main__":
    main()
