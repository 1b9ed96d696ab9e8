"""MCMC throughput on the real TPU: SGLD and HMC chain steps/sec.

Workload: Bayesian linear regression, N=100k x D=32 (SGLD: B=1024
minibatch; HMC: full-data gradient), 8 chains vectorized on the sample
axis, whole chain one XLA program. Honest-timing protocol (CLAUDE.md):
enqueue the chain, fetch one dependent scalar, amortize.

Usage: python benchmarks/mcmc_throughput.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


N, D, B, CHAINS = 100_000, 32, 1024, 8


def _make_data():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D)).astype(np.float32)
    w_true = rng.standard_normal((D, 1)).astype(np.float32)
    y = (X @ w_true + 0.5 * rng.standard_normal((N, 1))).astype(
        np.float32)
    return X, y


def _build(symbolic):
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.distributions import Normal
    from mxfusion_tpu.components.functions.operators import (
        broadcast_to, dot)
    m = Model()
    if symbolic:
        m.n = Variable()
        n = m.n
    else:
        n = N
    m.X = Variable(shape=(n, D))
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (D, 1)),
        variance=broadcast_to(Variable(value=1.), (D, 1)),
        shape=(D, 1))
    m.f = dot(m.X, m.w)
    m.y = Normal.define_variable(
        mean=m.f, variance=broadcast_to(Variable(value=0.25),
                                        (n, 1)),
        shape=(n, 1))
    return m


def measure_chees(num_samples=1000, num_warmup=200):
    """Compact ChEES-HMC tier for bench.py: full-data Bayesian linear
    regression (N=100k, D=32), 8 chains, whole chain one XLA program.
    Returns draws/s (kept draws over steady-state wall clock) and
    full-data gradient evals/s."""
    import jax
    import jax.numpy as jnp
    from mxfusion_tpu.inference import (ChEESHMCAlgorithm,
                                        ChEESHMCInference)

    X, y = _make_data()
    m = _build(False)
    alg = ChEESHMCAlgorithm(model=m, observed=[m.X, m.y],
                            num_samples=num_samples,
                            num_warmup=num_warmup, num_chains=CHAINS)
    infr = ChEESHMCInference(inference_algorithm=alg)
    t0 = time.perf_counter()
    s = infr.run(X=X, y=y, key=jax.random.PRNGKey(0))
    float(jnp.asarray(s[m.w.uuid]).reshape(-1)[0])
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = infr.run(X=X, y=y, key=jax.random.PRNGKey(1))
    float(jnp.asarray(s[m.w.uuid]).reshape(-1)[0])
    run_t = time.perf_counter() - t0
    mean_leap = float(infr.diagnostics["mean_leapfrog_steps"])
    grads = (num_samples + num_warmup) * (mean_leap + 1)
    print("ChEES (N=100k full-data, D=%d, %d chains): %d kept draws "
          "in %.2f s = %.0f draws/s; ~%.0f full-data gradient evals/s "
          "(mean L=%.1f; first run incl. compile %.1f s)" % (
              D, CHAINS, num_samples, run_t, num_samples / run_t,
              grads / run_t, mean_leap, total), flush=True)
    return {"config": "chees_blr_n100k_d32_c8",
            "draws_per_sec": round(num_samples / run_t, 1),
            "grad_evals_per_sec": round(grads / run_t),
            "accept_rate": round(
                float(np.mean(infr.diagnostics["accept_rate"])), 3)}


def main():
    import jax
    import jax.numpy as jnp
    from mxfusion_tpu.inference import (SGLDAlgorithm, SGLDInference,
                                        HMCAlgorithm, HMCInference)

    X, y = _make_data()
    build = _build

    # ---- SGLD minibatch
    steps = 20_000
    m = build(True)
    alg = SGLDAlgorithm(model=m, observed=[m.X, m.y],
                        num_samples=steps, num_burnin=0, num_chains=CHAINS,
                        batch_size=B, step_size=1e-5,
                        step_decay_gamma=0.0)
    infr = SGLDInference(inference_algorithm=alg)
    t0 = time.perf_counter()
    samples = infr.run(X=X, y=y, key=jax.random.PRNGKey(0))
    w_draws = samples[m.w.uuid]
    float(jnp.asarray(w_draws).reshape(-1)[0])
    total = time.perf_counter() - t0
    # second run: compile cached, honest steady-state number
    t0 = time.perf_counter()
    samples = infr.run(X=X, y=y, key=jax.random.PRNGKey(1))
    float(jnp.asarray(samples[m.w.uuid]).reshape(-1)[0])
    run_t = time.perf_counter() - t0
    print("SGLD  (N=100k, B=%d, D=%d, %d chains): %d steps in %.2f s "
          "= %.0f chain-steps/s (%.1f us/step; first run incl. "
          "compile %.1f s)" % (B, D, CHAINS, steps, run_t,
                               steps / run_t, run_t / steps * 1e6,
                               total))

    # ---- HMC full-data
    hmc_samples, leap = 2_000, 8
    m2 = build(False)
    alg2 = HMCAlgorithm(model=m2, observed=[m2.X, m2.y],
                        num_samples=hmc_samples, num_warmup=200,
                        num_chains=CHAINS, num_leapfrog=leap,
                        step_size=0.01)
    infr2 = HMCInference(inference_algorithm=alg2)
    t0 = time.perf_counter()
    s2 = infr2.run(X=X, y=y, key=jax.random.PRNGKey(2))
    float(jnp.asarray(s2[m2.w.uuid]).reshape(-1)[0])
    total2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2 = infr2.run(X=X, y=y, key=jax.random.PRNGKey(3))
    float(jnp.asarray(s2[m2.w.uuid]).reshape(-1)[0])
    run2 = time.perf_counter() - t0
    grads = (hmc_samples + 200) * (leap + 1)
    print("HMC   (N=100k full-data, D=%d, %d chains, L=%d): %d kept "
          "draws in %.2f s = %.0f draws/s; %.0f full-data gradient "
          "evals/s (first run incl. compile %.1f s)" % (
              D, CHAINS, leap, hmc_samples, run2, hmc_samples / run2,
              grads / run2, total2))
    print("accept:", infr2.diagnostics["accept_rate"].round(2))

    # ---- PT replica-exchange (6 temperatures x 8 chains = 48 replicas)
    from mxfusion_tpu.inference import (ParallelTemperingAlgorithm,
                                        ParallelTemperingInference)
    pt_samples, K_t = 1_000, 6
    m3 = build(False)
    alg3 = ParallelTemperingAlgorithm(
        model=m3, observed=[m3.X, m3.y], num_samples=pt_samples,
        num_warmup=200, num_chains=CHAINS, num_temps=K_t,
        num_leapfrog=leap, step_size=0.01)
    infr3 = ParallelTemperingInference(inference_algorithm=alg3)
    t0 = time.perf_counter()
    s3 = infr3.run(X=X, y=y, key=jax.random.PRNGKey(4))
    float(jnp.asarray(s3[m3.w.uuid]).reshape(-1)[0])
    total3 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s3 = infr3.run(X=X, y=y, key=jax.random.PRNGKey(5))
    float(jnp.asarray(s3[m3.w.uuid]).reshape(-1)[0])
    run3 = time.perf_counter() - t0
    print("PT    (N=100k full-data, D=%d, %d chains x %d temps, L=%d):"
          " %d cold draws in %.2f s = %.0f draws/s (first run incl. "
          "compile %.1f s)" % (D, CHAINS, K_t, leap, pt_samples, run3,
                               pt_samples / run3, total3))
    print("swap accept:", infr3.diagnostics["swap_accept_rate"].round(2))

    # ---- ChEES-HMC adaptive tier (also the bench.py mcmc tier)
    measure_chees()


if __name__ == "__main__":
    main()
