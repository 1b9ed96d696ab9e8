"""Model comparison: WAIC, PSIS-LOO, and Bayes factors.

Fit two candidate models by HMC — a correctly specified Gaussian
likelihood and one with a badly wrong fixed variance — and let the
information criteria pick the winner from one batched
pointwise-log-likelihood evaluation per model; then compare the same
candidates by thermodynamic-integration marginal likelihoods (a log
Bayes factor of ~90 nats for the true model).
"""
import os
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (HMCAlgorithm, HMCInference,
                                    pointwise_log_likelihood, waic,
                                    loo_psis)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N = 80
NUM_SAMPLES = 80 if SMOKE else 500
NUM_WARMUP = 60 if SMOKE else 400


def fit(y, lik_var, seed):
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=lik_var), (N, 1)),
                                 shape=(N, 1))
    alg = HMCAlgorithm(model=m, observed=[m.y],
                       num_samples=NUM_SAMPLES, num_warmup=NUM_WARMUP,
                       num_chains=4, num_leapfrog=8)
    infr = HMCInference(inference_algorithm=alg)
    infr.run(y=y, key=jax.random.PRNGKey(seed))
    return infr


def main():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * 1.0 + 2.0   # true variance: 1

    results = {}
    for seed, (name, lik_var) in enumerate(
            [("var=1 (true)", 1.0), ("var=25 (wrong)", 25.0)]):
        infr = fit(y, lik_var, seed=seed)
        ll = pointwise_log_likelihood(infr, y=y)["y"]
        w, l = waic(ll), loo_psis(ll)
        results[name] = (w, l)
        print("{:16s} elpd_waic={:8.2f}  elpd_loo={:8.2f}  "
              "p_waic={:.2f}  max pareto_k={:.2f}".format(
                  name, w["elpd_waic"], l["elpd_loo"], w["p_waic"],
                  l["pareto_k"].max()))

    best = max(results, key=lambda k: results[k][0]["elpd_waic"])
    print("preferred model:", best)

    # Bayes factor via thermodynamic-integration evidence: the same
    # two candidates, now compared by their exact marginal likelihoods
    from mxfusion_tpu.inference import (PowerPosteriorAlgorithm,
                                        PowerPosteriorInference)
    logZ = {}
    for seed, (name, lik_var) in enumerate(
            [("var=1 (true)", 1.0), ("var=25 (wrong)", 25.0)]):
        m = Model()
        m.mu = Normal.define_variable(mean=0., variance=100.,
                                      shape=(1,))
        m.y = Normal.define_variable(
            mean=broadcast_to(m.mu, (N, 1)),
            variance=broadcast_to(Variable(value=lik_var), (N, 1)),
            shape=(N, 1))
        ev = PowerPosteriorInference(PowerPosteriorAlgorithm(
            model=m, observed=[m.y], num_samples=NUM_SAMPLES,
            num_warmup=NUM_WARMUP, num_chains=2,
            num_temps=8 if SMOKE else 16))
        ev.run(y=y, key=jax.random.PRNGKey(10 + seed))
        logZ[name] = ev.log_evidence
        print("{:16s} TI log-evidence = {:8.2f}".format(
            name, ev.log_evidence))
    names = list(logZ)
    print("log Bayes factor ({} vs {}): {:.1f}".format(
        names[0], names[1], logZ[names[0]] - logZ[names[1]]))
    if not SMOKE:
        assert logZ["var=1 (true)"] > logZ["var=25 (wrong)"]
    return best


if __name__ == "__main__":
    main()
