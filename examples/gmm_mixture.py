"""Gaussian mixture fitting with marginalized assignments.

``NormalMixture`` marginalizes the discrete component assignment
inside ``log_pdf`` (logsumexp over the component axis), so a GMM fits
with plain gradient-based MAP/SVI — no EM loop, no discrete latent,
one jitted objective.
"""
import os
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import NormalMixture
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import GradBasedInference, MAP

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N = 300 if SMOKE else 2000
MAX_ITER = 60 if SMOKE else 1200
K = 3


def main():
    rng = np.random.default_rng(0)
    true_w = np.array([0.5, 0.3, 0.2])
    true_mu = np.array([-4.0, 0.0, 3.0])
    true_sd = np.array([0.7, 0.5, 1.0])
    comp = rng.choice(K, N, p=true_w)
    y = rng.normal(true_mu[comp], true_sd[comp])[:, None]

    m = Model()
    m.w = Variable(shape=(K,), transformation=PositiveTransformation(),
                   initial_value=np.ones(K))
    m.mu = Variable(shape=(K,), initial_value=np.array([-1., 0., 1.]))
    m.var = Variable(shape=(K,), transformation=PositiveTransformation(),
                     initial_value=np.ones(K))
    m.y = NormalMixture.define_variable(
        weights=broadcast_to(m.w, (N, 1, K)),
        means=broadcast_to(m.mu, (N, 1, K)),
        variances=broadcast_to(m.var, (N, 1, K)),
        shape=(N, 1))

    infr = GradBasedInference(MAP(model=m, observed=[m.y]))
    infr.run(y=y, max_iter=MAX_ITER, learning_rate=0.05, verbose=False)

    mu_hat = np.asarray(infr.params[m.mu]).ravel()
    w_hat = np.asarray(infr.params[m.w]).ravel()
    w_hat = w_hat / w_hat.sum()
    order = np.argsort(mu_hat)
    print("means   (fit):", mu_hat[order].round(2), " true:", true_mu)
    print("weights (fit):", w_hat[order].round(2), " true:", true_w)
    return mu_hat


if __name__ == "__main__":
    main()
