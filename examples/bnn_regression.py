"""Bayesian neural-network regression.

Counterpart of /root/reference/examples/notebooks/bnn_regression.ipynb:
a flax MLP with Normal priors over all weights, trained with meanfield
SVI; predictions by sampling weight posteriors.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions import FlaxFunction
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield, VariationalPosteriorForwardSampling)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N = 80
MAX_ITER = 50 if SMOKE else 800


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(16)(x)
        x = jnp.tanh(x)
        return nn.Dense(1)(x)


def main():
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(-3, 3, (N, 1)), axis=0)
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1

    net = FlaxFunction(MLP(), name="f", input_shapes=[(N, 1)],
                       rng_key=jax.random.PRNGKey(0))
    m = Model()
    m.x = Variable(shape=(N, 1))
    m.r = net(m.x)
    for _, v in m.r.factor.function.parameters.items():
        v.set_prior(Normal(mean=broadcast_to(Variable(value=0.), v.shape),
                           variance=broadcast_to(Variable(value=1.),
                                                 v.shape)))
    m.noise = Variable(transformation=PositiveTransformation(),
                       initial_value=0.01)
    m.y = Normal.define_variable(mean=m.r,
                                 variance=broadcast_to(m.noise, (N, 1)),
                                 shape=(N, 1))

    q = create_Gaussian_meanfield(model=m, observed=[m.x, m.y])
    alg = StochasticVariationalInference(num_samples=5, model=m,
                                         posterior=q,
                                         observed=[m.x, m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=MAX_ITER, learning_rate=0.02, x=X, y=Y,
             callback=lambda i, l: losses.append(float(l)))
    print("loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))

    fwd = VariationalPosteriorForwardSampling(
        num_samples=100, observed=[m.x], inherited_inference=infr,
        target_variables=[m.y])
    (samples,) = fwd.run(x=X)
    pred_mean = np.asarray(samples).mean(axis=0)
    err = np.abs(pred_mean - np.sin(X)).mean()
    print("posterior predictive mean abs error vs sin(x): {:.3f}".format(
        err))
    return err


if __name__ == "__main__":
    main()
