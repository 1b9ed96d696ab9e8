"""Bayesian neural-network classification.

Counterpart of /root/reference/examples/notebooks/bnn_classification.ipynb:
two-moon-style binary classification with a Categorical likelihood over
network logits and Normal priors over weights.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal, Categorical
from mxfusion_tpu.components.functions import FlaxFunction
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N = 100
MAX_ITER = 50 if SMOKE else 600


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(16)(x)
        x = jnp.tanh(x)
        return nn.Dense(2)(x)


def make_moons(n, rng):
    t = rng.uniform(0, np.pi, n)
    upper = np.stack([np.cos(t), np.sin(t)], -1)
    lower = np.stack([1 - np.cos(t), -np.sin(t) + 0.5], -1)
    X = np.concatenate([upper, lower]) + rng.standard_normal(
        (2 * n, 2)) * 0.1
    y = np.concatenate([np.zeros(n), np.ones(n)])[:, None]
    return X.astype(np.float64), y


def main():
    rng = np.random.default_rng(0)
    X, Y = make_moons(N // 2, rng)
    n = len(X)

    net = FlaxFunction(MLP(), name="f", input_shapes=[(n, 2)],
                       rng_key=jax.random.PRNGKey(0))
    m = Model()
    m.x = Variable(shape=(n, 2))
    m.r = net(m.x)
    for _, v in m.r.factor.function.parameters.items():
        v.set_prior(Normal(mean=broadcast_to(Variable(value=0.), v.shape),
                           variance=broadcast_to(Variable(value=1.),
                                                 v.shape)))
    m.y = Categorical.define_variable(log_prob=m.r, num_classes=2,
                                      shape=(n, 1))

    q = create_Gaussian_meanfield(model=m, observed=[m.x, m.y])
    alg = StochasticVariationalInference(num_samples=5, model=m,
                                         posterior=q,
                                         observed=[m.x, m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=MAX_ITER, learning_rate=0.02, x=X, y=Y,
             callback=lambda i, l: losses.append(float(l)))
    print("loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))

    # predict with posterior-mean weights
    params = {}
    for name, v in m.r.factor.function.parameters.items():
        params[name] = jnp.asarray(
            np.asarray(infr.params[q[v].factor.mean]))
    logits = m.r.factor.function.eval(params, f_input_0=jnp.asarray(X))
    acc = float((np.asarray(logits).argmax(-1) == Y[:, 0]).mean())
    print("train accuracy with posterior-mean weights: {:.3f}".format(acc))
    return acc


if __name__ == "__main__":
    main()
