"""Variational auto-encoder.

Counterpart of /root/reference/examples/notebooks/
variational_auto_encoder.ipynb: a flax decoder inside the generative
model and a flax encoder inside the variational posterior (amortized
inference), trained jointly by reparameterized SVI.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mxfusion_tpu import Model, Posterior, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions import FlaxFunction
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N, D, K = 100, 8, 2
MAX_ITER = 40 if SMOKE else 1000


class Decoder(nn.Module):
    out: int

    @nn.compact
    def __call__(self, z):
        h = jnp.tanh(nn.Dense(16)(z))
        return nn.Dense(self.out)(h)


class Encoder(nn.Module):
    latent: int

    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(nn.Dense(16)(x))
        mean = nn.Dense(self.latent)(h)
        log_var = nn.Dense(self.latent)(h)
        return mean, jnp.exp(log_var) + 1e-6


def main():
    rng = np.random.default_rng(0)
    z_true = rng.standard_normal((N, K))
    proj = rng.standard_normal((K, D))
    x = np.tanh(z_true @ proj) + rng.standard_normal((N, D)) * 0.05

    decoder = FlaxFunction(Decoder(out=D), name="dec",
                           input_shapes=[(N, K)],
                           rng_key=jax.random.PRNGKey(0))
    m = Model()
    m.z = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (N, K)),
        variance=broadcast_to(Variable(value=1.), (N, K)),
        shape=(N, K))
    m.x_mean = decoder(m.z)
    m.x = Normal.define_variable(
        mean=m.x_mean,
        variance=broadcast_to(Variable(value=0.01), (N, D)),
        shape=(N, D))

    encoder = FlaxFunction(Encoder(latent=K), name="enc",
                           input_shapes=[(N, D)], num_outputs=2,
                           rng_key=jax.random.PRNGKey(1))
    q = Posterior(m)
    q_mean, q_var = encoder(q.x)
    q.z.set_prior(Normal(mean=q_mean, variance=q_var))

    alg = StochasticVariationalInference(num_samples=3, model=m,
                                         posterior=q, observed=[m.x])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=MAX_ITER, learning_rate=0.01, x=x,
             callback=lambda i, l: losses.append(float(l)))
    print("ELBO loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))
    assert losses[-1] < losses[0]
    return losses[-1]


if __name__ == "__main__":
    main()
