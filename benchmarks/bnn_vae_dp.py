"""BASELINE.json stretch config: "Bayesian NN + VAE at scale:
data-parallel SVI across a v5e-8 mesh".

Runs reparameterized SVI for (a) a Bayesian MLP regression (priors
over flax weights) and (b) a VAE (flax decoder in the model, amortized
flax encoder in the posterior), with the observed data sharded over
ALL available devices through ``DataParallelBatchLoop`` (GSPMD inserts
the gradient collectives; parameters replicate). On a v5e-8 slice the
mesh covers 8 chips over ICI; on this harness it runs on the single
tunneled chip, and the 8-way sharded path is validated on the virtual
CPU mesh (pass ``cpu8``).

Usage: python benchmarks/bnn_vae_dp.py [cpu8]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (package not installed)

import numpy as np

N_BNN = 8192
N_VAE = 8192
STEPS = 300
SPC = 50  # scanned steps per XLA program


def _bnn(N):
    import jax
    import flax.linen as nn
    import jax.numpy as jnp
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.distributions import Normal
    from mxfusion_tpu.components.functions import FlaxFunction
    from mxfusion_tpu.components.functions.operators import broadcast_to
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.inference import (
        StochasticVariationalInference, create_Gaussian_meanfield)

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = jnp.tanh(nn.Dense(64)(x))
            h = jnp.tanh(nn.Dense(64)(h))
            return nn.Dense(1)(h)

    rng = np.random.default_rng(0)
    X = (rng.random((N, 8)) * 2 - 1).astype(np.float32)
    Y = (np.sin(X[:, :1] * 3) + rng.standard_normal((N, 1)) * 0.05
         ).astype(np.float32)

    net = FlaxFunction(MLP(), name="f", input_shapes=[(N, 8)],
                       rng_key=jax.random.PRNGKey(1))
    m = Model()
    m.x = Variable(shape=(N, 8))
    m.r = net(m.x)
    for _, v in m.r.factor.function.parameters.items():
        v.set_prior(Normal(
            mean=broadcast_to(Variable(value=0.), v.shape),
            variance=broadcast_to(Variable(value=1.), v.shape)))
    m.noise = Variable(transformation=PositiveTransformation(),
                       initial_value=0.01)
    m.y = Normal.define_variable(
        mean=m.r, variance=broadcast_to(m.noise, (N, 1)), shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.x, m.y])
    alg = StochasticVariationalInference(num_samples=4, model=m,
                                         posterior=q,
                                         observed=[m.x, m.y])
    return alg, {"x": X, "y": Y}


def _vae(N):
    import jax
    import flax.linen as nn
    import jax.numpy as jnp
    from mxfusion_tpu import Model, Posterior, Variable
    from mxfusion_tpu.components.distributions import Normal
    from mxfusion_tpu.components.functions import FlaxFunction
    from mxfusion_tpu.components.functions.operators import broadcast_to
    from mxfusion_tpu.inference import StochasticVariationalInference

    D, K = 16, 4

    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, z):
            h = jnp.tanh(nn.Dense(64)(z))
            return nn.Dense(D)(h)

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = jnp.tanh(nn.Dense(64)(x))
            return nn.Dense(K)(h), jnp.exp(nn.Dense(K)(h)) + 1e-6

    rng = np.random.default_rng(0)
    z_true = rng.standard_normal((N, K))
    proj = rng.standard_normal((K, D))
    x = (np.tanh(z_true @ proj) +
         rng.standard_normal((N, D)) * 0.05).astype(np.float32)

    decoder = FlaxFunction(Decoder(), name="dec", input_shapes=[(N, K)],
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
    encoder = FlaxFunction(Encoder(), name="enc", input_shapes=[(N, D)],
                           num_outputs=2, rng_key=jax.random.PRNGKey(1))
    q = Posterior(m)
    q_mean, q_var = encoder(q.x)
    q.z.set_prior(Normal(mean=q_mean, variance=q_var))
    alg = StochasticVariationalInference(num_samples=3, model=m,
                                         posterior=q, observed=[m.x])
    return alg, {"x": x}


def run(name, alg, data, mesh):
    from mxfusion_tpu.inference import GradBasedInference
    from mxfusion_tpu.parallel import DataParallelBatchLoop

    loop = DataParallelBatchLoop(mesh, steps_per_call=SPC)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    losses = []
    t0 = time.perf_counter()
    infr.run(max_iter=STEPS, learning_rate=1e-3,
             callback=lambda i, l: losses.append(l), **data)
    dt = time.perf_counter() - t0
    l0, l1 = float(losses[0]), float(losses[-1])
    print("{}: {} SVI steps on {} devices in {:.1f}s (incl. compile) "
          "-> {:.0f} steps/s; -ELBO {:.4g} -> {:.4g}".format(
              name, STEPS, mesh.devices.size, dt, STEPS / dt, l0, l1),
          flush=True)
    assert l1 < l0, name


def main():
    import jax
    from mxfusion_tpu.parallel import make_mesh
    if len(sys.argv) > 1 and sys.argv[1] == "cpu8":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    mesh = make_mesh()
    print("devices:", jax.devices(), flush=True)
    alg, data = _bnn(N_BNN)
    run("BNN-8k  (data-parallel SVI)", alg, data, mesh)
    alg, data = _vae(N_VAE)
    run("VAE-8k  (data-parallel SVI)", alg, data, mesh)


if __name__ == "__main__":
    main()
