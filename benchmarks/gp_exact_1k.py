"""Ladder config: exact GPRegression, RBF kernel, 1k points
(BASELINE.json config "Exact GPRegression module: RBF kernel, 1k
points, Cholesky log-marginal ELBO").

Measures marginal-likelihood optimizer steps/sec — each step assembles
the N×N kernel matrix, runs the Cholesky + triangular solve, and
backpropagates through them — using the scan-amortized honest protocol.
"""
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (package not installed)

import numpy as np


def measure(n=1024, d=4, steps=200, spc=25):
    import jax
    import jax.numpy as jnp
    import optax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import GPRegression
    from mxfusion_tpu.inference import MAP, GradBasedInference, \
        create_executor

    rng = np.random.default_rng(0)
    X = rng.random((n, d)).astype(np.float32) * 4
    Y = (np.sin(X[:, :1] * 2.0) +
         rng.standard_normal((n, 1)).astype(np.float32) * 0.1)

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, d))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=d, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1))
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=X, Y=Y)
    ex = create_executor(alg, infr.params)
    opt = optax.adam(3e-2)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())
    st = opt.init(tr)

    def one(carry, sk):
        tr, st = carry

        def lf(t):
            loss, lg, _ = ex(t, fx, [X, Y], sk)
            return lg, loss
        (_, loss), g = jax.value_and_grad(lf, has_aux=True)(tr)
        up, st2 = opt.update(g, st, tr)
        return (optax.apply_updates(tr, up), st2), loss

    @jax.jit
    def multi(tr, st, key):
        (tr, st), losses = jax.lax.scan(one, (tr, st),
                                        jax.random.split(key, spc))
        return tr, st, losses[-1]

    key = jax.random.PRNGKey(0)
    key, sk = jax.random.split(key)
    tr, st, loss = multi(tr, st, sk)
    first = float(loss)  # sync after compile

    n_calls = steps // spc
    t0 = time.perf_counter()
    for _ in range(n_calls):
        key, sk = jax.random.split(key)
        tr, st, loss = multi(tr, st, sk)
    final = float(loss)
    dt = (time.perf_counter() - t0) / (n_calls * spc)
    # FLOPs per step: K assembly 2N^2 d + cholesky N^3/3 + solve N^2,
    # roughly tripled for the backward
    flops = 3 * (2 * n * n * d + n ** 3 / 3 + n * n)
    print("exact GP N={} D={}: {:.3f} ms/step, {:.1f} steps/s, "
          "~{:.1f} GFLOP/s, -logL {:.1f} -> {:.1f}".format(
              n, d, dt * 1e3, 1 / dt, flops / dt / 1e9, first, final))
    return {"config": "gp_exact_n{}_d{}".format(n, d),
            "ms_per_step": round(dt * 1e3, 3),
            "steps_per_sec": round(1.0 / dt, 1)}


if __name__ == "__main__":
    measure()
