"""SVGP roofline scan across batch/inducing configurations.

Companion to bench.py: sweeps (batch, M, D) and reports honest wall
clock per optimizer step. Timing protocol for relay-attached backends:
enqueue K async steps, then fetch the FINAL loss value — the sequential
parameter dependency forces the whole chain to execute, and the single
host round trip amortizes over K steps.

Usage: python benchmarks/roofline.py
"""
import time

import numpy as np


def run_config(BATCH, M, D, steps=200, n_total=1_000_000):
    import jax
    import jax.numpy as jnp
    import optax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import MAP, GradBasedInference, \
        create_executor

    rng = np.random.default_rng(0)
    Xb = rng.random((BATCH, D)).astype(np.float32) * 4
    Yb = (np.sin(Xb[:, :1]) +
          rng.standard_normal((BATCH, 1)).astype(np.float32) * 0.1)
    Z0 = rng.random((M, D)) * 4

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M, D), initial_value=Z0))
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=Xb, Y=Yb)
    ex = create_executor(alg, infr.params,
                         rv_scaling={m.Y.uuid: n_total / BATCH})
    opt = optax.adam(1e-3)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())
    st = opt.init(tr)

    def one_step(tr, st, key, X, Y):
        def lf(t):
            loss, lg, _ = ex(t, fx, [X, Y], key)
            return lg, loss
        (_, loss), g = jax.value_and_grad(lf, has_aux=True)(tr)
        up, st2 = opt.update(g, st, tr)
        return optax.apply_updates(tr, up), st2, loss

    spc = 25  # steps scanned per XLA program

    @jax.jit
    def multi_step(tr, st, key, X, Y):
        def body(carry, sk):
            tr, st = carry
            tr, st, loss = one_step(tr, st, sk, X, Y)
            return (tr, st), loss
        (tr, st), losses = jax.lax.scan(
            body, (tr, st), jax.random.split(key, spc))
        return tr, st, losses[-1]

    Xj, Yj = jnp.asarray(Xb), jnp.asarray(Yb)
    key = jax.random.PRNGKey(0)
    key, sk = jax.random.split(key)
    tr, st, loss = multi_step(tr, st, sk, Xj, Yj)
    float(loss)  # sync after compile+warmup

    n_calls = max(1, steps // spc)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        key, sk = jax.random.split(key)
        tr, st, loss = multi_step(tr, st, sk, Xj, Yj)
    float(loss)  # single fetch forces the whole chain
    dt = (time.perf_counter() - t0) / (n_calls * spc)

    # forward matmul-class FLOPs: Kuf assembly, M x B triangular solve,
    # and the B-sized contractions of the bound; x3 for fwd+bwd
    flops = 3 * (2 * M * BATCH * D + 2 * M * M * BATCH) + 2 * M ** 3
    print("B={:6d} M={:4d} D={:3d}: {:8.3f} ms/step, {:8.1f} steps/s, "
          "~{:8.1f} GFLOP/s".format(BATCH, M, D, dt * 1e3, 1 / dt,
                                    flops / dt / 1e9), flush=True)


if __name__ == "__main__":
    run_config(1024, 128, 8)
    run_config(8192, 128, 8)
    run_config(65536, 128, 8, steps=100)
    run_config(65536, 512, 32, steps=50)
