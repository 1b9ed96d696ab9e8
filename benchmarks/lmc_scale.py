"""LMC multi-output SVGP at production shape vs the single-output SVGP.

The LMC bound's linalg is IDENTICAL to the regression bound (one Kuu
Cholesky, one wide solve) — the per-output cost is one extra column in
the M x B solves plus the (B, Q) x (Q, C) mixing matmul, all
MXU-class. This script measures the actual step-time delta on the real
chip, paired in-process with the matmul ceiling (CLAUDE.md protocol:
scan-amortized steps, scalar fetch sync, one TPU process).

Run: python benchmarks/lmc_scale.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
from roofline import (_timed_scan, measure_matmul_ceiling,
                      run_svgp_config, svgp_step_flops)

B, M, D, Q, C = 65536, 512, 32, 8, 16


def lmc_step_flops(B, M, D_in, Q, C):
    """svgp_step_flops with Q latent columns plus the mixing matmul."""
    return svgp_step_flops(B, M, D_in, D_out=Q) + 3.0 * 2.0 * B * Q * C


def run_lmc_config(B, M, D, Q, C, steps=50, n_total=1_000_000,
                   ceiling_tflops=None):
    import jax
    import jax.numpy as jnp
    import optax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import LMCSVGPRegression
    from mxfusion_tpu.inference import MAP, GradBasedInference, \
        create_executor

    rng = np.random.default_rng(0)
    Xb = rng.random((B, D)).astype(np.float32) * 4
    Yb = rng.standard_normal((B, C)).astype(np.float32)
    Z0 = rng.random((M, D)) * 4

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.Y = LMCSVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=1.0, lengthscale=1.0),
        num_outputs=C, num_latents=Q, shape=(m.n, C),
        inducing_inputs=Variable(shape=(M, D), initial_value=Z0))
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=Xb, Y=Yb)
    ex = create_executor(alg, infr.params,
                         rv_scaling={m.Y.uuid: n_total / B})
    opt = optax.adam(1e-3)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())
    st = opt.init(tr)
    Xj, Yj = jnp.asarray(Xb), jnp.asarray(Yb)

    def step(data, carry):
        tr, st, key = carry
        X, Y = data
        key, sk = jax.random.split(key)

        def lf(t):
            loss, lg, _ = ex(t, fx, [X, Y], sk)
            return lg, loss
        (_, loss), g = jax.value_and_grad(lf, has_aux=True)(tr)
        up, st2 = opt.update(g, st, tr)
        return optax.apply_updates(tr, up), st2, key

    spc = max(4, min(25, steps // 4))
    sec = _timed_scan(step, (Xj, Yj), (tr, st, jax.random.PRNGKey(0)),
                      spc, n_calls=max(1, steps // spc))
    flops = lmc_step_flops(B, M, D, Q, C)
    tflops = flops / sec / 1e12
    frac = "  ({:4.1f}% of ceiling)".format(
        100.0 * tflops / ceiling_tflops) if ceiling_tflops else ""
    print("LMC  B={:6d} M={:4d} D={:3d} Q={:2d} C={:3d}: {:8.3f} "
          "ms/step, {:6.2f} TFLOP/s{}".format(
              B, M, D, Q, C, sec * 1e3, tflops, frac), flush=True)
    return sec, tflops


def main():
    ceiling = measure_matmul_ceiling(4096, "float32", "HIGHEST",
                                     iters=32)
    sec_svgp, _ = run_svgp_config(B, M, D, steps=50,
                                  ceiling_tflops=ceiling)
    sec_lmc, _ = run_lmc_config(B, M, D, Q, C, steps=50,
                                ceiling_tflops=ceiling)
    print("LMC (Q={}, C={}) overhead vs single-output SVGP: {:+.1f}%"
          .format(Q, C, 100.0 * (sec_lmc / sec_svgp - 1.0)))


if __name__ == "__main__":
    main()
