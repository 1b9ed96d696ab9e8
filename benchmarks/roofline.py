"""Roofline / MFU accounting for the SVGP training step.

BASELINE.json's north star demands >=70% of the TPU matmul/Cholesky
roofline. This script (a) MEASURES the attainable ceiling on the
attached chip — sustained TFLOP/s of pure chained matmuls at the
precisions the framework actually uses, plus batched Cholesky — and
(b) computes the achieved fraction for SVGP training configs from an
analytic FLOP count of the ELBO + its backward pass.

Timing protocol for relay-attached backends (benchmarks/NOTES.md):
enqueue K chained ops inside one lax.scan'd XLA program, fetch one
VALUE whose dependency chain covers all of them, amortize the ~29 ms
fetch over K. ``block_until_ready`` alone can ack early here.

Usage: python benchmarks/roofline.py            (full scan, real TPU)
       python benchmarks/roofline.py quick      (ceilings only)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (package not installed)

import numpy as np


def _timed_scan(step_fn, consts, carry, iters, n_calls=2, fetch=None):
    """Run ``iters`` sequentially-dependent steps per jitted call,
    ``n_calls`` times; return seconds per step.

    ``step_fn(consts, carry) -> carry``. Loop-invariant operands go in
    ``consts`` (jit arguments — NOT the scan carry, which would add a
    per-iteration buffer rotation, and NOT a closure constant, which
    bakes a giant literal into the HLO the relay's compile endpoint
    rejects). ``fetch(carry)`` must return an array whose value depends
    on the FULL chain of steps (the forced host fetch is what makes the
    timing honest on relay-attached backends)."""
    import jax

    if fetch is None:
        def fetch(c):
            return jax.tree_util.tree_leaves(c)[0]

    @jax.jit
    def multi(consts, carry):
        def body(c, _):
            return step_fn(consts, c), None
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return c

    def sync(carry):
        # index ON DEVICE, fetch ONE scalar: np.ravel here would pull
        # the whole array (64-256 MB) across the relay and swamp the
        # measurement (observed: 22x inflation at n=4096)
        _ = float(fetch(carry).reshape(-1)[0])

    carry = multi(consts, carry)  # compile + warmup
    sync(carry)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry = multi(consts, carry)
    sync(carry)
    dt = time.perf_counter() - t0
    return dt / (n_calls * iters)


def measure_matmul_ceiling(n=4096, dtype="float32", precision="HIGHEST",
                           iters=32):
    """Sustained TFLOP/s of chained n x n matmuls at the given
    dtype/precision — the MXU ceiling for that arithmetic mode."""
    import jax
    import jax.numpy as jnp

    prec = getattr(jax.lax.Precision, precision)
    # scale so the chained product DECAYS (spectral radius < 1): an
    # overflowing chain poisons the measurement
    A = (np.random.default_rng(0).standard_normal((n, n)) /
         np.sqrt(n) * 0.5).astype(dtype)
    A = jnp.asarray(A)
    C0 = jnp.asarray(np.eye(n, dtype=dtype))

    def step(A, C):
        return jax.lax.dot(A, C, precision=prec)

    sec = _timed_scan(step, A, C0, iters)
    tflops = 2.0 * n ** 3 / sec / 1e12
    print("matmul ceiling  n={:5d} {}/{:<8s}: {:7.2f} ms, {:7.2f} TFLOP/s"
          .format(n, dtype, precision, sec * 1e3, tflops), flush=True)
    return tflops


def measure_hbm_ceiling(mb=512, iters=64):
    """Sustained HBM bandwidth (GB/s): chained elementwise FMA over a
    ``mb``-MB f32 buffer — each step reads and writes the full buffer,
    nothing fits in VMEM, so time = 2·bytes / bandwidth."""
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4
    x0 = jnp.ones((n,), jnp.float32)
    decay = jnp.float32(0.9999)  # keep the chain finite and non-denormal

    def step(a, x):
        return x * a + jnp.float32(1e-6)

    sec = _timed_scan(step, decay, x0, iters)
    gbs = 2.0 * n * 4 / sec / 1e9
    print("HBM ceiling     {:4d} MB buffer: {:7.2f} ms/pass, "
          "{:7.1f} GB/s".format(mb, sec * 1e3, gbs), flush=True)
    return gbs


def svgp_step_bytes(B, M, D_in, D_out=1):
    """Analytic HBM traffic (bytes) of one SVGP step at f32, two
    bounds (svgp_regression.py r5 residual bound; big = O(B·M) arrays,
    everything O(M²) and O(B·D) is noise at production shapes).

    "unfused": every big intermediate is materialized and re-read —
      fwd: Kuf w; LinvKuf r(Kuf)+w; qff r(LinvKuf); V=LsᵀL⁻¹Kuf
      r(LinvKuf)+w; ΣV²β r(V); m=Kufᵀw r(Kuf)  → 7 panels
      bwd (cotangent chain re-reads saved Kuf/LinvKuf and writes/reads
      dV, dLinvKuf, dKuf; kernel gram backward reads dKuf) → ~9 panels
    "fused": XLA fuses each reduction into its producer and the
      backward reuses tiles optimally — fwd 4 panels (Kuf w; r Kuf;
      LinvKuf w; r LinvKuf ×1 amortized; r Kuf for m), bwd ~5.
    Returns (unfused_bytes, fused_bytes).
    """
    panel = 4.0 * B * M  # one (M, B) f32 array
    return (7 + 9) * panel, (4 + 5) * panel


def measure_cholesky_ceiling(M=512, batch=64, dtype="float32", iters=16):
    """Sustained Cholesky TFLOP/s (batch x M x M, M^3/3 flops each)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    W = rng.standard_normal((batch, M, M)).astype(dtype)
    A = jnp.asarray(W @ np.transpose(W, (0, 2, 1)) +
                    M * np.eye(M, dtype=dtype))

    def step(A, L):
        # re-derive the input from the previous L to serialize the chain
        return jnp.linalg.cholesky(A + 1e-12 * L[..., :1, :1])

    L0 = jnp.linalg.cholesky(A)
    sec = _timed_scan(step, A, L0, iters)
    tflops = batch * M ** 3 / 3.0 / sec / 1e12
    print("cholesky ceiling M={:4d} b={:4d} {}: {:7.2f} ms, "
          "{:7.2f} TFLOP/s".format(M, batch, dtype, sec * 1e3, tflops),
          flush=True)
    return tflops


def svgp_step_flops(B, M, D_in, D_out=1):
    """Analytic matmul-class FLOPs of one SVGP ELBO + backward + adam
    step (svgp_regression.py compute; backward ~2x the forward matmuls).

    Forward (r5 residual-form bound — the psi1Y product and its M x M
    solve are gone; the mean path is Kuf^T w with w = L^-T L^-1 mu):
      Kuu gram            2 M^2 D_in
      Kuf gram            2 M B D_in
      S = W W^T           2 M^3
      chol(Kuu), chol(S)  2/3 M^3
      LinvLs (trsm)       M^3
      Linv formation      M^3          (wide_triangular_solve)
      LinvKuf = Linv@Kuf  2 M^2 B
      w = L^-T Linvmu     ~M^2 D_out
      KfuKuuInvmu=Kuf^T w 2 M B D_out
      KfuKuuInvLs         2 M^2 B
    """
    fwd = (2 * M * M * D_in + 2 * M * B * D_in + 2 * M ** 3 +
           (2.0 / 3.0) * M ** 3 + M ** 3 + M ** 3 +
           2 * M * M * B + M * M * D_out + 2 * M * B * D_out +
           2 * M * M * B)
    return 3.0 * fwd  # fwd + ~2x fwd for backward


def run_svgp_config(B, M, D, steps=100, n_total=1_000_000,
                    ceiling_tflops=None, whitened=False):
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
    Xb = rng.random((B, D)).astype(np.float32) * 4
    Yb = (np.sin(Xb[:, :1]) +
          rng.standard_normal((B, 1)).astype(np.float32) * 0.1)
    Z0 = rng.random((M, D)) * 4

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1), whitened=whitened,
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
    key0 = jax.random.PRNGKey(0)

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
    sec = _timed_scan(step, (Xj, Yj), (tr, st, key0), spc,
                      n_calls=max(1, steps // spc))
    flops = svgp_step_flops(B, M, D)
    tflops = flops / sec / 1e12
    frac = "  ({:4.1f}% of ceiling)".format(
        100.0 * tflops / ceiling_tflops) if ceiling_tflops else ""
    print("SVGP{} B={:6d} M={:4d} D={:3d}: {:8.3f} ms/step, {:7.1f} "
          "steps/s, {:6.2f} TFLOP/s{}".format(
              "/whitened" if whitened else "", B, M, D, sec * 1e3,
              1.0 / sec, tflops, frac), flush=True)
    return sec, tflops


def hbm_probe(B=65536, M=512, D=32):
    """Memory- vs compute-boundedness of the flagship step (VERDICT r4
    item 6): measured HBM + MXU ceilings, analytic bytes/flops of the
    step, and where the measured time sits between the two lower
    bounds."""
    from mxfusion_tpu.ops import precision

    bw = measure_hbm_ceiling()
    ceil_def = measure_matmul_ceiling(4096, "float32", "DEFAULT",
                                      iters=32)
    precision.set_data_precision("default")
    sec, _tf = run_svgp_config(B, M, D, steps=50)
    precision.set_data_precision(precision.DEFAULT_DATA_PRECISION)

    flops = svgp_step_flops(B, M, D)
    t_mxu = flops / (ceil_def * 1e12)
    hi_bytes, lo_bytes = svgp_step_bytes(B, M, D)
    t_hbm_lo = lo_bytes / (bw * 1e9)
    t_hbm_hi = hi_bytes / (bw * 1e9)
    print("\nSVGP step B={} M={} D={} at data_precision=default:"
          .format(B, M, D))
    print("  measured            {:7.3f} ms".format(sec * 1e3))
    print("  MXU lower bound     {:7.3f} ms  ({:.0f} GFLOP @ {:.1f} "
          "TFLOP/s)".format(t_mxu * 1e3, flops / 1e9, ceil_def))
    print("  HBM bound (fused)   {:7.3f} ms  ({:.2f} GB @ {:.0f} GB/s)"
          .format(t_hbm_lo * 1e3, lo_bytes / 1e9, bw))
    print("  HBM bound (unfused) {:7.3f} ms  ({:.2f} GB @ {:.0f} GB/s)"
          .format(t_hbm_hi * 1e3, hi_bytes / 1e9, bw))
    print("  achieved BW if traffic=fused:   {:6.0f} GB/s".format(
        lo_bytes / sec / 1e9))
    print("  achieved BW if traffic=unfused: {:6.0f} GB/s".format(
        hi_bytes / sec / 1e9))
    print("  memory-bound fraction (fused bytes): {:.0%}".format(
        t_hbm_lo / sec), flush=True)


def main():
    import jax
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    if len(sys.argv) > 1 and sys.argv[1] == "hbm":
        print("device:", jax.devices()[0], flush=True)
        hbm_probe()
        return
    print("device:", jax.devices()[0], flush=True)

    print("\n--- attainable ceilings (measured) ---")
    ceil_hi = measure_matmul_ceiling(4096, "float32", "HIGHEST")
    measure_matmul_ceiling(8192, "float32", "HIGHEST", iters=16)
    measure_matmul_ceiling(4096, "float32", "DEFAULT")
    measure_matmul_ceiling(4096, "bfloat16", "DEFAULT")
    chol = measure_cholesky_ceiling(512, 64)
    measure_cholesky_ceiling(128, 512)
    print("f32-HIGHEST matmul ceiling: {:.2f} TFLOP/s; "
          "cholesky: {:.2f} TFLOP/s".format(ceil_hi, chol))
    if quick:
        return

    print("\n--- SVGP training step MFU vs f32-HIGHEST ceiling ---")
    run_svgp_config(1024, 128, 8, ceiling_tflops=ceil_hi)
    run_svgp_config(8192, 128, 8, ceiling_tflops=ceil_hi)
    run_svgp_config(65536, 128, 8, ceiling_tflops=ceil_hi)
    run_svgp_config(65536, 512, 32, steps=50, ceiling_tflops=ceil_hi)
    run_svgp_config(65536, 1024, 32, steps=25, ceiling_tflops=ceil_hi)
    run_svgp_config(131072, 512, 32, steps=25, ceiling_tflops=ceil_hi)


if __name__ == "__main__":
    main()
