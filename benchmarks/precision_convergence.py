"""Convergence-equivalence probe for the data-side precision tiers.

The question (VERDICT r4 item 1): does the 1-pass-bf16 "default" tier —
measured 2.06x over HIGHEST on the compute-bound SVGP step — converge
equivalently on the tight-noise 10^6-point north-star workload, now
that the bound is in RESIDUAL form (r5: the data fit is computed from
the f32 elementwise residual Y − m instead of three near-cancelling
O(|Y|²) expanded terms, and the trace pair is grouped per point)?

Protocol: the exact svgp_1m.py model/loop/config (10^6 points, B=4096,
M=256, D=8, true noise 0.1, adam 3e-3, DeviceMinibatchLoop with the
same PRNG key), run sequentially in ONE process at each precision mode
— identical minibatch order, so trajectory differences are pure
arithmetic. Prints the per-epoch mean scaled -ELBO trajectories and
their relative gaps.

Usage: python benchmarks/precision_convergence.py [epochs] [mode ...]
       (default: 20 epochs, modes highest + default)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run_mode(mode, epochs, n_total=1_000_000, batch=4096,
             m_inducing=256, d=8):
    from mxfusion_tpu.ops.precision import set_data_precision
    set_data_precision(mode)   # trace-time flag: set BEFORE building
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                        DeviceMinibatchLoop)

    rng = np.random.default_rng(0)
    X = rng.random((n_total, d)).astype(np.float32) * 4
    f = np.sin(X[:, :1] * 2.0) + 0.3 * np.cos(X[:, 1:2] * 3.0)
    Y = (f + rng.standard_normal((n_total, 1)).astype(np.float32) * 0.1
         ).astype(np.float32)

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, d))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.5)
    Z0 = rng.random((m_inducing, d)) * 4
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=d, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(m_inducing, d),
                                 initial_value=Z0))
    loop = DeviceMinibatchLoop(batch_size=batch,
                               rv_scaling={m.Y: n_total / batch})
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)
    trajectory = []
    t0 = time.perf_counter()
    infr.run(max_iter=epochs, learning_rate=3e-3, X=X, Y=Y,
             callback=lambda e, l: trajectory.append(float(l)))
    dt = time.perf_counter() - t0
    noise = float(np.asarray(infr.params[m.noise_var]).ravel()[0])
    print("mode={:8s} {:6.1f}s  final noise_var {:.5f}  trajectory:"
          .format(mode, dt, noise), flush=True)
    print("  " + " ".join("{:.6g}".format(v) for v in trajectory),
          flush=True)
    return trajectory


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    modes = sys.argv[2:] or ["highest", "default"]
    results = {}
    for mode in modes:
        results[mode] = run_mode(mode, epochs)
    if len(results) > 1:
        base_mode = modes[0]
        base = np.asarray(results[base_mode])
        for mode in modes[1:]:
            tr = np.asarray(results[mode])
            rel = np.abs(tr - base) / np.abs(base)
            print("\nrel |{} - {}| / |{}| per epoch:".format(
                mode, base_mode, base_mode))
            print("  " + " ".join("{:.2e}".format(v) for v in rel))
            print("  max {:.3e}, final-epoch {:.3e}".format(
                rel.max(), rel[-1]))


if __name__ == "__main__":
    main()
