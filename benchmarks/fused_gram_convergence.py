"""Convergence-equivalence A/B for the fused Pallas gram path.

The fused kernel (ops/pallas_fused_gram.py) replaces the XLA
materialized Kuf pipeline inside its measured-win envelope
(N >= 131072). Its G-product runs at the same guarded 3-pass tier as
the XLA path, but the gram distances use a hand-rolled hi/lo split
(Mosaic's dot only lowers DEFAULT/HIGHEST) and the predictive mean is
associated through G instead of the narrow w-vector — so convergence
equivalence must be established separately, inside the envelope.

Protocol: the precision_convergence.py setup (10^6-ish points, tight
noise 0.1, adam 3e-3, DeviceMinibatchLoop, same PRNG) with
batch=131072 / M=256 so every step engages the kernel; run twice in
ONE process with pfg enabled/disabled — identical minibatch order, so
trajectory differences are pure arithmetic.

Usage: python benchmarks/fused_gram_convergence.py [epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

N_TOTAL = 2 ** 20          # 131072 * 8 exactly
BATCH = 131072             # inside the fused envelope
M_IND = 256
D = 8


def run_mode(fused, epochs):
    from mxfusion_tpu.ops import pallas_fused_gram as pfg
    from mxfusion_tpu.ops.precision import set_data_precision
    set_data_precision("default")   # the library default (r5)
    pfg.set_enabled(fused)          # trace-time gate
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                        DeviceMinibatchLoop)

    rng = np.random.default_rng(0)
    X = rng.random((N_TOTAL, D)).astype(np.float32) * 4
    f = np.sin(X[:, :1] * 2.0) + 0.3 * np.cos(X[:, 1:2] * 3.0)
    Y = (f + rng.standard_normal((N_TOTAL, 1)).astype(np.float32) * 0.1
         ).astype(np.float32)

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.5)
    Z0 = rng.random((M_IND, D)) * 4
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M_IND, D), initial_value=Z0))
    loop = DeviceMinibatchLoop(batch_size=BATCH,
                               rv_scaling={m.Y: N_TOTAL / BATCH})
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)
    trajectory = []
    t0 = time.perf_counter()
    infr.run(max_iter=epochs, learning_rate=3e-3, X=X, Y=Y,
             callback=lambda e, l: trajectory.append(float(l)))
    dt = time.perf_counter() - t0
    noise = float(np.asarray(infr.params[m.noise_var]).ravel()[0])
    print("fused={!s:5}  {:6.1f}s  final noise_var {:.5f}  trajectory:"
          .format(fused, dt, noise), flush=True)
    print("  " + " ".join("{:.6g}".format(v) for v in trajectory),
          flush=True)
    return trajectory


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    base = np.asarray(run_mode(False, epochs))
    tr = np.asarray(run_mode(True, epochs))
    rel = np.abs(tr - base) / np.abs(base)
    print("\nrel |fused - xla| / |xla| per epoch:")
    print("  " + " ".join("{:.2e}".format(v) for v in rel))
    print("  max {:.3e}, final-epoch {:.3e}".format(rel.max(), rel[-1]))


if __name__ == "__main__":
    main()
