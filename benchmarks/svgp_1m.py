"""North-star workload: SVGP regression on 10^6 points (BASELINE.json),
driven entirely through the public API.

Default path: ``DeviceMinibatchLoop`` — the dataset is parked in HBM
once and each epoch runs as ONE XLA program (on-device permutation +
gather feeding a lax.scan of optimizer steps). Host traffic per epoch
is a single scalar fetch, vs ~3.9 s/epoch of host->device batch
transfer on the r1 host loop (benchmarks/NOTES.md).

Usage: python benchmarks/svgp_1m.py [epochs] [host]
       (pass "host" as the 2nd arg to run the old host-batching loop
        for comparison)
"""
import sys
import time

import numpy as np


def main(epochs=4, n_total=1_000_000, batch=4096, m_inducing=256, d=8,
         host_loop=False):
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                        MinibatchInferenceLoop,
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

    if host_loop:
        loop = MinibatchInferenceLoop(batch_size=batch,
                                      rv_scaling={m.Y: n_total / batch},
                                      batches_per_call=20)
    else:
        loop = DeviceMinibatchLoop(batch_size=batch,
                                   rv_scaling={m.Y: n_total / batch})
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)

    trajectory = []
    t0 = time.perf_counter()
    infr.run(max_iter=epochs, learning_rate=3e-3, X=X, Y=Y,
             callback=lambda e, l: trajectory.append(float(l)))
    elapsed = time.perf_counter() - t0
    steps = epochs * -(-n_total // batch)
    print("loop: {}".format("host MinibatchInferenceLoop" if host_loop
                            else "DeviceMinibatchLoop (HBM-resident)"))
    print("per-epoch mean scaled -ELBO: {}".format(
        ["{:.4g}".format(v) for v in trajectory]))
    print("{} optimizer steps over 10^6 points in {:.1f}s -> "
          "{:.1f} steps/s, {:.2f} s/epoch ({} epochs, incl. "
          "first-epoch compile)".format(
              steps, elapsed, steps / elapsed, elapsed / epochs, epochs))
    assert trajectory[-1] < trajectory[0], "ELBO failed to improve"


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         host_loop=len(sys.argv) > 2 and sys.argv[2] == "host")
