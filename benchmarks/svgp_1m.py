"""North-star workload: SVGP regression on 10^6 points (BASELINE.json),
driven entirely through the public API.

Default path: ``DeviceMinibatchLoop`` — the dataset is parked in HBM
once and each epoch runs as ONE XLA program (on-device permutation +
gather feeding a lax.scan of optimizer steps). Host traffic per epoch
is a single scalar fetch, vs ~3.9 s/epoch of host->device batch
transfer on the r1 host loop (benchmarks/NOTES.md).

Usage: python benchmarks/svgp_1m.py [epochs] [host|fast|ngd]
       ("host" = old host-batching loop for comparison; "fast" = opt-in
        mixed data-side precision, ops.precision.set_data_precision;
        "ngd" = stochastic natural-gradient q(U) updates)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (package not installed)

import numpy as np


def main(epochs=4, n_total=1_000_000, batch=4096, m_inducing=256, d=8,
         host_loop=False, fast=False, ngd=False):
    if fast:
        from mxfusion_tpu.ops.precision import set_data_precision
        set_data_precision("default")
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                        MinibatchInferenceLoop,
                                        DeviceMinibatchLoop,
                                        NaturalGradientMinibatchLoop)

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
    elif ngd:
        loop = NaturalGradientMinibatchLoop(
            module=m.Y.factor, batch_size=batch,
            rv_scaling={m.Y: n_total / batch}, nat_learning_rate=0.1)
    else:
        loop = DeviceMinibatchLoop(batch_size=batch,
                                   rv_scaling={m.Y: n_total / batch})
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)

    trajectory = []
    epoch_times = []
    t_mark = [time.perf_counter()]

    def cb(e, l):
        trajectory.append(float(l))
        now = time.perf_counter()
        epoch_times.append(now - t_mark[0])
        t_mark[0] = now

    t0 = time.perf_counter()
    infr.run(max_iter=epochs, learning_rate=3e-3, X=X, Y=Y, callback=cb)
    elapsed = time.perf_counter() - t0
    steps_per_epoch = -(-n_total // batch)
    steps = epochs * steps_per_epoch
    steady = epoch_times[1:] or epoch_times
    steady_epoch = sum(steady) / len(steady)
    print("loop: {}".format(
        "host MinibatchInferenceLoop" if host_loop else
        "NaturalGradientMinibatchLoop (HBM-resident)" if ngd else
        "DeviceMinibatchLoop (HBM-resident)"))
    print("per-epoch mean scaled -ELBO: {}".format(
        ["{:.4g}".format(v) for v in trajectory]))
    print("{} optimizer steps over 10^6 points in {:.1f}s total; "
          "first epoch (compile) {:.1f}s; steady state {:.2f} s/epoch "
          "= {:.0f} steps/s ({:.3f} ms/step)".format(
              steps, elapsed, epoch_times[0], steady_epoch,
              steps_per_epoch / steady_epoch,
              steady_epoch / steps_per_epoch * 1e3))
    assert trajectory[-1] < trajectory[0], "ELBO failed to improve"


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         host_loop=len(sys.argv) > 2 and sys.argv[2] == "host",
         fast=len(sys.argv) > 2 and sys.argv[2] == "fast",
         ngd=len(sys.argv) > 2 and sys.argv[2] == "ngd")
