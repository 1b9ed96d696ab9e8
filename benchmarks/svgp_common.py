"""Shared SVGP trajectory protocol for convergence-equivalence probes.

One builder so every A/B (precision tiers, fused-gram path, future
numeric variants) measures the SAME model/data/loop: 10^6-ish points,
sin+cos latent with true noise 0.1, RBF SVGP, adam 3e-3,
DeviceMinibatchLoop with a fixed PRNG — run modes sequentially in ONE
process so minibatch order is identical and trajectory differences are
pure arithmetic. Callers set their trace-time flags
(set_data_precision / pfg.set_enabled) BEFORE calling.
"""
import time

import numpy as np


def run_svgp_trajectory(epochs, n_total=1_000_000, batch=4096,
                        m_inducing=256, d=8, label=""):
    """Train the protocol model and return the per-epoch mean scaled
    -ELBO trajectory (also prints it with wall time + final noise)."""
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
    print("{:14s} {:6.1f}s  final noise_var {:.5f}  trajectory:"
          .format(label, dt, noise), flush=True)
    print("  " + " ".join("{:.6g}".format(v) for v in trajectory),
          flush=True)
    return trajectory


def print_relative_gap(name_a, tr_a, name_b, tr_b):
    """Per-epoch relative trajectory gap |a - b| / |b|."""
    a, b = np.asarray(tr_a), np.asarray(tr_b)
    rel = np.abs(a - b) / np.abs(b)
    print("\nrel |{} - {}| / |{}| per epoch:".format(name_a, name_b,
                                                     name_b))
    print("  " + " ".join("{:.2e}".format(v) for v in rel))
    print("  max {:.3e}, final-epoch {:.3e}".format(rel.max(), rel[-1]))
    return rel
