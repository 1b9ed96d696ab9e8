"""Serving throughput: BatchedPredictor streaming rows through the
compile-once chunked predictor on the real TPU.

Measures end-to-end rows/sec (wall clock, INCLUDING host chunking and
result fetches — that is what a serving loop pays) for a trained SVGP
at production-ish shapes, plus the dispatch-bound small-request
latency. Run: python benchmarks/serving_throughput.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

M, D = 256, 16
CHUNK = 8192


def measure(n_rows=1_000_000, quiet=False):
    import jax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                        BatchedPredictor)

    if not quiet:
        print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    X = rng.random((4096, D)).astype(np.float32) * 4
    Y = (np.sin(X[:, :1]) +
         rng.standard_normal((4096, 1)).astype(np.float32) * 0.1)
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M, D),
                                 initial_value=rng.random((M, D)) * 4))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    infr.run(max_iter=30, learning_rate=0.05, X=X, Y=Y)

    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X], target_variables=[m.Y.uuid],
                            chunk_size=CHUNK)
    # ---- bulk throughput
    N = n_rows
    Xt = rng.random((N, D)).astype(np.float32) * 4
    pred.predict(X=Xt[:CHUNK])                     # compile
    t0 = time.perf_counter()
    mu, var = pred.predict(X=Xt)[0]
    dt = time.perf_counter() - t0
    assert np.asarray(mu).shape[-2] == N
    print("bulk: {} rows in {:.3f} s -> {:,.0f} rows/s "
          "(chunk {})".format(N, dt, N / dt, CHUNK), flush=True)
    bulk_rows_per_sec = N / dt

    # ---- small-request latency (dispatch-bound tier)
    Xs = Xt[:128]
    for _ in range(3):
        pred.predict(X=Xs)
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        pred.predict(X=Xs)
    dt = (time.perf_counter() - t0) / reps
    print("small request (128 rows, padded to chunk): {:.2f} ms "
          "-> {:,.0f} req/s".format(dt * 1e3, 1.0 / dt), flush=True)
    return {"config": "svgp_serving_m{}_d{}_chunk{}".format(M, D, CHUNK),
            "bulk_rows": N,
            "bulk_rows_per_sec": round(bulk_rows_per_sec),
            "small_request_ms": round(dt * 1e3, 2)}


if __name__ == "__main__":
    measure()
