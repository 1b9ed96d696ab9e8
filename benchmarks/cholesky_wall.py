"""Cholesky-wall measurement: XLA native vs blocked-MXU Cholesky.

NOTES.md r2: batched Cholesky measured 0.04-0.4 TFLOP/s against a
28.5 TFLOP/s matmul ceiling — the binding constraint for exact-GP /
large-M workloads. ``ops.blocked_cholesky`` restructures the
factorization so the n^3/3 bulk runs as MXU syrk updates. This script
measures both (and the backward pass), paired with an in-process
matmul-ceiling measurement per the relay timing protocol.

Usage:  python benchmarks/cholesky_wall.py          (real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from roofline import _timed_scan, measure_matmul_ceiling


def _spd(n, batch=None, dtype="float32", seed=0):
    rng = np.random.default_rng(seed)
    shape = (batch, n, n) if batch else (n, n)
    W = rng.standard_normal(shape).astype(dtype)
    A = W @ np.swapaxes(W, -1, -2) + n * np.eye(n, dtype=dtype)
    return A


def measure_chol(fn, label, n, batch=None, iters=8, n_calls=2):
    import jax.numpy as jnp
    A = jnp.asarray(_spd(n, batch))

    def step(A, L):
        return fn(A + 1e-12 * L[..., :1, :1])

    L0 = fn(A)
    sec = _timed_scan(step, A, L0, iters, n_calls=n_calls)
    nmat = batch if batch else 1
    tflops = nmat * n ** 3 / 3.0 / sec / 1e12
    print("{:28s} n={:5d} b={!s:>5}: {:9.3f} ms, {:7.3f} TFLOP/s"
          .format(label, n, batch, sec * 1e3, tflops), flush=True)
    return sec, tflops


def measure_chol_grad(fn, label, n, iters=8):
    """Forward+backward of sum(sin(chol(A))) — the training-path cost."""
    import jax
    import jax.numpy as jnp
    A = jnp.asarray(_spd(n))

    g = jax.grad(lambda a: jnp.sum(jnp.sin(fn(a))))

    def step(A, G):
        return g(A + 1e-9 * G[..., :1, :1])

    G0 = g(A)
    sec = _timed_scan(step, A, G0, iters)
    print("{:28s} n={:5d} fwd+bwd: {:9.3f} ms".format(label, n,
                                                      sec * 1e3),
          flush=True)
    return sec


def main():
    import jax
    import jax.numpy as jnp
    from mxfusion_tpu.ops.blocked_cholesky import blocked_cholesky
    print("device:", jax.devices()[0], flush=True)

    print("\n--- paired ceiling ---")
    measure_matmul_ceiling(4096, "float32", "HIGHEST", iters=32)

    native = jnp.linalg.cholesky
    print("\n--- single-matrix Cholesky ---")
    for n in (512, 1024, 2048, 4096):
        measure_chol(native, "XLA native", n)
        for blk in (256, 512):
            if blk < n:
                measure_chol(
                    lambda A, b=blk: blocked_cholesky(A, b),
                    "blocked (b={})".format(blk), n)

    print("\n--- batched Cholesky ---")
    measure_chol(native, "XLA native", 512, batch=64)
    measure_chol(lambda A: blocked_cholesky(A, 128),
                 "blocked (b=128)", 512, batch=64)
    measure_chol(native, "XLA native", 128, batch=512)

    print("\n--- training path (fwd+bwd) ---")
    for n in (1024, 2048):
        measure_chol_grad(native, "XLA native", n)
        measure_chol_grad(lambda A: blocked_cholesky(A, 256),
                          "blocked (b=256)", n)


if __name__ == "__main__":
    main()
