"""Batch-vectorized Pallas Cholesky for many small matrices.

The measured wall (benchmarks/cholesky_wall.py): XLA's batched
``cholesky`` at (512, 128, 128) runs at 0.040 TFLOP/s — ~700x below
the matmul ceiling — because it serializes the panel recurrence per
matrix and leaves the batch dimension on the slow path. This kernel
inverts the layout: the *column recurrence* stays serial (n steps, the
true data dependence), but every step is a full-width VPU operation
over (batch_chunk, n, n) — the batch and trailing-submatrix axes ride
the vector lanes.

Measured outcome (r3, NOTES.md): 1.4-1.5x over native for n <= 64 at
B >= 512 (e.g. (2048, 64): 11.3 vs 16.7 ms); ties at n = 128 and loses
at n = 256 (the n-step serial chain is latency-bound and each step
does masked full-matrix work). The dispatcher therefore uses the
Pallas path only inside the measured-win envelope.

Right-looking masked update per column j (trailing submatrix stays
symmetric, so row j == column j of the working matrix):

    row_j = W[:, j, :]                      (dynamic sublane slice)
    d     = sqrt(row_j[j])                  (masked lane reduction)
    col   = where(k > j, row_j / d, 0)      (strict-lower update vector)
    W    -= col^T col                       (rank-1, batched outer)
    L[:, :, j] = where(i == j, d, where(i > j, col, 0))

Gradient: standard Cholesky cotangent via ``jax.custom_vjp`` (same
formula as ops.blocked_cholesky).

Use :func:`batched_cholesky` — it dispatches to the Pallas kernel for
supported shapes (n in {8..256} aligned, f32, TPU backend) and falls
back to ``jnp.linalg.cholesky`` otherwise.
"""
import functools

import jax
import jax.numpy as jnp

from .blocked_cholesky import _phi

_LANE = 128


def _kernel(a_ref, out_ref):
    c, n, _ = a_ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (c, n, n), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c, n, n), 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, 1, n), 2)

    def body(j, carry):
        W, L = carry
        # row j of the (symmetric) working matrix via a masked sublane
        # reduction (dynamic_slice has no Pallas-TPU lowering)
        row = jnp.sum(jnp.where(row_ids == j, W, 0.0), axis=1,
                      keepdims=True)                         # (c,1,n)
        # d^2 = W[j, j]: masked lane reduction of row j
        d2 = jnp.sum(jnp.where(lane == j, row, 0.0), axis=2,
                     keepdims=True)                          # (c,1,1)
        inv_d = jax.lax.rsqrt(d2)
        d = d2 * inv_d
        # strict-lower update vector (zeros at k <= j)
        col = jnp.where(lane > j, row * inv_d, 0.0)          # (c,1,n)
        col_t = jnp.swapaxes(col, 1, 2)                      # (c,n,1)
        W = W - col_t * col                                  # rank-1
        # write column j of L: diagonal d, below-diagonal col
        newcol = jnp.where(row_ids == j, d,
                           jnp.where(row_ids > j,
                                     jnp.swapaxes(col, 1, 2), 0.0))
        L = jnp.where(col_ids == j, newcol, L)
        return W, L

    W0 = a_ref[:]
    L0 = jnp.zeros_like(W0)
    _, L = jax.lax.fori_loop(0, n, body, (W0, L0))
    out_ref[:] = L


def _pallas_batched_cholesky(A, batch_chunk, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, n, _ = A.shape
    c = min(batch_chunk, B)
    grid = (-(-B // c),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((c, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(5 * B * n ** 3),
            bytes_accessed=int(2 * A.size * 4), transcendentals=B * n),
        interpret=interpret,
    )(A)


def _supported(shape, dtype):
    # measured envelope (benchmarks/cholesky_wall.py, NOTES.md r3): the
    # batch-vectorized kernel wins ~1.5x ONLY for tiny matrices at
    # large batch (n <= 64, B >= 256) — at n >= 128 the n-step serial
    # chain is latency-bound and the masked full-matrix updates cost
    # more than XLA's native path. Outside the envelope: exact fallback.
    if len(shape) != 3 or dtype != jnp.float32:
        return False
    B, m, n = shape
    if m != n or not 8 <= n <= 64 or n % 8 or B < 256:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def batched_cholesky(A, batch_chunk=16):
    """Cholesky of a stack (B, n, n) of small SPD matrices.

    Pallas batch-vectorized kernel on TPU inside the measured-win
    envelope (f32, 8 <= n <= 64, n % 8 == 0, B >= 256 — see
    ``_supported``); exact ``jnp.linalg.cholesky`` fallback elsewhere.
    """
    if _supported(A.shape, A.dtype):
        return _pallas_batched_cholesky(A, batch_chunk)
    return jnp.linalg.cholesky(A)


def cholesky(A, batch_chunk=16):
    """Drop-in ``jnp.linalg.cholesky`` that takes the Pallas fast path
    when the leading dims flatten into a qualifying batch (used by the
    MVN family, whose runtime covariances are (samples, ..., D, D))."""
    if A.ndim < 3:
        return jnp.linalg.cholesky(A)
    lead = A.shape[:-2]
    B = 1
    for d in lead:
        B *= int(d)
    if not _supported((B,) + A.shape[-2:], A.dtype):
        return jnp.linalg.cholesky(A)
    L = batched_cholesky(A.reshape((B,) + A.shape[-2:]), batch_chunk)
    return L.reshape(A.shape)


def _fwd(A, batch_chunk):
    L = batched_cholesky(A, batch_chunk)
    return L, L


def _bwd(batch_chunk, L, dL):
    import jax.scipy.linalg as jsl
    from .precision import einsum as p_einsum
    P = _phi(p_einsum("...ji,...jk->...ik", L, dL))
    S = jsl.solve_triangular(jnp.swapaxes(L, -1, -2), P, lower=False)
    S = jnp.swapaxes(jsl.solve_triangular(
        jnp.swapaxes(L, -1, -2), jnp.swapaxes(S, -1, -2), lower=False),
        -1, -2)
    return (0.5 * (S + jnp.swapaxes(S, -1, -2)),)


batched_cholesky.defvjp(_fwd, _bwd)
