"""Batch-vectorized Pallas Cholesky for many small matrices.

The measured wall (benchmarks/cholesky_wall.py): XLA's batched
``cholesky`` at (512, 128, 128) runs at 0.040 TFLOP/s — ~700x below
the matmul ceiling — because it serializes the panel recurrence per
matrix and leaves the batch dimension on the slow path. This kernel
inverts the layout: the *column recurrence* stays serial (n steps, the
true data dependence), but every step is a full-width VPU operation
over (batch_chunk, n, n) — the batch and trailing-submatrix axes ride
the vector lanes.

Measured outcome (r4, NOTES.md; v5e, paired in-process, scan-chain +
scalar-fetch protocol) for the production ``_kernel_v2`` (one full
VPU pass per column instead of the r3 kernel's ~5 — dynamic sublane
row loads and a transposed output replace three masked full-matrix
passes):

    (512, 32²):  1.96 vs 3.52 ms native   1.80x
    (512, 64²):  2.89 vs 5.41             1.87x
    (2048, 64²): 7.59 vs 16.78            2.21x
    (512, 128²): 6.56 vs 9.04             1.38x   <- was a tie in r3
    (128, 128²): 2.92 vs 3.75             1.28x
    (512, 256²): 23.9 vs 23.6             tie  -> native fallback

The dispatcher uses the Pallas path only inside the measured-win
envelope (f32, n % 8 == 0, (n <= 64, B >= 256) or (n <= 128,
B >= 64)); below it the ~1.9 ms single-Cholesky latency floor is the
serial recurrence itself and nothing here helps (NOTES.md r3).

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


def _kernel_v2(a_ref, lt_ref, w_ref):
    """One-pass-per-column variant (r4).

    The r3 kernel (`_kernel`) pays ~5 full (c, n, n) VPU passes per
    column step (masked row extraction, rank-1 update, two masked L
    writes); that is why it tied/lost at n >= 128. This version keeps
    the working matrix in a VMEM SCRATCH REF so step j is:

      row  = W[:, j, :]        one (c, 1, n) DYNAMIC SUBLANE load
                               (row j == column j by symmetry — no
                               masked full-matrix reduction)
      d, col                   cheap (c, 1, n) lane ops
      L^T[:, j, :] = ...       one (c, 1, n) dynamic sublane STORE
                               (the output is built TRANSPOSED so the
                               per-column write is a row write)
      W -= col^T col           the single remaining full FMA pass

    i.e. one full (c, n, n) pass per step instead of ~5. The caller
    transposes L^T back (one XLA batched transpose for the whole
    stack). Measured on the v5e (benchmarks/cholesky_wall.py, r4): see
    NOTES.md — this is what extends the win envelope to n = 128/256.
    """
    c, n, _ = a_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, 1, n), 2)
    from jax.experimental import pallas as pl

    w_ref[:] = a_ref[:]

    def body(j, _):
        row = w_ref[:, pl.ds(j, 1), :]                       # (c,1,n)
        d2 = jnp.sum(jnp.where(lane == j, row, 0.0), axis=2,
                     keepdims=True)                          # (c,1,1)
        inv_d = jax.lax.rsqrt(d2)
        col = jnp.where(lane > j, row * inv_d, 0.0)          # (c,1,n)
        lt_ref[:, pl.ds(j, 1), :] = jnp.where(lane == j, d2 * inv_d,
                                              col)
        col_t = jnp.swapaxes(col, 1, 2)                      # (c,n,1)
        w_ref[:] = w_ref[:] - col_t * col                    # rank-1
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _pallas_batched_cholesky_v2(A, batch_chunk, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, n, _ = A.shape
    c = min(batch_chunk, B)
    grid = (-(-B // c),)
    Lt = pl.pallas_call(
        _kernel_v2,
        grid=grid,
        in_specs=[pl.BlockSpec((c, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        scratch_shapes=[pltpu.VMEM((c, n, n), A.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * n ** 3),
            bytes_accessed=int(2 * A.size * 4), transcendentals=B * n),
        interpret=interpret,
    )(A)
    return jnp.swapaxes(Lt, -1, -2)


def _supported(shape, dtype):
    # measured envelope (benchmarks/cholesky_wall.py; NOTES.md r3+r4):
    # the r4 one-pass-per-column kernel wins 1.6-2.2x for n <= 64 at
    # B >= 256 (c=128) and 1.28-1.38x for 64 < n <= 128 at B >= 64
    # (c=32); it TIES native at n = 256 and the required chunk no
    # longer compiles above that — exact native fallback there.
    if len(shape) != 3 or dtype != jnp.float32:
        return False
    B, m, n = shape
    if m != n or n % 8:
        return False
    if not ((8 <= n <= 64 and B >= 256)
            or (64 < n <= 128 and B >= 64)):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _auto_chunk(shape):
    """Measured-optimal batch chunk (r4 sweep): big chunks amortize
    the serial column recurrence over more vector lanes until VMEM
    caps out (~6 MB of (c, n, n) triple buffer)."""
    B, n, _ = shape
    return min(128 if n <= 64 else 32, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def batched_cholesky(A, batch_chunk=None):
    """Cholesky of a stack (B, n, n) of small SPD matrices.

    Pallas batch-vectorized kernel on TPU inside the measured-win
    envelope (f32, n % 8 == 0, and (n <= 64, B >= 256) or
    (n <= 128, B >= 64) — see ``_supported``); exact
    ``jnp.linalg.cholesky`` fallback elsewhere. ``batch_chunk=None``
    picks the measured-optimal chunk for the shape.
    """
    if _supported(A.shape, A.dtype):
        c = batch_chunk if batch_chunk else _auto_chunk(A.shape)
        return _pallas_batched_cholesky_v2(A, c)
    return jnp.linalg.cholesky(A)


def cholesky(A, batch_chunk=None):
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
