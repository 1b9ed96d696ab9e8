"""Linalg building blocks for the GP/inference stack.

These replace the reference's two hand-written MXNet custom operators
(/root/reference/mxfusion/util/customop.py:22-146): ``make_diagonal``
(batched diag-embed) and ``broadcast_to_w_samples`` (sample-aware
broadcast). In JAX both are plain traceable functions — XLA derives the
VJPs the reference had to hand-write (sum-backward for broadcast,
diagonal-extract for diag-embed).
"""
import jax.numpy as jnp


def make_diagonal(x):
    """Batched diag-embed: (..., N) -> (..., N, N)."""
    n = x.shape[-1]
    out = jnp.zeros(x.shape + (n,), dtype=x.dtype)
    idx = jnp.arange(n)
    return out.at[..., idx, idx].set(x)


def broadcast_to_w_samples(x, shape, num_samples):
    """Broadcast ``x`` to ``(num_samples,) + shape`` respecting the sample axis.

    ``x`` carries a leading sample axis (size 1 or num_samples); the
    remaining axes are right-aligned against ``shape`` and broadcast.
    """
    n_target = len(shape)
    n_source = x.ndim - 1
    if n_target - n_source > 0:
        t_shape = (x.shape[0],) + (1,) * (n_target - n_source) + \
            tuple(x.shape[1:])
        x = jnp.reshape(x, t_shape)
    return jnp.broadcast_to(x, (num_samples,) + tuple(shape))


def wide_triangular_solve(L, B, lower=True):
    """Triangular solve tuned for tall/wide right-hand sides on TPU.

    XLA lowers ``triangular_solve`` to a blocked substitution that runs
    far below MXU peak when the RHS is much wider than the triangle.
    For N_rhs >= 4*M we instead form ``L⁻¹`` once (one M×M solve) and
    apply it as a full-precision matmul — identical math, MXU-rate
    throughput. Small RHS keep the substitution path (better numerics,
    no inverse materialization).
    """
    import jax.scipy.linalg as jsl
    from .precision import guarded_forward_matmul
    M = L.shape[-1]
    n_rhs = B.shape[-1]
    if n_rhs < 4 * M:
        return jsl.solve_triangular(L, B, lower=lower)
    eye = jnp.eye(M, dtype=L.dtype)
    Linv = jsl.solve_triangular(L, jnp.broadcast_to(
        eye, L.shape[:-2] + (M, M)), lower=lower)
    # the wide RHS is the data axis: the forward product is floored at
    # HIGH — solve outputs routinely feed cancellation-amplified
    # consumers (the SVGP trace pair), where a 1-pass product's 2^-8
    # rounding stalls convergence — while cotangents ride the
    # configured data tier (measured split:
    # benchmarks/precision_convergence.py r5)
    return guarded_forward_matmul(Linv, B)


def triangular_inverse(L, lower=True):
    """Explicit ``L⁻¹`` via one triangular solve against I (batched).

    Used to FUSE several solves against the same triangle into matmuls:
    on TPU each extra ``triangular_solve`` is a serial, latency-bound
    kernel, while applying a materialized inverse rides the MXU and
    fuses with neighbors. Same error model as the wide path of
    :func:`wide_triangular_solve` (bounded by the ill-conditioning test
    in tests/ops)."""
    import jax.scipy.linalg as jsl
    M = L.shape[-1]
    eye = jnp.eye(M, dtype=L.dtype)
    return jsl.solve_triangular(
        L, jnp.broadcast_to(eye, L.shape[:-2] + (M, M)), lower=lower)


def cholesky_logdet(A):
    """(L, logdet) for SPD A via one Cholesky (batched)."""
    L = jnp.linalg.cholesky(A)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                           axis=-1)
    return L, logdet
