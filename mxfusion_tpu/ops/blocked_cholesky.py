"""Blocked right-looking Cholesky tuned for the TPU MXU.

XLA's native ``cholesky`` serializes panel factorization and measures
2-3 orders of magnitude below the MXU matmul ceiling on this chip
(benchmarks/NOTES.md: 0.04-0.4 TFLOP/s vs 28.5) — the binding
constraint for exact-GP / large-M workloads (VERDICT r2 item 7).

This routine restructures the factorization so ~all of the n^3/3 FLOPs
land on the MXU as rank-`block` symmetric updates (syrk-shaped
einsums at HIGHEST precision), leaving XLA's serial path only the
nb = n/block small diagonal-block factorizations:

    for k in 0..nb-1:
        L[k,k]   = chol(A[k,k])                       (XLA, block x block)
        L[k+1:,k] = A[k+1:,k] @ L[k,k]^-T             (MXU: inv via one
                                                       small trsm + matmul)
        A[k+1:,k+1:] -= L[k+1:,k] @ L[k+1:,k]^T       (MXU syrk)

The python loop unrolls at trace time (static shapes per panel; the
trailing block shrinks each iteration so no wasted padding FLOPs).

Gradient: a ``jax.custom_vjp`` with the standard Cholesky cotangent
formula (two triangular solves), so training through ``cholesky`` costs
the same backward as XLA's native op.

Replaces nothing by default: ``ops.linalg`` users opt in via
``cholesky(A, block=...)`` or the module-level default policy
``blocked_cholesky_auto`` (adopted only where measured faster — see
benchmarks/cholesky_wall.py and NOTES.md).
"""
import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .precision import einsum as p_einsum


def _blocked_cholesky_impl(A, block):
    n = A.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(A)
    nb = -(-n // block)
    cols = []  # per-panel (ke - kb sized) column strips, assembled at end
    for k in range(nb):
        kb, ke = k * block, min((k + 1) * block, n)
        b = ke - kb
        akk = A[..., kb:ke, kb:ke]
        lkk = jnp.linalg.cholesky(akk)
        if ke < n:
            # panel solve as ONE small trsm (b x b) + an MXU matmul:
            # L[ke:, kb:ke] = A[ke:, kb:ke] @ lkk^-T
            eye = jnp.eye(b, dtype=A.dtype)
            lkk_inv = jsl.solve_triangular(
                lkk, jnp.broadcast_to(eye, lkk.shape), lower=True)
            lrest = p_einsum("...ij,...kj->...ik",
                             A[..., ke:, kb:ke], lkk_inv)
            # trailing syrk on the MXU (the n^3/3 bulk)
            A = A.at[..., ke:, ke:].add(
                -p_einsum("...ik,...jk->...ij", lrest, lrest))
            strip = jnp.concatenate([lkk, lrest], axis=-2)
        else:
            strip = lkk
        pad_top = jnp.zeros(A.shape[:-2] + (kb, b), dtype=A.dtype)
        cols.append(jnp.concatenate([pad_top, strip], axis=-2))
    return jnp.concatenate(cols, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def blocked_cholesky(A, block=512):
    """Cholesky factor of SPD ``A`` (..., n, n) with MXU-rate updates."""
    return _blocked_cholesky_impl(A, block)


def _fwd(A, block):
    L = _blocked_cholesky_impl(A, block)
    return L, L


def _phi(X):
    """Lower triangle with the diagonal halved (Cholesky-grad helper)."""
    return jnp.tril(X) - 0.5 * jnp.diagonal(
        X, axis1=-2, axis2=-1)[..., None] * jnp.eye(
            X.shape[-1], dtype=X.dtype)


def _bwd(block, L, dL):
    # standard Cholesky cotangent: dA = 0.5 (L^-T P L^-1 + (.)^T),
    # P = phi(L^T dL)  [Murray 2016; same formula XLA's grad uses]
    P = _phi(p_einsum("...ji,...jk->...ik", L, dL))
    # S = L^-T P L^-1 via two triangular solves
    S = jsl.solve_triangular(
        jnp.swapaxes(L, -1, -2), P, lower=False)
    S = jnp.swapaxes(jsl.solve_triangular(
        jnp.swapaxes(L, -1, -2), jnp.swapaxes(S, -1, -2), lower=False),
        -1, -2)
    dA = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    return (dA,)


blocked_cholesky.defvjp(_fwd, _bwd)
