"""Special linear-algebra functions.

TPU-native equivalents of the reference's MXNet linalg specials
(/root/reference/mxfusion/util/special.py:21-131): everything maps to
XLA-batched Cholesky / triangular ops that tile onto the MXU.
"""
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.scipy.special import gammaln


def log_determinant(A):
    """log|A| for SPD ``A`` (batched) via Cholesky."""
    L = jnp.linalg.cholesky(A)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def log_multivariate_gamma(x, p):
    """Multivariate log-gamma ``log Γ_p(x)`` (batched over x)."""
    x = jnp.asarray(x)
    j = jnp.arange(1, p + 1, dtype=x.dtype)
    return (p * (p - 1) / 4.0) * jnp.log(jnp.pi) + jnp.sum(
        gammaln(x[..., None] + (1.0 - j) / 2.0), axis=-1)


def trace(A):
    """Batched trace over the last two axes."""
    return jnp.trace(A, axis1=-2, axis2=-1)


def solve_posdef(A, b):
    """Solve ``A x = b`` for SPD ``A`` via Cholesky (batched)."""
    L = jnp.linalg.cholesky(A)
    y = jsl.solve_triangular(L, b, lower=True)
    return jsl.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)


def solve_triangular(L, b, lower=True, trans=False):
    """Batched triangular solve (thin wrapper for a single import site)."""
    if trans:
        L = jnp.swapaxes(L, -1, -2)
        lower = not lower
    return jsl.solve_triangular(L, b, lower=lower)
