"""Tests for ops.linalg, in particular the explicit-inverse path of
``wide_triangular_solve`` under ill conditioning.

The wide-RHS path forms L^-1 explicitly (the right TPU tradeoff: one
M x M substitution, then MXU-rate matmuls). Explicit inversion is the
textbook numerics worry, so this bounds its error against the
substitution path on Cholesky factors of kernel matrices with condition
numbers up to ~1e12 — exactly the near-singular Kuu regime (tiny
lengthscale-to-spacing ratios, no jitter) where a user would notice.
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import pytest

from mxfusion_tpu.ops.linalg import (wide_triangular_solve,
                                     make_diagonal, cholesky_logdet)


def _ill_conditioned_chol(m, cond, seed=0):
    """Cholesky factor of an SPD matrix with condition number ~cond."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    eigs = np.logspace(0, -np.log10(cond), m)
    A = (Q * eigs) @ Q.T
    A = 0.5 * (A + A.T)
    return np.linalg.cholesky(A), A


@pytest.mark.parametrize("cond", [1e3, 1e6, 1e9, 1e12])
def test_wide_solve_error_tracks_substitution_under_ill_conditioning(
        cond):
    m, n = 24, 128  # n >= 4*m selects the explicit-inverse path
    L, _ = _ill_conditioned_chol(m, cond)
    rng = np.random.default_rng(1)
    X_true = rng.standard_normal((m, n))
    B = L @ X_true  # consistent RHS: exact solution known

    X_wide = np.asarray(wide_triangular_solve(jnp.asarray(L),
                                              jnp.asarray(B)))
    X_sub = np.asarray(jsl.solve_triangular(jnp.asarray(L),
                                            jnp.asarray(B), lower=True))

    scale = np.abs(X_true).max()
    err_wide = np.abs(X_wide - X_true).max() / scale
    err_sub = np.abs(X_sub - X_true).max() / scale
    # both paths degrade with sqrt(cond(A)) = cond(L); the inverse path
    # must stay within a small constant factor of substitution and
    # within the forward-stability budget eps * cond(L)
    eps = np.finfo(X_wide.dtype).eps
    budget = 30 * eps * np.sqrt(cond)
    assert err_wide <= max(10 * err_sub, budget), (
        "explicit-inverse path error {:.3e} vs substitution {:.3e} at "
        "cond {:.0e}".format(err_wide, err_sub, cond))


def test_wide_solve_matches_substitution_well_conditioned():
    m, n = 16, 200
    L, _ = _ill_conditioned_chol(m, 1e2, seed=2)
    B = np.random.default_rng(3).standard_normal((m, n))
    a = np.asarray(wide_triangular_solve(jnp.asarray(L), jnp.asarray(B)))
    b = np.asarray(jsl.solve_triangular(jnp.asarray(L), jnp.asarray(B),
                                        lower=True))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_narrow_rhs_uses_substitution_path():
    """n < 4*m keeps exact substitution (bitwise-identical result)."""
    m, n = 16, 8
    L, _ = _ill_conditioned_chol(m, 1e4, seed=4)
    B = np.random.default_rng(5).standard_normal((m, n))
    a = np.asarray(wide_triangular_solve(jnp.asarray(L), jnp.asarray(B)))
    b = np.asarray(jsl.solve_triangular(jnp.asarray(L), jnp.asarray(B),
                                        lower=True))
    assert np.array_equal(a, b)


def test_make_diagonal_and_cholesky_logdet():
    x = np.random.default_rng(6).standard_normal((3, 5))
    D = np.asarray(make_diagonal(jnp.asarray(x)))
    assert D.shape == (3, 5, 5)
    for i in range(3):
        np.testing.assert_allclose(np.diag(D[i]), x[i])
        assert np.all(D[i][~np.eye(5, dtype=bool)] == 0)
    _, A = _ill_conditioned_chol(6, 1e3, seed=7)
    L, logdet = cholesky_logdet(jnp.asarray(A))
    np.testing.assert_allclose(float(logdet), np.linalg.slogdet(A)[1],
                               rtol=1e-10)
