"""Tests for the Cholesky-wall prototypes (NOTES.md r3).

``blocked_cholesky`` (MXU-syrk blocked factorization, measured no-win
vs XLA native on the v5e — kept as an op, not wired anywhere) and
``batched_cholesky`` (Pallas batch-vectorized small-matrix kernel,
measured 1.3-1.5x inside its n<=64 / B>=256 envelope on TPU; exact
fallback elsewhere). On the CPU suite the Pallas kernel runs in
interpreter mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxfusion_tpu.ops import blocked_cholesky, batched_cholesky
from mxfusion_tpu.ops.pallas_batched_cholesky import (
    _pallas_batched_cholesky, _supported)


def _spd(shape, scale, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal(shape).astype(dtype)
    n = shape[-1]
    return W @ np.swapaxes(W, -1, -2) + scale * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("n,block", [(64, 16), (100, 32), (513, 128)])
def test_blocked_cholesky_matches_native(n, block):
    A = _spd((n, n), n)
    L = np.asarray(blocked_cholesky(jnp.asarray(A), block))
    np.testing.assert_allclose(L, np.linalg.cholesky(A),
                               rtol=1e-12, atol=1e-12)


def test_blocked_cholesky_batched_and_grad():
    A = _spd((3, 96, 96), 96, seed=1)
    L = np.asarray(blocked_cholesky(jnp.asarray(A), 32))
    for i in range(3):
        np.testing.assert_allclose(L[i], np.linalg.cholesky(A[i]),
                                   rtol=1e-12, atol=1e-12)
    A1 = jnp.asarray(A[0])
    g1 = np.asarray(jax.grad(
        lambda a: jnp.sum(jnp.sin(blocked_cholesky(a, 32))))(A1))
    g2 = np.asarray(jax.grad(
        lambda a: jnp.sum(jnp.sin(jnp.linalg.cholesky(a))))(A1))
    # compare symmetrized cotangents (conventions differ off-diagonal)
    np.testing.assert_allclose(g1 + g1.T, g2 + g2.T,
                               rtol=1e-9, atol=1e-11)


def test_batched_cholesky_fallback_outside_envelope():
    # small batch / f64 / big n are all outside the Pallas envelope:
    # must be the exact native result
    A = _spd((4, 128, 128), 128, seed=2)
    L = np.asarray(batched_cholesky(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A),
                               rtol=1e-12, atol=1e-12)
    assert not _supported((4, 128, 128), jnp.float32)   # B < 64
    assert not _supported((512, 48, 48), jnp.float64)   # f64
    assert not _supported((512, 256, 256), jnp.float32)  # n > 128 ties
    # r4 envelope: n = 128 qualifies at B >= 64 (measured 1.28-1.38x)
    assert _supported((64, 128, 128), jnp.float32) == \
        (jax.default_backend() == "tpu")


def test_batched_cholesky_grad_matches_native():
    A = jnp.asarray(_spd((8, 32, 32), 32, seed=3))
    g1 = np.asarray(jax.grad(
        lambda a: jnp.sum(jnp.sin(batched_cholesky(a))))(A))
    g2 = np.asarray(jax.grad(
        lambda a: jnp.sum(jnp.sin(jnp.linalg.cholesky(a))))(A))
    np.testing.assert_allclose(g1 + np.swapaxes(g1, -1, -2),
                               g2 + np.swapaxes(g2, -1, -2),
                               rtol=1e-9, atol=1e-11)


def test_pallas_kernel_interpret_mode_matches_native():
    """Exercises the actual kernel logic (masked row extraction,
    rank-1 updates, column writes) in the Pallas interpreter on CPU."""
    A = _spd((32, 64, 64), 64, seed=4, dtype=np.float32)
    L = np.asarray(_pallas_batched_cholesky(jnp.asarray(A), 16,
                                            interpret=True))
    Lref = np.linalg.cholesky(A.astype(np.float64))
    err = np.abs(L - Lref).max() / np.abs(Lref).max()
    assert err < 5e-6, err


def test_pallas_kernel_v2_interpret_mode_matches_native():
    """The r4 one-pass-per-column kernel (dynamic sublane row load,
    transposed output, single rank-1 pass) — the production path
    inside the envelope — against the f64 native result, including a
    ragged trailing batch block."""
    from mxfusion_tpu.ops.pallas_batched_cholesky import \
        _pallas_batched_cholesky_v2
    for B, n, c in [(32, 64, 16), (24, 128, 16), (40, 32, 16)]:
        A = _spd((B, n, n), n, seed=5, dtype=np.float32)
        L = np.asarray(_pallas_batched_cholesky_v2(
            jnp.asarray(A), c, interpret=True))
        Lref = np.linalg.cholesky(A.astype(np.float64))
        err = np.abs(L - Lref).max() / np.abs(Lref).max()
        assert err < 5e-6, (B, n, c, err)
        # strictly lower triangular (the transposed write path must
        # leave the upper triangle exactly zero)
        assert np.all(np.triu(L, 1) == 0.0)
