"""util.special and ops.linalg tests (reference: testing/util/
special_test.py and customop_test.py)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import multigammaln

from mxfusion_tpu.util.special import (
    log_determinant, log_multivariate_gamma, trace, solve_posdef,
    solve_triangular)
from mxfusion_tpu.ops.linalg import (make_diagonal,
                                     broadcast_to_w_samples,
                                     cholesky_logdet)
from mxfusion_tpu.util.testutils import make_spd_matrix


def test_log_determinant_batched():
    rng = np.random.default_rng(0)
    A = np.stack([make_spd_matrix(4, rng) for _ in range(3)])
    result = np.asarray(log_determinant(jnp.asarray(A)))
    expected = np.linalg.slogdet(A)[1]
    assert np.allclose(result, expected, rtol=1e-8)


def test_log_multivariate_gamma():
    for p in [1, 2, 4]:
        x = np.linspace(3.0, 8.0, 5)
        result = np.asarray(log_multivariate_gamma(jnp.asarray(x), p))
        expected = np.asarray([multigammaln(v, p) for v in x])
        assert np.allclose(result, expected, rtol=1e-10)


def test_trace_and_solves():
    rng = np.random.default_rng(1)
    A = make_spd_matrix(5, rng)
    b = rng.standard_normal((5, 2))
    assert np.isclose(float(trace(jnp.asarray(A))), np.trace(A))
    x = np.asarray(solve_posdef(jnp.asarray(A), jnp.asarray(b)))
    assert np.allclose(A @ x, b, rtol=1e-7, atol=1e-8)
    L = np.linalg.cholesky(A)
    y = np.asarray(solve_triangular(jnp.asarray(L), jnp.asarray(b)))
    assert np.allclose(L @ y, b, rtol=1e-7, atol=1e-8)
    yt = np.asarray(solve_triangular(jnp.asarray(L), jnp.asarray(b),
                                     trans=True))
    assert np.allclose(L.T @ yt, b, rtol=1e-7, atol=1e-8)


def test_make_diagonal_and_grad():
    # replaces the reference's hand-written MakeDiagonalOp VJP
    # (customop.py:22-81): XLA derives the gradient
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    D = np.asarray(make_diagonal(x))
    assert np.allclose(D[0], np.diag([1.0, 2.0, 3.0]))
    g = jax.grad(lambda v: jnp.sum(make_diagonal(v) * 2.0))(x)
    assert np.allclose(np.asarray(g), 2.0)


def test_broadcast_to_w_samples_and_grad():
    # replaces BroadcastToWithSamplesOp (customop.py:84-146): the
    # backward of a broadcast is a sum-reduction, derived by XLA
    x = jnp.ones((1, 3))
    out = broadcast_to_w_samples(x, (4, 3), 5)
    assert out.shape == (5, 4, 3)
    g = jax.grad(lambda v: jnp.sum(broadcast_to_w_samples(v, (4, 3), 5))
                 )(x)
    assert np.allclose(np.asarray(g), 20.0)


def test_cholesky_logdet():
    rng = np.random.default_rng(2)
    A = make_spd_matrix(4, rng)
    L, logdet = cholesky_logdet(jnp.asarray(A))
    assert np.allclose(np.asarray(L) @ np.asarray(L).T, A, rtol=1e-8)
    assert np.isclose(float(logdet), np.linalg.slogdet(A)[1])
