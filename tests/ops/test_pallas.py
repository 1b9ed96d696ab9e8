"""Pallas fused RBF kernel-matrix tests (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxfusion_tpu.ops import pallas_kernels as pk


@pytest.fixture
def force_interpret():
    pk.set_use_pallas(True)
    pk.set_force_interpret(True)
    yield
    pk.set_force_interpret(False)
    pk.set_use_pallas(False)


def test_eligibility_gate():
    X = jnp.zeros((1, 512, 8), dtype=jnp.float32)
    assert not pk.pallas_eligible(X, None)  # default off
    pk.set_use_pallas(True)
    pk.set_force_interpret(True)
    try:
        assert pk.pallas_eligible(X, None)
        # misaligned N
        assert not pk.pallas_eligible(jnp.zeros((1, 100, 8),
                                                dtype=jnp.float32), None)
        # float64
        assert not pk.pallas_eligible(jnp.zeros((1, 512, 8)), None)
        # sampled (s > 1)
        assert not pk.pallas_eligible(jnp.zeros((2, 512, 8),
                                                dtype=jnp.float32), None)
    finally:
        pk.set_force_interpret(False)
        pk.set_use_pallas(False)


def test_pallas_rbf_matches_jnp(force_interpret):
    rng = np.random.default_rng(0)
    N, M, D = 512, 256, 8
    X = jnp.asarray(rng.standard_normal((1, N, D)), dtype=jnp.float32)
    X2 = jnp.asarray(rng.standard_normal((1, M, D)), dtype=jnp.float32)
    ls = jnp.asarray(rng.random(D) + 0.5, dtype=jnp.float32)[None]
    var = jnp.asarray([[1.3]], dtype=jnp.float32)
    K_pallas = pk.rbf_kernel_matrix(X, X2, ls, var)
    K_jnp = pk._rbf_jnp(X, X2, ls, var)
    assert np.allclose(np.asarray(K_pallas), np.asarray(K_jnp),
                       rtol=1e-5, atol=1e-5)


def test_pallas_rbf_gradients_match(force_interpret):
    rng = np.random.default_rng(1)
    N, D = 256, 4
    X = jnp.asarray(rng.standard_normal((1, N, D)), dtype=jnp.float32)
    ls = jnp.asarray(rng.random(D) + 0.5, dtype=jnp.float32)[None]
    var = jnp.asarray([[1.1]], dtype=jnp.float32)

    def loss_pallas(X, ls, var):
        return jnp.sum(jnp.sin(pk.rbf_kernel_matrix(X, None, ls, var)))

    def loss_jnp(X, ls, var):
        return jnp.sum(jnp.sin(pk._rbf_jnp(X, None, ls, var)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(X, ls, var)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(X, ls, var)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                           atol=1e-4)
