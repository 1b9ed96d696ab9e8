"""Fused RBF-gram -> L^-1 product kernel tests (interpreter mode, CPU).

The fused data path (ops/pallas_fused_gram.py) replaces the SVGP
bound's materialized-Kuf pipeline inside its measured-win envelope
(N >= 131072 on TPU). These tests pin its forward values and its
hand-written custom-VJP cotangents against the pure-jnp reference on
shapes that exercise multi-tile grid accumulation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxfusion_tpu.ops import pallas_fused_gram as pfg


@pytest.fixture
def interpret():
    pfg.set_interpret(True)
    yield
    pfg.set_interpret(False)


def _case(seed, M=128, N=2048, D=8):
    rng = np.random.default_rng(seed)
    Zs = jnp.asarray(rng.random((M, D)) * 3.0, jnp.float32)
    Xs = jnp.asarray(rng.random((N, D)) * 3.0, jnp.float32)
    # a well-conditioned lower-triangular "L^-1" stand-in
    A = rng.standard_normal((M, M)).astype(np.float32) * 0.05
    Linv = jnp.asarray(np.tril(A) + np.eye(M, dtype=np.float32))
    var = jnp.asarray(1.4, jnp.float32)
    return Linv, Zs, Xs, var


def test_forward_matches_reference(interpret):
    Linv, Zs, Xs, var = _case(0)
    got = pfg.fused_linv_rbf_gram(Linv, Zs, Xs, var)
    want = pfg.reference_linv_rbf_gram(Linv, Zs, Xs, var)
    # 3-pass hi/lo split keeps ~f32 operand fidelity
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_reference(interpret):
    Linv, Zs, Xs, var = _case(1, N=2048)  # 2 grid tiles: accumulation
    probe = jnp.asarray(
        np.random.default_rng(7).standard_normal((128, 2048)),
        jnp.float32) * 0.01

    def loss_fused(L, Z, X, v):
        return jnp.sum(pfg.fused_linv_rbf_gram(L, Z, X, v) * probe)

    def loss_ref(L, Z, X, v):
        return jnp.sum(pfg.reference_linv_rbf_gram(L, Z, X, v) * probe)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(Linv, Zs, Xs, var)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(Linv, Zs, Xs, var)
    for a, b, name in zip(g1, g2, ("dLinv", "dZs", "dXs", "dvar")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
            err_msg=name)
    assert g1[3].shape == var.shape


def test_supported_envelope():
    f32 = jnp.float32
    # CPU backend: never supported (the win is a TPU HBM-traffic one)
    assert not pfg.supported(512, 1 << 18, 32, f32)
    # shape legs of the envelope, backend-independent rejections
    assert not pfg.supported(512, 65536, 32, f32)       # N below gate
    assert not pfg.supported(500, 1 << 18, 32, f32)     # M not lane-mult
    assert not pfg.supported(512, 1 << 18, 32, jnp.float64)
    assert not pfg.supported(512, (1 << 18) + 100, 32, f32)  # N % 256


def test_kill_switch_roundtrip():
    assert pfg.enabled()
    pfg.set_enabled(False)
    try:
        assert not pfg.enabled()
    finally:
        pfg.set_enabled(True)
    assert pfg.enabled()
