"""Property tests for the sampler support bijections.

The conjugate-posterior integration tests (test_constrained_latents.py,
test_hmc.py) already pin these end-to-end; here each bijector is
checked directly against an autodiff oracle over seeded random draws:
round-trip identity and log_jacobian == log|det d constrain/dz|
computed exactly with jax.jacobian. Reference behavior contract:
constrained parameters in /root/reference are handled by optimizer-side
transformations only (mxfusion/components/variables/var_trans.py:21-147);
sampler-side support bijection is this framework's extension, so the
oracle here is the mathematics itself.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mxfusion_tpu.inference.hmc import SupportTransforms


def _logdet_oracle(transforms, z, u, square_slice=None):
    """log|det| of d constrain/dz for one chain via jax.jacobian."""
    def f(zv):
        x = transforms.constrain({u: zv[None]})[u][0]
        if square_slice is not None:
            x = x[..., :square_slice]
        return x
    J = jax.jacobian(f)(z)
    J = J.reshape(z.size, z.size) if J.ndim > 2 else J
    sign, logdet = np.linalg.slogdet(np.asarray(J, dtype=np.float64))
    assert sign > 0
    return logdet


@pytest.mark.parametrize("support,shape", [
    ("positive", (3,)),
    ("unit_interval", (4,)),
])
def test_elementwise_bijection_roundtrip_and_jacobian(support, shape):
    rng = np.random.default_rng(hash(support) % (2 ** 31))
    tr = SupportTransforms({"u": support})
    n_chains = 2
    z = jnp.asarray(rng.standard_normal((n_chains,) + shape))

    x = tr.constrain({"u": z})["u"]
    if support == "positive":
        assert np.all(np.asarray(x) > 0)
    else:
        assert np.all((np.asarray(x) > 0) & (np.asarray(x) < 1))
    z_back = tr.unconstrain({"u": x})["u"]
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                               rtol=1e-10, atol=1e-10)

    lj = np.asarray(tr.log_jacobian({"u": z}))
    assert lj.shape[0] == n_chains
    for c in range(n_chains):
        # the per-chain Jacobian of an elementwise map is diagonal; the
        # autodiff slogdet is the exact oracle for the analytic term
        expected = _logdet_oracle(tr, z[c], "u")
        np.testing.assert_allclose(float(np.sum(lj[c])), expected,
                                   rtol=1e-9, atol=1e-9)


def test_simplex_bijection_roundtrip_and_jacobian():
    rng = np.random.default_rng(7)
    K, n_chains = 5, 2
    tr = SupportTransforms({"u": "simplex"})
    z = jnp.asarray(rng.standard_normal((n_chains, K - 1)))

    x = tr.constrain({"u": z})["u"]
    xs = np.asarray(x)
    assert np.all(xs > 0)
    np.testing.assert_allclose(xs.sum(-1), 1.0, rtol=1e-12)
    z_back = tr.unconstrain({"u": x})["u"]
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                               rtol=1e-8, atol=1e-10)

    lj = np.asarray(tr.log_jacobian({"u": z}))
    for c in range(n_chains):
        # the K-simplex coordinate x_{K-1} is determined by the others,
        # so the square map is z -> x_{0..K-2}; its slogdet is the
        # stick-breaking log-det the potential must fold in
        expected = _logdet_oracle(tr, z[c], "u", square_slice=K - 1)
        np.testing.assert_allclose(float(np.sum(lj[c])), expected,
                                   rtol=1e-9, atol=1e-9)


def test_real_support_is_identity_and_free():
    tr = SupportTransforms({"u": "real"})
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3)))
    np.testing.assert_array_equal(np.asarray(tr.constrain({"u": z})["u"]),
                                  np.asarray(z))
    assert tr.log_jacobian({"u": z}) is None


def test_boundary_draws_do_not_stick():
    """Draws at the exact support boundary (0 or 1) must map to finite
    unconstrained coordinates (an infinite z0 permanently sticks an
    HMC chain)."""
    tr = SupportTransforms({"p": "positive", "q": "unit_interval"})
    z = tr.unconstrain({"p": jnp.zeros((1, 2)),
                        "q": jnp.asarray([[0.0, 1.0]])})
    assert np.isfinite(np.asarray(z["p"])).all()
    assert np.isfinite(np.asarray(z["q"])).all()
