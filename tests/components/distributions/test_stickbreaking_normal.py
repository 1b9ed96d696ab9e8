"""StickBreakingNormal (simplex mean-field family) oracle tests."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu import Variable
from mxfusion_tpu.components.distributions import (StickBreakingNormal,
                                                   LogitNormal)
from mxfusion_tpu.ops import simplex as simplex_ops


def test_stick_breaking_bijector_roundtrip_and_uniform_center():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((7, 4))
    x = np.asarray(simplex_ops.forward(jnp.asarray(z)))
    assert np.allclose(x.sum(-1), 1.0)
    assert np.all(x > 0)
    z_back = np.asarray(simplex_ops.inverse(jnp.asarray(x)))
    assert np.allclose(z_back, z, rtol=1e-8, atol=1e-10)
    # z = 0 maps to the uniform simplex (the offset convention)
    x0 = np.asarray(simplex_ops.forward(jnp.zeros((1, 4))))
    assert np.allclose(x0, 0.2)


def test_stick_breaking_log_jacobian_vs_autodiff():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((5,)))
    # |dx/dz| of the K-1 independent coordinates (x_K is determined)
    J = jax.jacfwd(lambda zz: simplex_ops.forward(zz)[:-1])(z)
    _, expected = np.linalg.slogdet(np.asarray(J))
    got = float(simplex_ops.log_det_jacobian(z))
    assert np.isclose(got, expected, rtol=1e-10)


def test_k2_reduces_to_logitnormal():
    """For K=2 the stick-breaking normal IS the logit-normal on the
    first coordinate (offset log(1) = 0)."""
    mean, var = 0.3, 0.8
    p = np.linspace(0.05, 0.95, 9)
    x = np.stack([p, 1 - p], axis=-1)[None]          # (1, 9, 2)

    m_v, v_v = Variable(), Variable()
    sb = StickBreakingNormal(mean=m_v, variance=v_v, dtype="float64")
    sb._generate_outputs(shape=(9, 2))
    env = {m_v.uuid: jnp.full((1, 9, 1), mean),
           v_v.uuid: jnp.full((1, 9, 1), var),
           sb.random_variable.uuid: jnp.asarray(x)}
    got = np.asarray(sb.log_pdf(env))

    m2, v2 = Variable(), Variable()
    ln = LogitNormal(mean=m2, variance=v2, dtype="float64")
    ln._generate_outputs(shape=(9, 1))
    env2 = {m2.uuid: jnp.full((1, 9, 1), mean),
            v2.uuid: jnp.full((1, 9, 1), var),
            ln.random_variable.uuid: jnp.asarray(p[None, :, None])}
    expected = np.asarray(ln.log_pdf(env2))
    assert np.allclose(got.ravel(), expected.ravel(), rtol=1e-9)


def test_samples_live_on_simplex_and_match_density_moments():
    K = 3
    mean = np.array([0.4, -0.2])
    var = np.array([0.3, 0.5])
    m_v, v_v = Variable(), Variable()
    sb = StickBreakingNormal(mean=m_v, variance=v_v, dtype="float64")
    sb._generate_outputs(shape=(K,))
    env = {m_v.uuid: jnp.asarray(mean)[None],
           v_v.uuid: jnp.asarray(var)[None]}
    s = np.asarray(sb.draw_samples(env, jax.random.PRNGKey(0),
                                   num_samples=200_000))
    assert s.shape == (200_000, K)
    assert np.allclose(s.sum(-1), 1.0)
    assert np.all(s > 0)
    # Monte-Carlo moments against the pushforward of the base normal
    z = (mean + np.sqrt(var)
         * stats.norm.rvs(size=(200_000, K - 1),
                          random_state=np.random.RandomState(1)))
    x_ref = np.asarray(simplex_ops.forward(jnp.asarray(z)))
    assert np.allclose(s.mean(0), x_ref.mean(0), atol=5e-3)
    assert np.allclose(s.std(0), x_ref.std(0), atol=5e-3)
