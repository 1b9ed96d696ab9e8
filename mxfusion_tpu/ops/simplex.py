"""Stick-breaking bijector between R^(K-1) and the K-simplex interior.

Shared by the MCMC support transforms (inference/hmc.py), the
mean-field ``StickBreakingNormal`` factor, and MAP's simplex point
mass. Convention (NumPyro-style): ``z = 0`` maps to the uniform
simplex via the offset ``v_k = sigmoid(z_k - log(K-1-k))``; the
simplex occupies the LAST event axis. The reference framework has no
simplex-support machinery at all (its Dirichlet tests only touch
log_pdf, /root/reference/testing/components/distributions/
dirichlet_test.py).
"""
import jax
import jax.numpy as jnp


def _offsets(k1, dtype):
    return jnp.log(jnp.arange(k1, 0, -1).astype(dtype))


def _logv(z):
    """(log v, log(1-v)) of the offset sigmoids, stable via softplus."""
    t = z - _offsets(z.shape[-1], z.dtype)
    return -jax.nn.softplus(-t), -jax.nn.softplus(t)


def forward(z):
    """R^(..., K-1) -> interior of the (..., K) simplex."""
    logv, log1mv = _logv(z)
    log_rem_excl = jnp.concatenate(
        [jnp.zeros_like(log1mv[..., :1]),
         jnp.cumsum(log1mv[..., :-1], axis=-1)], axis=-1)
    x_head = jnp.exp(logv + log_rem_excl)
    x_last = jnp.exp(jnp.sum(log1mv, axis=-1, keepdims=True))
    return jnp.concatenate([x_head, x_last], axis=-1)


def inverse(x):
    """Simplex (..., K) -> R^(..., K-1); clips by eps at the boundary
    (an exactly-0 coordinate would map to an infinite z)."""
    eps = jnp.finfo(x.dtype).eps
    K = x.shape[-1]
    csum = jnp.cumsum(x[..., :-1], axis=-1)
    rem = jnp.concatenate(
        [jnp.ones_like(x[..., :1]), 1.0 - csum[..., :-1]], axis=-1)
    v = jnp.clip(x[..., :-1] / jnp.maximum(rem, eps), eps, 1.0 - eps)
    return jnp.log(v) - jnp.log1p(-v) + _offsets(K - 1, x.dtype)


def log_det_jacobian(z):
    """log |dx/dz| of :func:`forward`, summed over the event axis:
    returns shape ``z.shape[:-1]``. Per coordinate,
    dx_k/dv_k = rem_k and dv_k/dz_k = v(1-v)."""
    logv, log1mv = _logv(z)
    log_rem_excl = jnp.concatenate(
        [jnp.zeros_like(log1mv[..., :1]),
         jnp.cumsum(log1mv[..., :-1], axis=-1)], axis=-1)
    return jnp.sum(logv + log1mv + log_rem_excl, axis=-1)
