"""Gaussian AR(1) process distribution over a latent path.

Beyond the reference's distribution set — the workhorse prior for
non-Gaussian state-space models (stochastic volatility, dynamic
factors): the samplers handle the non-conjugate likelihood, and this
factor scores the whole latent path in one vectorized expression.

    x_0 ~ N(init_mean, init_var)
    x_t ~ N(phi * x_{t-1}, noise_var)        t = 1..T-1

The event's LAST axis is time. The density is fully elementwise
(no scan): one shifted-difference evaluation, so HMC gradients over
the T-dimensional path are a single fused kernel. Sampling uses a
``lax.scan`` (the recursion is inherently serial).
"""
import jax
import jax.numpy as jnp

from .distribution import UnivariateDistribution

_LOG2PI = 1.8378770664093453


class GaussianAR1(UnivariateDistribution):
    """``x_t = phi x_{t-1} + sqrt(noise_var) eps_t`` with a Gaussian
    initial state. Parameters broadcast elementwise against the
    leading (non-time) event axes."""

    def __init__(self, phi, noise_var, init_mean=0.0, init_var=1.0,
                 rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("phi", phi), ("noise_var", noise_var),
                    ("init_mean", init_mean), ("init_var", init_var)],
            outputs=None,
            input_names=["phi", "noise_var", "init_mean", "init_var"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    @staticmethod
    def _check_time_constant(**params):
        # a (T,)-shaped parameter would silently broadcast lp0 across
        # the time axis (T spurious initial-state terms) and the
        # sampler would silently use only its t=0 value — reject at
        # trace time instead
        for name, p in params.items():
            if p.shape[-1] != 1:
                raise ValueError(
                    "GaussianAR1 parameters are time-constant; '{}' "
                    "has trailing (time-aligned) dim {} != 1. Reshape "
                    "it to broadcast over leading axes only.".format(
                        name, p.shape[-1]))

    def log_pdf_impl(self, random_variable, phi, noise_var, init_mean,
                     init_var):
        self._check_time_constant(phi=phi, noise_var=noise_var,
                                  init_mean=init_mean,
                                  init_var=init_var)
        x = random_variable                        # (..., T)
        x0 = x[..., :1]
        lp0 = -0.5 * (_LOG2PI + jnp.log(init_var)
                      + jnp.square(x0 - init_mean) / init_var)
        resid = x[..., 1:] - phi * x[..., :-1]
        lpt = -0.5 * (_LOG2PI + jnp.log(noise_var)
                      + jnp.square(resid) / noise_var)
        return jnp.concatenate([lp0, lpt], axis=-1)

    def draw_samples_impl(self, rv_shape, num_samples, key, phi,
                          noise_var, init_mean, init_var):
        self._check_time_constant(phi=phi, noise_var=noise_var,
                                  init_mean=init_mean,
                                  init_var=init_var)
        shape = (num_samples,) + rv_shape          # (..., T)
        eps = self._rand_gen.sample_normal(key, shape=shape,
                                           dtype=self.dtype)
        # parameters are time-constant: collapse the (broadcast) time
        # axis to per-path scalars for the recursion
        phi0 = jnp.broadcast_to(phi, shape)[..., 0]
        sd0 = jnp.sqrt(jnp.broadcast_to(noise_var, shape)[..., 0])
        m0 = jnp.broadcast_to(init_mean, shape)[..., 0]
        v0 = jnp.broadcast_to(init_var, shape)[..., 0]
        x0 = m0 + jnp.sqrt(v0) * eps[..., 0]

        def step(x, e):
            xn = phi0 * x + sd0 * e
            return xn, xn

        # scan over the time axis (moved to the front)
        eps_t = jnp.moveaxis(eps[..., 1:], -1, 0)
        _, xs = jax.lax.scan(step, x0, eps_t)
        return jnp.moveaxis(jnp.concatenate([x0[None], xs], axis=0),
                            0, -1)
