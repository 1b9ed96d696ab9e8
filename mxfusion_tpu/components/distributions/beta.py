"""Beta distribution.

Reference: /root/reference/mxfusion/components/distributions/beta.py:20-135.
Sampling composes two Gamma draws ``g/(g+h)`` through the rand_gen
facade (so the deterministic test double controls it), matching the
reference's construction (beta.py:70-113).
"""
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .distribution import UnivariateDistribution


class Beta(UnivariateDistribution):

    support = "unit_interval"

    def __init__(self, alpha, beta, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("alpha", alpha), ("beta", beta)], outputs=None,
            input_names=["alpha", "beta"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, alpha, beta):
        log_beta_fn = gammaln(alpha) + gammaln(beta) - gammaln(alpha + beta)
        return ((alpha - 1.0) * jnp.log(random_variable)
                + (beta - 1.0) * jnp.log1p(-random_variable) - log_beta_fn)

    def draw_samples_impl(self, rv_shape, num_samples, key, alpha, beta):
        k1, k2 = jax.random.split(key)
        shape = (num_samples,) + rv_shape
        g = self._rand_gen.sample_gamma(
            k1, alpha=jnp.broadcast_to(alpha, shape), beta=1.0, shape=shape,
            dtype=self.dtype)
        h = self._rand_gen.sample_gamma(
            k2, alpha=jnp.broadcast_to(beta, shape), beta=1.0, shape=shape,
            dtype=self.dtype)
        return g / (g + h)

    @classmethod
    def define_variable(cls, alpha=1., beta=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(alpha=alpha, beta=beta, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
