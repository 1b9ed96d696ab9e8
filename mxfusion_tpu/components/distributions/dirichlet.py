"""Dirichlet distribution.

Reference: /root/reference/mxfusion/components/distributions/dirichlet.py:21-134.
``normalization=True`` renormalizes the random variable before
evaluating the density (as the reference does); sampling is built from
normalized Gamma draws.
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .distribution import Distribution
from ..variables.variable import Variable


class Dirichlet(Distribution):

    support = "simplex"

    def __init__(self, alpha, normalization=True, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("alpha", alpha)], outputs=None,
            input_names=["alpha"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)
        self.normalization = normalization

    def log_pdf_impl(self, random_variable, alpha):
        x = random_variable
        if self.normalization:
            x = x / jnp.sum(x, axis=-1, keepdims=True)
        log_norm = (jnp.sum(gammaln(alpha), axis=-1)
                    - gammaln(jnp.sum(alpha, axis=-1)))
        return jnp.sum((alpha - 1.0) * jnp.log(x), axis=-1) - log_norm

    def draw_samples_impl(self, rv_shape, num_samples, key, alpha):
        shape = (num_samples,) + rv_shape
        g = self._rand_gen.sample_gamma(
            key, alpha=jnp.broadcast_to(alpha, shape), beta=1.0, shape=shape,
            dtype=self.dtype)
        return g / jnp.sum(g, axis=-1, keepdims=True)

    def replicate_self(self, attribute_map=None):
        replica = super().replicate_self(attribute_map)
        replica.normalization = self.normalization
        return replica

    def _generate_outputs(self, shape):
        if shape is None:
            raise ValueError("Dirichlet requires an explicit shape.")
        self.set_outputs([Variable(shape=shape)])

    @classmethod
    def define_variable(cls, alpha, shape=None, normalization=True,
                        rand_gen=None, dtype=None):
        dist = cls(alpha=alpha, normalization=normalization,
                   rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
