"""Uniform distribution.

Reference: /root/reference/mxfusion/components/distributions/uniform.py:6-107.
"""
import jax.numpy as jnp

from .distribution import UnivariateDistribution


class Uniform(UnivariateDistribution):
    def __init__(self, low, high, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("low", low), ("high", high)], outputs=None,
            input_names=["low", "high"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, low, high):
        inside = jnp.logical_and(random_variable >= low,
                                 random_variable <= high)
        return jnp.where(inside, -jnp.log(high - low), -jnp.inf)

    def draw_samples_impl(self, rv_shape, num_samples, key, low, high):
        return self._rand_gen.sample_uniform(
            key, low=low, high=high, shape=(num_samples,) + rv_shape,
            dtype=self.dtype)

    @classmethod
    def define_variable(cls, low=0., high=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(low=low, high=high, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
