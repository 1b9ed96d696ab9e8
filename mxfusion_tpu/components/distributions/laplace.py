"""Laplace distribution.

Reference: /root/reference/mxfusion/components/distributions/laplace.py:6-99.
"""
import jax.numpy as jnp

from .distribution import UnivariateDistribution


class Laplace(UnivariateDistribution):
    def __init__(self, location, scale, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("location", location), ("scale", scale)], outputs=None,
            input_names=["location", "scale"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, location, scale):
        return (-jnp.log(2.0 * scale)
                - jnp.abs(random_variable - location) / scale)

    def draw_samples_impl(self, rv_shape, num_samples, key, location, scale):
        return self._rand_gen.sample_laplace(
            key, location=location, scale=scale,
            shape=(num_samples,) + rv_shape, dtype=self.dtype)

    @classmethod
    def define_variable(cls, location=0., scale=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(location=location, scale=scale, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
