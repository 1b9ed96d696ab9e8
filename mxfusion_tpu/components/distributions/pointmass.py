"""PointMass distribution (used by MAP inference).

Reference: /root/reference/mxfusion/components/distributions/pointmass.py:20-75.
``log_pdf`` is identically zero; sampling returns the location.
"""
import jax.numpy as jnp

from .distribution import UnivariateDistribution


class PointMass(UnivariateDistribution):
    def __init__(self, location, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("location", location)], outputs=None,
            input_names=["location"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, location):
        return jnp.zeros_like(random_variable)

    def draw_samples_impl(self, rv_shape, num_samples, key, location):
        return jnp.broadcast_to(location, (num_samples,) + rv_shape)

    @classmethod
    def define_variable(cls, location, shape=None, rand_gen=None, dtype=None):
        dist = cls(location=location, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
