"""Poisson distribution.

Beyond the reference's 14-distribution set — added for completeness
(count likelihoods); follows the factor contract of
/root/reference/mxfusion/components/distributions/gamma.py:20-196.
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .distribution import UnivariateDistribution


class Poisson(UnivariateDistribution):
    """Poisson with rate ``rate``; the random variable holds counts
    (stored in the distribution dtype so it composes with float
    pipelines)."""

    def __init__(self, rate, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("rate", rate)], outputs=None,
            input_names=["rate"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, rate):
        return (random_variable * jnp.log(rate) - rate
                - gammaln(random_variable + 1.0))

    def draw_samples_impl(self, rv_shape, num_samples, key, rate):
        return self._rand_gen.sample_poisson(
            key, rate=rate, shape=(num_samples,) + rv_shape,
            dtype=self.dtype)

    @classmethod
    def define_variable(cls, rate=1., shape=None, rand_gen=None, dtype=None):
        dist = cls(rate=rate, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
