"""Exponential distribution (rate parameterization).

Beyond the reference's 14-distribution set
(/root/reference/mxfusion/components/distributions/__init__.py) — added
for completeness of the univariate family; follows the same factor
contract as e.g. uniform.py:6-107 there.
"""
import jax.numpy as jnp

from .distribution import UnivariateDistribution


class Exponential(UnivariateDistribution):
    """Exponential with rate ``rate``: ``p(x) = rate * exp(-rate x)``."""

    support = "positive"

    def __init__(self, rate, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("rate", rate)], outputs=None,
            input_names=["rate"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, rate):
        return jnp.where(random_variable >= 0,
                         jnp.log(rate) - rate * random_variable,
                         -jnp.inf)

    def draw_samples_impl(self, rv_shape, num_samples, key, rate):
        return self._rand_gen.sample_exponential(
            key, rate=rate, shape=(num_samples,) + rv_shape,
            dtype=self.dtype)

    @classmethod
    def define_variable(cls, rate=1., shape=None, rand_gen=None, dtype=None):
        dist = cls(rate=rate, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
