"""Gamma distributions (shape/rate and mean/variance parameterizations).

Reference: /root/reference/mxfusion/components/distributions/gamma.py:20-196.
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .distribution import UnivariateDistribution


class Gamma(UnivariateDistribution):
    """Gamma with shape ``alpha`` and rate ``beta``."""

    support = "positive"

    def __init__(self, alpha, beta, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("alpha", alpha), ("beta", beta)], outputs=None,
            input_names=["alpha", "beta"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, alpha, beta):
        return (alpha * jnp.log(beta) + (alpha - 1.0) * jnp.log(random_variable)
                - beta * random_variable - gammaln(alpha))

    def draw_samples_impl(self, rv_shape, num_samples, key, alpha, beta):
        return self._rand_gen.sample_gamma(
            key, alpha=jnp.broadcast_to(alpha, (num_samples,) + rv_shape),
            beta=beta, shape=(num_samples,) + rv_shape, dtype=self.dtype)

    @classmethod
    def define_variable(cls, alpha=1., beta=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(alpha=alpha, beta=beta, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable


class GammaMeanVariance(UnivariateDistribution):
    """Gamma parameterized by mean and variance.

    Converts internally to shape/rate: ``alpha = mean²/var``,
    ``beta = mean/var`` (reference gamma.py:140-177).
    """

    support = "positive"

    def __init__(self, mean, variance, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("mean", mean), ("variance", variance)], outputs=None,
            input_names=["mean", "variance"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    @staticmethod
    def _to_alpha_beta(mean, variance):
        beta = mean / variance
        alpha = mean * beta
        return alpha, beta

    def log_pdf_impl(self, random_variable, mean, variance):
        alpha, beta = self._to_alpha_beta(mean, variance)
        return (alpha * jnp.log(beta) + (alpha - 1.0) * jnp.log(random_variable)
                - beta * random_variable - gammaln(alpha))

    def draw_samples_impl(self, rv_shape, num_samples, key, mean, variance):
        alpha, beta = self._to_alpha_beta(mean, variance)
        return self._rand_gen.sample_gamma(
            key, alpha=jnp.broadcast_to(alpha, (num_samples,) + rv_shape),
            beta=beta, shape=(num_samples,) + rv_shape, dtype=self.dtype)

    @classmethod
    def define_variable(cls, mean=1., variance=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(mean=mean, variance=variance, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
