"""Bernoulli distribution.

Reference: /root/reference/mxfusion/components/distributions/bernoulli.py:20-119.
"""
import jax.numpy as jnp

from .distribution import UnivariateDistribution


class Bernoulli(UnivariateDistribution):
    """Bernoulli with success probability ``prob_true``."""

    def __init__(self, prob_true, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("prob_true", prob_true)], outputs=None,
            input_names=["prob_true"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, prob_true):
        x = random_variable.astype(prob_true.dtype)
        return x * jnp.log(prob_true) + (1.0 - x) * jnp.log1p(-prob_true)

    def draw_samples_impl(self, rv_shape, num_samples, key, prob_true):
        b = self._rand_gen.sample_bernoulli(
            key, prob_true=jnp.broadcast_to(prob_true,
                                            (num_samples,) + rv_shape),
            shape=(num_samples,) + rv_shape)
        return b.astype(self.dtype)

    @classmethod
    def define_variable(cls, prob_true=0.5, shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(prob_true=prob_true, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
