"""Logit-normal distribution.

Beyond the reference's 14-distribution set — the unit-interval member
of the transformed-normal family (LogNormal is the positive one); same
factor contract as
/root/reference/mxfusion/components/distributions/normal.py:26. Used by
``create_Gaussian_meanfield`` as the ADVI-style variational factor for
unit-interval latents: draws are reparameterized (sigmoid of an affine
of standard normal noise), so SVI gradients are pathwise.
"""
import jax
import jax.numpy as jnp

from .distribution import UnivariateDistribution


class LogitNormal(UnivariateDistribution):
    """``logit(x) ~ Normal(mean, variance)`` on ``x in (0, 1)``."""

    support = "unit_interval"

    def __init__(self, mean, variance, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("mean", mean), ("variance", variance)], outputs=None,
            input_names=["mean", "variance"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, mean, variance):
        x = random_variable
        z = jnp.log(x) - jnp.log1p(-x)
        return (-0.5 * jnp.log(2.0 * jnp.pi * variance)
                - jnp.log(x) - jnp.log1p(-x)
                - 0.5 * (z - mean) ** 2 / variance)

    def draw_samples_impl(self, rv_shape, num_samples, key, mean, variance):
        z = self._rand_gen.sample_normal(
            key, loc=mean, scale=jnp.sqrt(variance),
            shape=(num_samples,) + rv_shape, dtype=self.dtype)
        return jax.nn.sigmoid(z)

    @classmethod
    def define_variable(cls, mean=0., variance=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(mean=mean, variance=variance, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
