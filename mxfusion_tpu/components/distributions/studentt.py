"""Student-t distribution (location/scale/degrees-of-freedom).

Beyond the reference's 14-distribution set — added for completeness
(heavy-tailed likelihoods, robust regression); follows the factor
contract of /root/reference/mxfusion/components/distributions/normal.py:26.
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .distribution import UnivariateDistribution


class StudentT(UnivariateDistribution):
    """Student-t with ``degrees_of_freedom`` nu, ``location`` and
    ``scale``: ``x = location + scale * t_nu``."""

    def __init__(self, degrees_of_freedom, location, scale, rand_gen=None,
                 dtype=None):
        super().__init__(
            inputs=[("degrees_of_freedom", degrees_of_freedom),
                    ("location", location), ("scale", scale)],
            outputs=None,
            input_names=["degrees_of_freedom", "location", "scale"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, degrees_of_freedom, location,
                     scale):
        nu = degrees_of_freedom
        z = (random_variable - location) / scale
        return (gammaln((nu + 1.0) / 2.0) - gammaln(nu / 2.0)
                - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(scale)
                - (nu + 1.0) / 2.0 * jnp.log1p(z * z / nu))

    def draw_samples_impl(self, rv_shape, num_samples, key,
                          degrees_of_freedom, location, scale):
        return self._rand_gen.sample_studentt(
            key, degrees_of_freedom=degrees_of_freedom, location=location,
            scale=scale, shape=(num_samples,) + rv_shape, dtype=self.dtype)

    @classmethod
    def define_variable(cls, degrees_of_freedom=3., location=0., scale=1.,
                        shape=None, rand_gen=None, dtype=None):
        dist = cls(degrees_of_freedom=degrees_of_freedom, location=location,
                   scale=scale, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
