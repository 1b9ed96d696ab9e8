"""Writing a new distribution.

Counterpart of /root/reference/examples/notebooks/
writing_a_new_distribution.ipynb: implement a Gumbel distribution
(log-pdf + reparameterized sampling via inverse CDF) and use it in a
model end-to-end. (The notebook's original exercise — an Exponential —
now ships in the library: mxfusion_tpu.components.distributions.)
"""
import os
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions.distribution import \
    UnivariateDistribution
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import GradBasedInference, MAP

SMOKE = bool(os.environ.get("MXF_SMOKE"))
MAX_ITER = 30 if SMOKE else 400


class Gumbel(UnivariateDistribution):
    """Gumbel(location, scale):
    log p(x) = -z - exp(-z) - log(scale), z = (x - location)/scale."""

    def __init__(self, location, scale, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("location", location), ("scale", scale)], outputs=None,
            input_names=["location", "scale"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, location, scale):
        z = (random_variable - location) / scale
        return -z - jnp.exp(-z) - jnp.log(scale)

    def draw_samples_impl(self, rv_shape, num_samples, key, location, scale):
        u = self._rand_gen.sample_uniform(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        # inverse CDF, reparameterized: gradients flow to location/scale
        return location - scale * jnp.log(-jnp.log(u))

    @classmethod
    def define_variable(cls, location=0., scale=1., shape=None,
                        rand_gen=None, dtype=None):
        dist = cls(location=location, scale=scale, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable


def main():
    rng = np.random.default_rng(0)
    true_loc, true_scale = 1.5, 0.8
    y = rng.gumbel(true_loc, true_scale, (400, 1))

    m = Model()
    m.loc = Variable(initial_value=0.0)
    m.scale = Variable(transformation=PositiveTransformation(),
                       initial_value=1.0)
    from mxfusion_tpu.components.functions.operators import broadcast_to
    m.y = Gumbel.define_variable(
        location=broadcast_to(m.loc, (400, 1)),
        scale=broadcast_to(m.scale, (400, 1)), shape=(400, 1))

    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.y]))
    infr.run(max_iter=MAX_ITER, learning_rate=0.1, y=y)
    loc_hat = float(np.asarray(infr.params[m.loc]).ravel()[0])
    scale_hat = float(np.asarray(infr.params[m.scale]).ravel()[0])
    print("MLE location: {:.3f} (true {})".format(loc_hat, true_loc))
    print("MLE scale:    {:.3f} (true {})".format(scale_hat, true_scale))
    return loc_hat


if __name__ == "__main__":
    main()
