"""Writing a new distribution.

Counterpart of /root/reference/examples/notebooks/
writing_a_new_distribution.ipynb: implement an Exponential distribution
(log-pdf + reparameterized sampling via inverse CDF) and use it in a
model end-to-end.
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


class Exponential(UnivariateDistribution):
    """Exponential(rate): log p(x) = log(rate) - rate*x for x >= 0."""

    def __init__(self, rate, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("rate", rate)], outputs=None,
            input_names=["rate"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, rate):
        return jnp.log(rate) - rate * random_variable

    def draw_samples_impl(self, rv_shape, num_samples, key, rate):
        u = self._rand_gen.sample_uniform(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        return -jnp.log1p(-u) / rate   # inverse CDF, reparameterized

    @classmethod
    def define_variable(cls, rate=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(rate=rate, rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable


def main():
    rng = np.random.default_rng(0)
    true_rate = 2.5
    y = rng.exponential(1.0 / true_rate, (200, 1))

    m = Model()
    m.rate = Variable(transformation=PositiveTransformation(),
                      initial_value=1.0)
    from mxfusion_tpu.components.functions.operators import broadcast_to
    m.y = Exponential.define_variable(
        rate=broadcast_to(m.rate, (200, 1)), shape=(200, 1))

    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.y]))
    infr.run(max_iter=MAX_ITER, learning_rate=0.1, y=y)
    rate_hat = float(np.asarray(infr.params[m.rate]).ravel()[0])
    print("MLE rate: {:.3f} (true {})".format(rate_hat, true_rate))
    return rate_hat


if __name__ == "__main__":
    main()
