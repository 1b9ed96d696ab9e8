"""set_parameter writeback and default-dtype switching.

Mirrors /root/reference/testing/inference/inference_alg_test.py:32-95.
"""
import numpy as np
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.common import config
from mxfusion_tpu.inference import (
    Inference, InferenceAlgorithm, GradBasedInference, MAP)


def test_set_parameter_writeback():
    class SetValue(InferenceAlgorithm):
        def __init__(self, x, y, model, observed):
            self.x_val = x
            self.y_val = y
            super().__init__(model=model, observed=observed)

        def compute(self, env, ctx):
            self.set_parameter(ctx, self.model.x, self.x_val)
            self.set_parameter(ctx, self.model.y, self.y_val)
            return jnp.zeros(()), jnp.zeros(())

    m = Model()
    m.x = Variable(shape=(2,))
    m.y = Variable(shape=(3, 4))
    rng = np.random.default_rng(0)
    x_np = rng.random(2)
    y_np = rng.random((3, 4))
    infr = Inference(SetValue(jnp.asarray(x_np), jnp.asarray(y_np), m, []),
                     dtype="float64")
    infr.run()
    assert np.allclose(np.asarray(infr.params[m.x]), x_np)
    assert np.allclose(np.asarray(infr.params[m.y]), y_np)


def test_change_default_dtype():
    config.set_default_dtype("float64")
    try:
        rng = np.random.default_rng(0)
        data = rng.standard_normal((100, 1)) * np.sqrt(5.0) + 3.0
        m = Model()
        m.mu = Variable()
        m.s = Variable(transformation=PositiveTransformation(),
                       initial_value=1.0)
        m.Y = Normal.define_variable(
            mean=broadcast_to(m.mu, (100, 1)),
            variance=broadcast_to(m.s, (100, 1)), shape=(100, 1))
        infr = GradBasedInference(
            inference_algorithm=MAP(model=m, observed=[m.Y]),
            dtype="float64")
        infr.run(Y=data, learning_rate=0.1, max_iter=5)
        assert np.asarray(infr.params[m.mu]).dtype == np.float64
    finally:
        config.set_default_dtype("float32")
