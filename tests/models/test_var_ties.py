"""Variable tie (runtime aliasing) tests."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import MAP, GradBasedInference


def test_tied_variables_share_value():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((60, 1)) + 2.0
    m = Model()
    m.mu_a = Variable(initial_value=0.0)
    m.mu_b = Variable(initial_value=5.0)  # tied: value ignored
    m.y = Normal.define_variable(mean=broadcast_to(m.mu_a, (30, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.0), (30, 1)),
                                 shape=(30, 1))
    m.y2 = Normal.define_variable(mean=broadcast_to(m.mu_b, (30, 1)),
                                  variance=broadcast_to(
                                      Variable(value=1.0), (30, 1)),
                                  shape=(30, 1))
    m.tie_variables(m.mu_b, m.mu_a)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.y, m.y2]))
    infr.run(max_iter=300, learning_rate=0.1, y=y[:30], y2=y[30:])
    # the single underlying parameter fits the pooled mean
    mu_a = float(np.asarray(infr.params[m.mu_a]).ravel()[0])
    assert abs(mu_a - y.mean()) < 0.15
