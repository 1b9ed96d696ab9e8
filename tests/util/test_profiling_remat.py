"""Profiling hooks and remat executor tests."""
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu.util.profiling import trace, annotate, StepTimer
from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    MAP, GradBasedInference, create_executor)


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "prof")
    with trace(log_dir):
        with annotate("bench-step"):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
    assert glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                     recursive=True)


def test_step_timer():
    t = StepTimer()
    x = jnp.ones((8, 8))
    y = x @ x
    rate = t.rate(5, y)
    assert rate > 0


def test_remat_executor_matches_plain():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((30, 1))
    m = Model()
    m.mu = Variable(initial_value=0.0)
    m.y = Normal.define_variable(
        mean=broadcast_to(m.mu, (30, 1)),
        variance=broadcast_to(Variable(value=1.0), (30, 1)),
        shape=(30, 1))
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(y=y)
    tr = infr.params.trainable_params()
    fx = infr.params.fixed_params()
    key = jax.random.PRNGKey(0)
    plain = create_executor(alg, infr.params)
    rem = create_executor(alg, infr.params, remat=True)
    l1, _, _ = plain(tr, fx, [y], key)
    l2, _, _ = rem(tr, fx, [y], key)
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(lambda t: plain(t, fx, [y], key)[1])(tr)
    g2 = jax.grad(lambda t: rem(t, fx, [y], key)[1])(tr)
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                           rtol=1e-6)
