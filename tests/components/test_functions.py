"""Functions layer tests: jax callables, operators, flax wrapping.

Mirrors the reference's Gluon interop tests
(/root/reference/testing/components/functions/
mxfusion_gluon_function_test.py:30-179) using flax.linen.
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions import Function, FlaxFunction
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)


def test_plain_function_factor():
    f = Function(lambda x, y: x * y + 1.0, input_names=["x", "y"],
                 output_names=["out"], broadcastable=True)
    m = Model()
    m.x = Variable(shape=(3,))
    m.y = Variable(shape=(3,))
    m.z = f(m.x, m.y)
    env = {m.x.uuid: jnp.asarray([[1., 2., 3.]]),
           m.y.uuid: jnp.asarray([[2., 2., 2.]])}
    samples = m.draw_samples(env, jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(samples[m.z.uuid]), [[3., 5., 7.]])


def test_non_broadcastable_function_vmaps_over_samples():
    calls = []

    def fn(x):
        return jnp.cumsum(x, axis=-1)

    f = Function(fn, input_names=["x"], output_names=["out"],
                 broadcastable=False)
    m = Model()
    m.x = Normal.define_variable(mean=0., variance=1., shape=(4,))
    m.z = f(m.x)
    env = {}
    for v in m.get_constants():
        env[v.uuid] = jnp.asarray(float(v.constant))[None]
    samples = m.draw_samples(env, jax.random.PRNGKey(0), num_samples=6)
    x = np.asarray(samples[m.x.uuid])
    z = np.asarray(samples[m.z.uuid])
    assert z.shape == (6, 4)
    assert np.allclose(z, np.cumsum(x, axis=-1), rtol=1e-6)


class TinyNet(nn.Module):
    hidden: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = jnp.tanh(x)
        return nn.Dense(1)(x)


def test_flax_function_lifts_parameters():
    net = FlaxFunction(TinyNet(), name="f", input_shapes=[(5, 2)],
                       rng_key=jax.random.PRNGKey(0))
    pnames = set(net.parameters.keys())
    assert any("Dense_0" in n for n in pnames)
    for v in net.parameters.values():
        assert v.isInherited
        assert v.initial_value is not None
    m = Model()
    m.x = Variable(shape=(5, 2))
    m.y = net(m.x)
    env = {m.x.uuid: jnp.zeros((1, 5, 2))}
    for name, v in net.parameters.items():
        env[v.uuid] = jnp.asarray(v.initial_value)[None]
    samples = m.draw_samples(env, jax.random.PRNGKey(0))
    out = np.asarray(samples[m.y.uuid])
    assert out.shape == (1, 5, 1)
    # matches a direct flax apply
    direct = net.module.apply(
        {"params": net.module.init(jax.random.PRNGKey(0),
                                   jnp.zeros((5, 2)))["params"]},
        jnp.zeros((5, 2)))
    assert np.allclose(out[0], np.asarray(direct))


def test_bnn_svi_smoke():
    """Bayesian NN: priors over lifted weights, trained by SVI."""
    rng = np.random.default_rng(0)
    N = 40
    X = rng.random((N, 2)) * 2 - 1
    Y = (X[:, :1] * 0.7 - X[:, 1:] * 0.3) + rng.standard_normal((N, 1)) * 0.05

    net = FlaxFunction(TinyNet(hidden=4), name="f", input_shapes=[(N, 2)],
                       rng_key=jax.random.PRNGKey(1))
    m = Model()
    m.x = Variable(shape=(N, 2))
    m.r = net(m.x)
    for name, v in m.r.factor.function.parameters.items():
        v.set_prior(Normal(mean=broadcast_to(Variable(value=0.), v.shape),
                           variance=broadcast_to(Variable(value=1.),
                                                 v.shape)))
    m.noise = Variable(transformation=PositiveTransformation(),
                       initial_value=0.01)
    m.y = Normal.define_variable(mean=m.r,
                                 variance=broadcast_to(m.noise, (N, 1)),
                                 shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.x, m.y])
    alg = StochasticVariationalInference(num_samples=5, model=m,
                                         posterior=q,
                                         observed=[m.x, m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=100, learning_rate=0.05, x=X, y=Y,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0]


# ----------------------------------------------------------------------
# FlaxFunction hardening: multi-output, weight sharing, collections
# (parity with the Gluon wrapper's feature set, reference
# mxfusion_gluon_function.py:113-148)
# ----------------------------------------------------------------------
class TwoHeadNet(nn.Module):
    hidden: int = 4

    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(h), nn.Dense(2)(h)


def test_flax_function_multi_output():
    net = FlaxFunction(TwoHeadNet(), name="g", input_shapes=[(5, 3)],
                       num_outputs=2, rng_key=jax.random.PRNGKey(1))
    m = Model()
    m.x = Variable(shape=(5, 3))
    m.a, m.b = net(m.x)
    env = {m.x.uuid: jnp.ones((1, 5, 3))}
    for _, v in net.parameters.items():
        env[v.uuid] = jnp.asarray(v.initial_value)[None]
    samples = m.draw_samples(env, jax.random.PRNGKey(0))
    assert np.asarray(samples[m.a.uuid]).shape == (1, 5, 1)
    assert np.asarray(samples[m.b.uuid]).shape == (1, 5, 2)
    # both heads match a direct flax apply
    variables = net.module.init(jax.random.PRNGKey(1), jnp.zeros((5, 3)))
    da, db = net.module.apply(variables, jnp.ones((5, 3)))
    assert np.allclose(np.asarray(samples[m.a.uuid])[0], np.asarray(da))
    assert np.allclose(np.asarray(samples[m.b.uuid])[0], np.asarray(db))


def test_flax_function_output_arity_mismatch_errors():
    from mxfusion_tpu.common.exceptions import ModelSpecificationError
    net = FlaxFunction(TwoHeadNet(), name="g", input_shapes=[(5, 3)],
                       num_outputs=1, rng_key=jax.random.PRNGKey(1))
    m = Model()
    m.x = Variable(shape=(5, 3))
    m.a = net(m.x)
    env = {m.x.uuid: jnp.ones((1, 5, 3))}
    for _, v in net.parameters.items():
        env[v.uuid] = jnp.asarray(v.initial_value)[None]
    with pytest.raises(ModelSpecificationError, match="num_outputs"):
        m.draw_samples(env, jax.random.PRNGKey(0))


def test_flax_function_weight_sharing_two_applications():
    """One FlaxFunction applied to two inputs ties the weights (the
    reference supports re-applying a Gluon function the same way)."""
    net = FlaxFunction(TinyNet(hidden=3), name="f", input_shapes=[(4, 2)],
                       rng_key=jax.random.PRNGKey(2))
    m = Model()
    m.x1 = Variable(shape=(4, 2))
    m.x2 = Variable(shape=(4, 2))
    m.y1 = net(m.x1)
    m.y2 = net(m.x2)
    # the two factors share the SAME parameter Variables (same UUIDs)
    p1 = {v.uuid for _, v in m.y1.factor.inputs
          if v.uuid in {pv.uuid for pv in net.parameters.values()}}
    p2 = {v.uuid for _, v in m.y2.factor.inputs
          if v.uuid in {pv.uuid for pv in net.parameters.values()}}
    assert p1 == p2 and len(p1) == len(net.parameters)
    # same input -> identical outputs through the tied weights
    x = jnp.asarray(np.random.default_rng(0).random((1, 4, 2)))
    env = {m.x1.uuid: x, m.x2.uuid: x}
    for _, v in net.parameters.items():
        env[v.uuid] = jnp.asarray(v.initial_value)[None]
    samples = m.draw_samples(env, jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(samples[m.y1.uuid]),
                       np.asarray(samples[m.y2.uuid]))


class BNNet(nn.Module):
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(3)(x)
        return nn.BatchNorm(use_running_average=not self.train)(x)


def test_flax_function_reads_non_params_collections():
    """batch_stats (inference mode) ride along read-only."""
    net = FlaxFunction(BNNet(train=False), name="bn",
                       input_shapes=[(6, 2)],
                       rng_key=jax.random.PRNGKey(3))
    assert "batch_stats" in net._extra_collections
    # batch_stats leaves are NOT lifted into graph Variables
    assert all("batch_stats" not in n for n in net.parameters)
    m = Model()
    m.x = Variable(shape=(6, 2))
    m.y = net(m.x)
    env = {m.x.uuid: jnp.ones((1, 6, 2))}
    for _, v in net.parameters.items():
        env[v.uuid] = jnp.asarray(v.initial_value)[None]
    samples = m.draw_samples(env, jax.random.PRNGKey(0))
    assert np.asarray(samples[m.y.uuid]).shape == (1, 6, 3)


def test_flax_function_mutating_collection_rejected():
    from mxfusion_tpu.common.exceptions import ModelSpecificationError
    with pytest.raises(ModelSpecificationError, match="mutate"):
        FlaxFunction(BNNet(train=True), name="bn",
                     input_shapes=[(6, 2)],
                     rng_key=jax.random.PRNGKey(3))
