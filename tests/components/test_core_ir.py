"""Core IR unit tests: ModelComponent modes, Factor wiring, Variable
types, transformations, runtime sample-axis helpers, operators.

Mirrors /root/reference/testing/components/{model_component_test,
factor_test}.py and variables/* tests.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components import Factor, ModelComponent
from mxfusion_tpu.components.variables import (
    VariableType, Softplus, PositiveTransformation, Logistic,
    add_sample_dimension, array_has_samples, as_samples, expectation,
    arrays_as_samples)
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import (
    sum as op_sum, mean as op_mean, prod as op_prod, reshape, transpose,
    diag, square, exp as op_exp, log as op_log)
from mxfusion_tpu.common.exceptions import ModelSpecificationError


# ---------------------------------------------------------------- IR modes
def test_bidirectional_then_graph_mode():
    a = Variable()
    f = Normal(mean=0., variance=1.)
    f.set_outputs([a])
    # bi-directional mode: links kept locally
    assert a.graph is None
    assert a.factor is f
    m = Model()
    m.a = a
    # graph mode: adjacency now delegated to the graph
    assert a.graph is m.components_graph
    assert f.graph is m.components_graph
    assert a.factor is f


def test_component_cannot_move_between_graphs():
    m1, m2 = Model(), Model()
    v = Variable()
    m1.v = v
    with pytest.raises(ModelSpecificationError):
        m2.v = v


def test_uuid_identity_across_replicas():
    v = Variable()
    r = v.replicate_self()
    assert r == v
    assert hash(r) == hash(v)
    assert r is not v


def test_factor_named_access_and_rewire():
    f = Normal(mean=1.5, variance=2.5)
    out = Variable()
    f.set_outputs([out])
    assert f.random_variable is out
    assert np.asarray(dict(f.inputs)["mean"].constant).item() == 1.5
    new_mean = Variable()
    f.set_single_input("mean", new_mean)
    assert dict(f.inputs)["mean"] is new_mean
    # named attribute access
    assert f.mean is new_mean
    assert f.variance is dict(f.inputs)["variance"]


def test_variable_types():
    m = Model()
    m.c = Variable(value=3.0)
    m.p = Variable(shape=(2,))
    m.r = Normal.define_variable(mean=0., variance=1., shape=(1,))
    m.f = m.p + 1.0
    assert m.c.type == VariableType.CONSTANT
    assert m.p.type == VariableType.PARAMETER
    assert m.r.type == VariableType.RANDVAR
    assert m.f.type == VariableType.FUNCVAR


# ------------------------------------------------------------ transformations
@pytest.mark.parametrize("trans,values", [
    (Softplus(offset=0.5), [0.6, 1.0, 5.0]),
    (PositiveTransformation(), [1e-4, 0.5, 10.0]),
    (Logistic(-2.0, 3.0), [-1.9, 0.0, 2.9]),
])
def test_transformation_roundtrip(trans, values):
    for v in values:
        u = trans.inverse_transform(np.asarray(v))
        back = np.asarray(trans.transform(jnp.asarray(u)))
        assert np.allclose(back, v, rtol=1e-6, atol=1e-8)


def test_softplus_inverse_stable_for_large_values():
    # the reference left this overflow as a TODO (var_trans.py:89-91)
    t = PositiveTransformation()
    u = t.inverse_transform(np.asarray(1000.0))
    assert np.isfinite(u)
    assert np.allclose(np.asarray(t.transform(jnp.asarray(u))), 1000.0)


# ----------------------------------------------------------- runtime helpers
def test_sample_axis_helpers():
    x = jnp.ones((3, 2))
    xs = add_sample_dimension(x)
    assert xs.shape == (1, 3, 2)
    assert not array_has_samples(xs)
    b = as_samples(xs, 5)
    assert b.shape == (5, 3, 2)
    assert array_has_samples(b)
    assert expectation(b).shape == (3, 2)
    a, c = arrays_as_samples([xs, jnp.zeros((5, 3, 2))])
    assert a.shape == (5, 3, 2)
    d = arrays_as_samples([{"k": xs}])[0]
    assert d["k"].shape == (1, 3, 2)


# ----------------------------------------------------------------- operators
def _eval_single(var, env):
    m = Model()
    m.out = var
    for v in m.get_constants():
        arr = jnp.asarray(np.asarray(v.constant, dtype=np.float64))
        if arr.ndim == 0:
            arr = arr.reshape(1)
        env[v.uuid] = arr[None]
    samples = m.draw_samples(env, jax.random.PRNGKey(0))
    return np.asarray(samples[var.uuid])


def _eval_op(build, data):
    """Build op from a fresh input Variable each time and evaluate it."""
    x = Variable(shape=tuple(np.shape(data)))
    env = {x.uuid: jnp.asarray(data)[None]}
    return _eval_single(build(x), env)


def test_reduction_operators():
    data = np.arange(6, dtype=np.float64).reshape(2, 3)
    assert np.allclose(_eval_op(op_sum, data), data.sum())
    assert np.allclose(_eval_op(lambda x: op_mean(x, axis=0), data),
                       data.mean(axis=0))
    assert np.allclose(_eval_op(lambda x: op_prod(x, axis=1), data),
                       data.prod(axis=1))


def test_shape_operators():
    data = np.arange(6, dtype=np.float64).reshape(2, 3)
    assert _eval_op(lambda x: reshape(x, shape=(3, 2)), data).shape \
        == (1, 3, 2)
    assert np.allclose(_eval_op(transpose, data)[0], data.T)


def test_diag_operators():
    D = _eval_op(diag, np.asarray([1.0, 2.0, 3.0]))
    assert np.allclose(D[0], np.diag([1.0, 2.0, 3.0]))
    d = _eval_op(diag, np.arange(9.0).reshape(3, 3))
    assert np.allclose(d[0], [0.0, 4.0, 8.0])


def test_diag_operators_with_offset():
    # embed with offset (numpy.diag semantics, reference
    # operator_impl.py:97-101)
    v = np.asarray([1.0, 2.0, 3.0])
    for k in (1, 2, -1):
        D = _eval_op(lambda x: diag(x, k=k), v)
        assert np.allclose(D[0], np.diag(v, k=k)), k
    # extract with offset from a matrix
    A = np.arange(16.0).reshape(4, 4)
    for k in (1, -2):
        d = _eval_op(lambda x: diag(x, k=k), A)
        assert np.allclose(d[0], np.diag(A, k=k)), k


def test_elementwise_operators():
    data = np.asarray([1.0, 2.0, 3.0])
    assert np.allclose(_eval_op(square, data)[0], [1, 4, 9])
    assert np.allclose(_eval_op(op_exp, data)[0], np.exp(data))
    assert np.allclose(_eval_op(op_log, data)[0], np.log(data))


def test_operator_chain_with_scalars_and_samples():
    # regression test for the (1,) scalar-constant ambiguity: sampled
    # values combined with scalar constants must keep event shapes
    m = Model()
    m.x = Normal.define_variable(mean=0., variance=1., shape=(4, 1))
    m.z = (m.x - 3.0) ** 2.0
    env = {}
    for v in m.get_constants():
        arr = jnp.asarray(float(v.constant)).reshape(1)
        env[v.uuid] = arr[None]
    samples = m.draw_samples(env, jax.random.PRNGKey(0), num_samples=7)
    assert samples[m.z.uuid].shape == (7, 4, 1)
