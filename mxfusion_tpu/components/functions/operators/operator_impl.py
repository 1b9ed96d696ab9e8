"""Operator library.

Reference: /root/reference/mxfusion/components/functions/operators/
operator_impl.py:28-169. Elementwise ops are broadcastable (the sample
axis rides along); reductions/matmuls operate on the per-data-point
axes, so axis arguments are shifted by one to account for the leading
sample axis, matching the reference's runtime convention.
"""
import jax.numpy as jnp

from .operators import operator_definition, Operator
from ...variables.variable import Variable
from ...variables.runtime_variable import align_sample_arrays
from ....util.inference import realize_shape


def _aligned(x, y):
    """Sample-aware elementwise alignment (see align_sample_arrays)."""
    x, y = align_sample_arrays([x, y])
    return x, y


def _shift_axis(axis):
    """Shift a user-facing axis by +1 for the leading sample axis."""
    if axis is None:
        return None
    if isinstance(axis, (tuple, list)):
        return tuple(a + 1 if a >= 0 else a for a in axis)
    return axis + 1 if axis >= 0 else axis


# --- basic arithmetic (elementwise, sample axis broadcasts) -------------

@operator_definition(name="add", args=["x", "y"], inputs=["x", "y"])
def add(x, y):
    x, y = _aligned(x, y)
    return x + y


@operator_definition(name="subtract", args=["x", "y"], inputs=["x", "y"])
def subtract(x, y):
    x, y = _aligned(x, y)
    return x - y


@operator_definition(name="multiply", args=["x", "y"], inputs=["x", "y"])
def multiply(x, y):
    x, y = _aligned(x, y)
    return x * y


@operator_definition(name="divide", args=["x", "y"], inputs=["x", "y"])
def divide(x, y):
    x, y = _aligned(x, y)
    return x / y


@operator_definition(name="power", args=["x", "y"], inputs=["x", "y"])
def power(x, y):
    x, y = _aligned(x, y)
    return x ** y


# --- elementwise --------------------------------------------------------

@operator_definition(name="square", args=["data"], inputs=["data"])
def square(data):
    return jnp.square(data)


@operator_definition(name="exp", args=["data"], inputs=["data"])
def exp(data):
    return jnp.exp(data)


@operator_definition(name="sigmoid", args=["data"], inputs=["data"])
def sigmoid(data):
    # beyond the reference op set: logistic link for classification
    # likelihoods (numerically stable via jax.nn)
    import jax.nn
    return jax.nn.sigmoid(data)


@operator_definition(name="tanh", args=["data"], inputs=["data"])
def tanh(data):
    return jnp.tanh(data)


@operator_definition(name="softplus", args=["data"], inputs=["data"])
def softplus(data):
    import jax.nn
    return jax.nn.softplus(data)


@operator_definition(name="probit", args=["data"], inputs=["data"])
def probit(data):
    """Standard-normal CDF (the probit link)."""
    from jax.scipy.special import ndtr
    return ndtr(data)


@operator_definition(name="log", args=["data"], inputs=["data"])
def log(data):
    return jnp.log(data)


# --- aggregation (axes exclude the sample axis) --------------------------

@operator_definition(name="sum", args=["data", "axis"], inputs=["data"])
def sum(data, axis=None):
    ax = _shift_axis(axis) if axis is not None else tuple(
        range(1, data.ndim))
    return jnp.sum(data, axis=ax)


@operator_definition(name="mean", args=["data", "axis"], inputs=["data"])
def mean(data, axis=None):
    ax = _shift_axis(axis) if axis is not None else tuple(
        range(1, data.ndim))
    return jnp.mean(data, axis=ax)


@operator_definition(name="prod", args=["data", "axis"], inputs=["data"])
def prod(data, axis=None):
    ax = _shift_axis(axis) if axis is not None else tuple(
        range(1, data.ndim))
    return jnp.prod(data, axis=ax)


# --- matrix ops (batched over the sample axis, MXU-friendly) -------------

@operator_definition(name="dot", args=["x", "y"], inputs=["x", "y"])
def dot(x, y):
    return jnp.matmul(x, y)


@operator_definition(name="diag", args=["data", "k"], inputs=["data"])
def diag(data, k=0):
    if data.ndim >= 3:
        return jnp.diagonal(data, offset=k, axis1=-2, axis2=-1)
    # vector (with sample axis) -> batched matrix with the vector on the
    # k-th diagonal (numpy.diag semantics; reference operator_impl.py:
    # 97-101 supports the offset)
    n = data.shape[-1]
    m = n + abs(k)
    out = jnp.zeros(data.shape[:-1] + (m, m), dtype=data.dtype)
    idx = jnp.arange(n)
    rows = idx + max(-k, 0)
    cols = idx + max(k, 0)
    return out.at[..., rows, cols].set(data)


# --- manipulations --------------------------------------------------------

@operator_definition(name="reshape", args=["data", "shape", "reverse"],
                     inputs=["data"])
def reshape(data, shape, reverse=False):
    return jnp.reshape(data, (data.shape[0],) + tuple(shape))


@operator_definition(name="transpose", args=["data", "axes"],
                     inputs=["data"])
def transpose(data, axes=None):
    if axes is None:
        axes = tuple(range(data.ndim - 1, 0, -1))
    else:
        axes = tuple(_shift_axis(a) for a in axes)
    return jnp.transpose(data, (0,) + tuple(axes))


# --- special: broadcast_to with symbolic target shape --------------------

def broadcast_to(data, shape):
    """Broadcast a variable to a (possibly symbolic) target shape.

    Reference: operator_impl.py:121-169. The target shape may contain
    Variables (symbolic dims); they are realized against the env's
    static shape constants at trace time.
    """
    class BroadcastToOperator(Operator):
        def __init__(self, data, shape):
            super().__init__(
                inputs=[("data", data)],
                outputs=[("output_0", Variable())],
                operator_name="broadcast_to",
                properties={"shape": shape},
                broadcastable=True)

        def eval(self, env):
            target_shape = realize_shape(self.properties["shape"], env)
            arr = jnp.asarray(env[self.inputs[0][1].uuid])
            if arr.ndim == 0:  # scalar constant: give it a sample axis
                arr = arr[None]
            source_shape = arr.shape
            n_target = len(target_shape)
            n_source = len(source_shape)
            if n_target + 1 - n_source > 0:
                t_shape = (source_shape[0],) + \
                    (1,) * (n_target + 1 - n_source) + tuple(source_shape[1:])
                arr = jnp.reshape(arr, t_shape)
            out = jnp.broadcast_to(arr, (source_shape[0],) + target_shape)
            return {self.output_names[0]: out}

    op = BroadcastToOperator(data=data, shape=shape)
    return op.outputs[0][1]
