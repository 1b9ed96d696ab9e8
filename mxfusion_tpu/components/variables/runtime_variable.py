"""Runtime sample-dimension conventions.

Every runtime array carries a leading *sample axis*: size 1 means "not
sampled" (deterministic / shared across samples), size > 1 means
per-sample values. These helpers mirror the reference's
``runtime_variable.py`` (/root/reference/mxfusion/components/variables/
runtime_variable.py:20-118) as pure jnp functions that trace cleanly
under ``jax.jit`` (all shape logic is static Python).
"""
import jax.numpy as jnp


def add_sample_dimension(array):
    """Prepend a size-1 sample axis."""
    return jnp.expand_dims(array, axis=0)


def add_sample_dimension_to_arrays(arrays, out=None):
    """Apply :func:`add_sample_dimension` to every array in a dict.

    Non-array values (python ints used as static shape constants) pass
    through unchanged. If ``out`` is given, write into it.
    """
    target = out if out is not None else {}
    for k, v in arrays.items():
        if hasattr(v, "ndim"):
            target[k] = add_sample_dimension(jnp.asarray(v))
        else:
            target[k] = v
    return target


def array_has_samples(array):
    """True when the leading sample axis has size > 1 (static check)."""
    return array.shape[0] > 1


def get_num_samples(array):
    return array.shape[0]


def as_samples(array, num_samples):
    """Broadcast the sample axis to ``num_samples``."""
    if array.shape[0] == num_samples:
        return array
    return jnp.broadcast_to(array, (num_samples,) + tuple(array.shape[1:]))


def expectation(array):
    """Mean over the sample axis."""
    return jnp.mean(array, axis=0)


def align_sample_arrays(arrays):
    """Right-align event dims across arrays that share the sample axis.

    Axis 0 is the sample axis; the remaining (event) dims broadcast
    right-aligned, so an (s, 1) scalar aligns against (s, N, 1) values
    as (s, 1, 1). Non-arrays pass through.
    """
    rank = 0
    for a in arrays:
        if hasattr(a, "ndim"):
            rank = max(rank, a.ndim)
    out = []
    for a in arrays:
        if hasattr(a, "ndim") and 1 <= a.ndim < rank:
            a = jnp.reshape(a, (a.shape[0],) + (1,) * (rank - a.ndim)
                            + tuple(a.shape[1:]))
        out.append(a)
    return out


def arrays_as_samples(arrays):
    """Broadcast a list of arrays (or dicts of arrays) to a common sample count.

    Reference: runtime_variable.py:102-118.
    """
    num = 1
    for a in arrays:
        if isinstance(a, dict):
            for v in a.values():
                if hasattr(v, "shape") and v.ndim > 0:
                    num = max(num, v.shape[0])
        elif hasattr(a, "shape") and a.ndim > 0:
            num = max(num, a.shape[0])
    out = []
    for a in arrays:
        if isinstance(a, dict):
            out.append({k: (as_samples(v, num)
                            if hasattr(v, "shape") and v.ndim > 0 else v)
                        for k, v in a.items()})
        elif hasattr(a, "shape") and a.ndim > 0:
            out.append(as_samples(a, num))
        else:
            out.append(a)
    return out
