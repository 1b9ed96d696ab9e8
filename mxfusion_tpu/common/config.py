"""Global configuration.

The reference keeps three module-level globals: default dtype, execution
mode (ndarray vs symbol) and default device
(/root/reference/mxfusion/common/config.py:18-51).  On TPU the execution
mode is irrelevant (everything is trace-transparent ``jax.numpy`` under
``jax.jit``), and device placement is handled by ``jax.sharding``; what
remains is the dtype default plus a switch for forcing float64 in tests.
"""
import jax.numpy as jnp

_DEFAULT_DTYPE = "float32"


def get_default_dtype():
    """Return the default dtype string used for new variables/parameters."""
    return _DEFAULT_DTYPE


def set_default_dtype(dtype):
    """Set the global default dtype ('float32', 'bfloat16', 'float64').

    float64 additionally requires ``jax.config.update('jax_enable_x64', True)``
    which test conftests do for oracle comparisons.
    """
    global _DEFAULT_DTYPE
    _DEFAULT_DTYPE = dtype


def as_jnp_dtype(dtype=None):
    """Resolve a dtype string (or None for the default) to a jnp dtype."""
    d = dtype if dtype is not None else _DEFAULT_DTYPE
    return jnp.dtype(d)
