"""Variable transformations (bijectors).

Unconstrained optimizer parameters are mapped into the model's
constrained space inside the jitted objective. Equivalent of the
reference's ``var_trans.py`` (/root/reference/mxfusion/components/
variables/var_trans.py:21-147) but with numerically-stable softplus and
its inverse (the reference left the overflow fix as a TODO at
var_trans.py:89-91).
"""
from abc import ABC, abstractmethod

import jax.numpy as jnp
import numpy as np


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _softplus_inverse(y):
    # log(exp(y) - 1) computed stably: y + log1p(-exp(-y))
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


class VariableTransformation(ABC):
    """Bijector from unconstrained (optimizer) to constrained (model) space."""

    @abstractmethod
    def transform(self, var):
        """Unconstrained -> constrained."""

    @abstractmethod
    def inverse_transform(self, out_var):
        """Constrained -> unconstrained."""


class Softplus(VariableTransformation):
    """``y = softplus(x) + offset``."""

    def __init__(self, offset=0.0):
        self.offset = offset

    def transform(self, var):
        return _softplus(var) + self.offset

    def inverse_transform(self, out_var):
        # runs host-side at initialization: use numpy for full precision
        if isinstance(out_var, (int, float)) or isinstance(out_var, np.ndarray):
            y = np.asarray(out_var, dtype=np.float64) - self.offset
            return y + np.log1p(-np.exp(-y))
        return _softplus_inverse(out_var - self.offset)


class PositiveTransformation(Softplus):
    """Positivity constraint: softplus with zero offset."""

    def __init__(self):
        super().__init__(offset=0.0)


class SimplexTransformation(VariableTransformation):
    """Maps R^K onto the interior of the K-simplex via softmax over the
    LAST axis (MAP point-mass locations for simplex-support latents).

    Softmax is a smooth surjection, not a bijection (shift-invariant
    along 1-vectors) — fine for optimization use; ``inverse_transform``
    is the right inverse ``log(x)`` (softmax(log x) = x for x on the
    simplex)."""

    def transform(self, var):
        e = jnp.exp(var - jnp.max(var, axis=-1, keepdims=True))
        return e / jnp.sum(e, axis=-1, keepdims=True)

    def inverse_transform(self, out_var):
        if isinstance(out_var, (int, float)) or \
                isinstance(out_var, np.ndarray):
            x = np.asarray(out_var, dtype=np.float64)
            return np.log(np.maximum(x, np.finfo(np.float64).tiny))
        return jnp.log(jnp.maximum(out_var,
                                   jnp.finfo(out_var.dtype).tiny))


class Logistic(VariableTransformation):
    """Maps the real line to ``(lower, upper)`` via a scaled sigmoid."""

    def __init__(self, lower, upper):
        self.lower = lower
        self.upper = upper

    def transform(self, var):
        return self.lower + (self.upper - self.lower) * jax_sigmoid(var)

    def inverse_transform(self, out_var):
        if isinstance(out_var, (int, float)) or isinstance(out_var, np.ndarray):
            p = (np.asarray(out_var, dtype=np.float64) - self.lower) / (
                self.upper - self.lower)
            return np.log(p) - np.log1p(-p)
        p = (out_var - self.lower) / (self.upper - self.lower)
        return jnp.log(p) - jnp.log1p(-p)


def jax_sigmoid(x):
    return 0.5 * (jnp.tanh(0.5 * jnp.asarray(x)) + 1.0)
