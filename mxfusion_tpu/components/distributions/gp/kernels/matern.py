"""Matern kernels (orders 1/2, 3/2, 5/2).

Reference: /root/reference/mxfusion/components/distributions/gp/kernels/
matern.py:21-151.
"""
import jax.numpy as jnp
import numpy as np

from .stationary import StationaryKernel

SQRT3 = float(np.sqrt(3.0))
SQRT5 = float(np.sqrt(5.0))


class Matern(StationaryKernel):
    """Matern kernel with half-integer order ``order`` in {0, 1, 2} for
    ν = order + 1/2."""

    def __init__(self, input_dim, order, ARD=False, variance=1.,
                 lengthscale=1., name="matern", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, ARD=ARD, variance=variance,
                         lengthscale=lengthscale, name=name,
                         active_dims=active_dims, dtype=dtype)
        self.order = order

    def _compute_K(self, X, X2=None, lengthscale=None, variance=None):
        R2 = self._compute_R2(X, X2, lengthscale)
        # sqrt has infinite gradient at 0; clamp like GPy does
        R = jnp.sqrt(jnp.maximum(R2, 1e-36))
        v = jnp.expand_dims(variance, axis=-1)
        if self.order == 0:      # ν = 1/2 (exponential / OU)
            return v * jnp.exp(-R)
        if self.order == 1:      # ν = 3/2
            return v * (1.0 + SQRT3 * R) * jnp.exp(-SQRT3 * R)
        if self.order == 2:      # ν = 5/2
            return v * (1.0 + SQRT5 * R + (5.0 / 3.0) * R2) * \
                jnp.exp(-SQRT5 * R)
        raise NotImplementedError(
            "Matern order {} not supported.".format(self.order))


class Matern12(Matern):
    def __init__(self, input_dim, ARD=False, variance=1., lengthscale=1.,
                 name="matern12", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, order=0, ARD=ARD,
                         variance=variance, lengthscale=lengthscale,
                         name=name, active_dims=active_dims, dtype=dtype)


class Matern32(Matern):
    def __init__(self, input_dim, ARD=False, variance=1., lengthscale=1.,
                 name="matern32", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, order=1, ARD=ARD,
                         variance=variance, lengthscale=lengthscale,
                         name=name, active_dims=active_dims, dtype=dtype)


class Matern52(Matern):
    def __init__(self, input_dim, ARD=False, variance=1., lengthscale=1.,
                 name="matern52", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, order=2, ARD=ARD,
                         variance=variance, lengthscale=lengthscale,
                         name=name, active_dims=active_dims, dtype=dtype)
