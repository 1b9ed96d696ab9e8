"""Kernels beyond the reference's set (TPU-native extras).

The reference ships RBF/Matern/Linear/Bias/White
(/root/reference/mxfusion/components/distributions/gp/kernels/); these
two are the next most-used stationary forms in GPy/GPflow-style
workflows and compose with the same Add/Multiply/active_dims machinery.
"""
import numpy as np
import jax.numpy as jnp

from .stationary import StationaryKernel

TWO_PI = float(2.0 * np.pi)


class RationalQuadratic(StationaryKernel):
    """K = variance * (1 + R2 / (2 alpha))^(-alpha) — a scale mixture of
    RBF kernels over lengthscales; ``alpha -> inf`` recovers RBF."""

    def __init__(self, input_dim, ARD=False, variance=1., lengthscale=1.,
                 alpha=2., name="ratquad", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, ARD=ARD, variance=variance,
                         lengthscale=lengthscale, name=name,
                         active_dims=active_dims, dtype=dtype)
        self.alpha = self._make_param(alpha, (1,))

    def _compute_K(self, X, X2=None, lengthscale=None, variance=None,
                   alpha=None):
        R2 = self._compute_R2(X, X2, lengthscale)
        a = jnp.expand_dims(alpha, axis=-1)
        v = jnp.expand_dims(variance, axis=-1)
        return v * jnp.power(1.0 + R2 / (2.0 * a), -a)

    def _compute_Kdiag(self, X, lengthscale=None, variance=None,
                       alpha=None):
        return jnp.broadcast_to(variance, X.shape[:-1])


class Periodic(StationaryKernel):
    """Exact periodic (MacKay) kernel for 1-D inputs per active dim:

        K = variance * exp(-2 sin^2(pi (x - x') / period) / l^2)

    summed over input dims (product form across dims when composed via
    MultiplyKernel with active_dims).
    """

    def __init__(self, input_dim, ARD=False, variance=1., lengthscale=1.,
                 period=1., name="periodic", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, ARD=ARD, variance=variance,
                         lengthscale=lengthscale, name=name,
                         active_dims=active_dims, dtype=dtype)
        self.period = self._make_param(
            period, (input_dim,) if ARD else (1,))

    def _compute_K(self, X, X2=None, lengthscale=None, variance=None,
                   period=None):
        X2v = X if X2 is None else X2
        # pairwise per-dimension differences (..., N, M, D)
        diff = jnp.expand_dims(X, axis=-2) - jnp.expand_dims(X2v, axis=-3)
        p = jnp.expand_dims(jnp.expand_dims(period, axis=-2), axis=-2)
        ls = jnp.expand_dims(jnp.expand_dims(lengthscale, axis=-2),
                             axis=-2)
        s = jnp.sin(np.pi * diff / p) / ls
        v = jnp.expand_dims(variance, axis=-1)
        return v * jnp.exp(-2.0 * jnp.sum(jnp.square(s), axis=-1))

    def _compute_Kdiag(self, X, lengthscale=None, variance=None,
                       period=None):
        return jnp.broadcast_to(variance, X.shape[:-1])


class Polynomial(StationaryKernel):
    """K = variance * (offset + x·x' / lengthscale²)^degree — the
    standard inhomogeneous polynomial kernel; ``degree`` is a static
    (non-trainable) integer."""

    def __init__(self, input_dim, degree=2, ARD=False, variance=1.,
                 lengthscale=1., offset=1., name="poly",
                 active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, ARD=ARD, variance=variance,
                         lengthscale=lengthscale, name=name,
                         active_dims=active_dims, dtype=dtype)
        self.degree = int(degree)
        self.offset = self._make_param(offset, (1,))

    def _dot(self, X, X2, lengthscale):
        ls = jnp.expand_dims(lengthscale, axis=-2)
        Xs = X / ls
        X2s = Xs if X2 is None else X2 / ls
        from .....ops.precision import einsum as p_einsum
        return p_einsum("...nd,...md->...nm", Xs, X2s)

    def _compute_K(self, X, X2=None, lengthscale=None, variance=None,
                   offset=None):
        d = self._dot(X, X2, lengthscale)
        v = jnp.expand_dims(variance, axis=-1)
        o = jnp.expand_dims(offset, axis=-1)
        return v * jnp.power(o + d, self.degree)

    def _compute_Kdiag(self, X, lengthscale=None, variance=None,
                       offset=None):
        ls = jnp.expand_dims(lengthscale, axis=-2)
        Xs = X / ls
        d = jnp.sum(Xs * Xs, axis=-1)
        return variance * jnp.power(offset + d, self.degree)
