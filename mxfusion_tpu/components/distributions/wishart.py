"""Wishart distribution.

Reference: /root/reference/mxfusion/components/distributions/wishart.py:24-182.
The reference's Bartlett-decomposition sampler uses nested Python loops
(wishart.py:121-147, flagged slow); here the Bartlett factor is built
fully batched: a strictly-lower-triangular standard-normal matrix plus a
diagonal of per-index chi draws — one masked normal draw, one gamma
draw, no loops.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .distribution import Distribution
from ..variables.variable import Variable
from ...util.special import log_determinant, log_multivariate_gamma, \
    solve_posdef

LOG2 = float(np.log(2.0))


class Wishart(Distribution):
    """Wishart over PSD matrices: ``degrees_of_freedom`` and ``scale``."""

    def __init__(self, degrees_of_freedom, scale, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("degrees_of_freedom", degrees_of_freedom),
                    ("scale", scale)],
            outputs=None,
            input_names=["degrees_of_freedom", "scale"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, degrees_of_freedom, scale):
        X = random_variable
        D = X.shape[-1]
        n = degrees_of_freedom.astype(X.dtype)
        # squeeze a trailing (1,) event dim on dof if declared as (1,)
        while n.ndim > X.ndim - 2:
            n = n[..., 0]
        logdet_X = log_determinant(X)
        logdet_S = log_determinant(scale)
        tr = jnp.trace(solve_posdef(scale, X), axis1=-2, axis2=-1)
        return (0.5 * (n - D - 1.0) * logdet_X - 0.5 * tr
                - 0.5 * n * D * LOG2 - 0.5 * n * logdet_S
                - log_multivariate_gamma(0.5 * n, D))

    def draw_samples_impl(self, rv_shape, num_samples, key,
                          degrees_of_freedom, scale):
        D = rv_shape[-1]
        n = degrees_of_freedom
        while n.ndim > 1:
            n = n[..., 0]
        shape = (num_samples,) + rv_shape
        k_norm, k_gamma = jax.random.split(key)
        # Bartlett: A = strict_lower(N(0,1)) + diag(sqrt(chi2(n - i)))
        N = self._rand_gen.sample_normal(key=k_norm, shape=shape,
                                         dtype=self.dtype)
        strict_lower = jnp.tril(N, k=-1)
        i = jnp.arange(D, dtype=N.dtype)
        df = n.reshape(n.shape + (1,) * 1) - i  # (..., D) chi2 dofs per diag
        df = jnp.broadcast_to(df, shape[:-2] + (D,))
        chi2 = 2.0 * self._rand_gen.sample_gamma(
            k_gamma, alpha=0.5 * df, beta=1.0, shape=df.shape,
            dtype=self.dtype)
        A = strict_lower.at[..., jnp.arange(D), jnp.arange(D)].set(
            jnp.sqrt(chi2))
        # factor the scale ONCE and broadcast the factor: the common
        # sample-invariant scale pays O(D^3), not O(S D^3) (broadcasting
        # before the Cholesky would re-factor every sample copy)
        L = jnp.broadcast_to(jnp.linalg.cholesky(scale), shape)
        LA = jnp.einsum("...ij,...jk->...ik", L, A)
        return jnp.einsum("...ik,...jk->...ij", LA, LA)

    def _generate_outputs(self, shape):
        if shape is None:
            raise ValueError("Wishart requires an explicit shape.")
        self.set_outputs([Variable(shape=shape)])

    @classmethod
    def define_variable(cls, degrees_of_freedom, scale, shape=None,
                        rand_gen=None, dtype=None):
        dist = cls(degrees_of_freedom=degrees_of_freedom, scale=scale,
                   rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
