"""Normal-family distributions.

Reference: /root/reference/mxfusion/components/distributions/normal.py
(Normal :26, MultivariateNormal :119, NormalMeanPrecision :239,
MultivariateNormalMeanPrecision :332). The multivariate log-pdfs here
are fully batched through XLA's Cholesky/triangular-solve — including
the precision-parameterized case where the reference falls back to a
Python loop over batch indices (normal.py:389-392).

Shape conventions (leading axis = samples):
- univariate: mean/variance/rv broadcast elementwise.
- multivariate: mean ``(s, ..., D)``, covariance ``(s, ..., D, D)``,
  rv ``(s, ..., D)``; log_pdf returns ``(s, ...)``.
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .distribution import Distribution, UnivariateDistribution
from ..variables.variable import Variable
from ...ops.precision import einsum as p_einsum
from ...ops.pallas_batched_cholesky import cholesky as _cholesky


LOG2PI = float(np.log(2.0 * np.pi))


class Normal(UnivariateDistribution):
    """Normal distribution parameterized by mean and variance."""

    def __init__(self, mean, variance, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("mean", mean), ("variance", variance)], outputs=None,
            input_names=["mean", "variance"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, mean, variance):
        return -0.5 * (LOG2PI + jnp.log(variance)
                       + (random_variable - mean) ** 2 / variance)

    def draw_samples_impl(self, rv_shape, num_samples, key, mean, variance):
        # reparameterized: mean + sqrt(var) * eps (reference normal.py:88-92)
        eps = self._rand_gen.sample_normal(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        return mean + jnp.sqrt(variance) * eps

    @classmethod
    def define_variable(cls, mean=0., variance=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(mean=mean, variance=variance, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable


class MultivariateNormal(Distribution):
    """MVN parameterized by mean and covariance matrix."""

    def __init__(self, mean, covariance, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("mean", mean), ("covariance", covariance)], outputs=None,
            input_names=["mean", "covariance"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, mean, covariance):
        D = random_variable.shape[-1]
        L = _cholesky(covariance)
        diff = random_variable - mean
        alpha = jsl.solve_triangular(L, diff[..., None], lower=True)[..., 0]
        logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                         axis=-1)
        return (-0.5 * D * LOG2PI - logdet
                - 0.5 * jnp.sum(alpha ** 2, axis=-1))

    def draw_samples_impl(self, rv_shape, num_samples, key, mean, covariance):
        L = _cholesky(covariance)
        eps = self._rand_gen.sample_normal(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        return mean + p_einsum("...ij,...j->...i", L, eps)

    @classmethod
    def define_variable(cls, mean, covariance, shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(mean=mean, covariance=covariance, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable

    def _generate_outputs(self, shape):
        if shape is None:
            raise ValueError("MultivariateNormal requires an explicit shape.")
        self.set_outputs([Variable(shape=shape)])


class NormalMeanPrecision(UnivariateDistribution):
    """Normal parameterized by mean and precision (1/variance)."""

    def __init__(self, mean, precision, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("mean", mean), ("precision", precision)], outputs=None,
            input_names=["mean", "precision"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, mean, precision):
        return 0.5 * (jnp.log(precision) - LOG2PI
                      - precision * (random_variable - mean) ** 2)

    def draw_samples_impl(self, rv_shape, num_samples, key, mean, precision):
        eps = self._rand_gen.sample_normal(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        return mean + eps / jnp.sqrt(precision)

    @classmethod
    def define_variable(cls, mean=0., precision=1., shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(mean=mean, precision=precision, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable


class MultivariateNormalMeanPrecision(Distribution):
    """MVN parameterized by mean and precision matrix.

    log N(x|μ, Λ⁻¹) = ½log|Λ| − D/2·log2π − ½(x−μ)ᵀΛ(x−μ); sampling maps
    ε through the inverse transpose Cholesky of Λ — both fully batched
    (the reference loops over batch indices here, normal.py:389-421).
    """

    def __init__(self, mean, precision, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("mean", mean), ("precision", precision)], outputs=None,
            input_names=["mean", "precision"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, mean, precision):
        D = random_variable.shape[-1]
        L = _cholesky(precision)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                               axis=-1)
        diff = random_variable - mean
        quad = p_einsum("...i,...ij,...j->...", diff, precision, diff)
        return 0.5 * (logdet - D * LOG2PI - quad)

    def draw_samples_impl(self, rv_shape, num_samples, key, mean, precision):
        L = _cholesky(precision)
        eps = self._rand_gen.sample_normal(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        # x = mean + L^{-T} eps  has covariance (L L^T)^{-1} = Λ^{-1}
        # (XLA triangular_solve requires compatible batch dims: broadcast
        # the factor against the sample batch explicitly)
        LT = jnp.swapaxes(L, -1, -2)
        D = rv_shape[-1]
        LT = jnp.broadcast_to(LT, eps.shape[:-1] + (D, D))
        z = jsl.solve_triangular(LT, eps[..., None], lower=False)[..., 0]
        return mean + z

    @classmethod
    def define_variable(cls, mean, precision, shape=None, rand_gen=None,
                        dtype=None):
        dist = cls(mean=mean, precision=precision, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable

    def _generate_outputs(self, shape):
        if shape is None:
            raise ValueError(
                "MultivariateNormalMeanPrecision requires an explicit shape.")
        self.set_outputs([Variable(shape=shape)])
