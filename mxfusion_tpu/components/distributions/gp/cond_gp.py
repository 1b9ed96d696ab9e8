"""ConditionalGaussianProcess distribution.

Reference: /root/reference/mxfusion/components/distributions/gp/
cond_gp.py:23-234. Density/sampling of GP function values at X
conditioned on observations (X_cond, Y_cond):

    p(f|X, X_cond, Y_cond) = N(K_xz K_zz⁻¹ Y_cond,
                               K_xx − K_xz K_zz⁻¹ K_zx)

All solves go through one Cholesky of K_zz; cross-covariances are
batched matmuls.
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..distribution import Distribution
from ...variables.variable import Variable
from ....ops.precision import einsum as p_einsum

LOG2PI = float(np.log(2.0 * np.pi))


class ConditionalGaussianProcess(Distribution):
    def __init__(self, X, X_cond, Y_cond, kernel, mean=None, mean_cond=None,
                 rand_gen=None, dtype=None, jitter=0.0):
        inputs = [("X", X), ("X_cond", X_cond), ("Y_cond", Y_cond)] + \
            [(n, v) for n, v in kernel.parameters.items()]
        input_names = [n for n, _ in inputs]
        self.has_mean = mean is not None
        self.has_mean_cond = mean_cond is not None
        if self.has_mean:
            inputs.append(("mean", mean))
            input_names.append("mean")
        if self.has_mean_cond:
            inputs.append(("mean_cond", mean_cond))
            input_names.append("mean_cond")
        self.kernel = kernel
        self.jitter = jitter
        super().__init__(inputs=inputs, outputs=None,
                         input_names=input_names,
                         output_names=["random_variable"],
                         rand_gen=rand_gen, dtype=dtype)

    def _kernel_args(self, inputs):
        return {n: inputs[n] for n in self.kernel.parameter_names}

    def _conditional_moments(self, X, X_cond, Y_cond, inputs):
        kp = self._kernel_args(inputs)
        if self.has_mean_cond:
            Y_cond = Y_cond - inputs["mean_cond"]
        Kzz = self.kernel.K(X_cond, **kp)
        if self.jitter > 0:
            Kzz = Kzz + self.jitter * jnp.eye(Kzz.shape[-1], dtype=Kzz.dtype)
        Kxz = self.kernel.K(X, X2=X_cond, **kp)
        Kxx = self.kernel.K(X, **kp)
        Lz = jnp.linalg.cholesky(Kzz)
        # A = Lz^{-1} K_zx : (..., M, N)
        A = jsl.solve_triangular(Lz, jnp.swapaxes(Kxz, -1, -2), lower=True)
        LinvY = jsl.solve_triangular(Lz, Y_cond, lower=True)  # (..., M, Dout)
        mean = p_einsum("...mn,...md->...nd", A, LinvY)
        cov = Kxx - p_einsum("...mn,...mk->...nk", A, A)
        if self.has_mean:
            mean = mean + inputs["mean"]
        return mean, cov

    def log_pdf_impl(self, random_variable, X, X_cond, Y_cond, **inputs):
        mean, cov = self._conditional_moments(X, X_cond, Y_cond, inputs)
        if self.jitter > 0:
            cov = cov + self.jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        L = jnp.linalg.cholesky(cov)
        diff = random_variable - mean
        alpha = jsl.solve_triangular(L, diff, lower=True)
        N = diff.shape[-2]
        Dout = diff.shape[-1]
        logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                         axis=-1)
        return (-0.5 * N * Dout * LOG2PI - Dout * logdet
                - 0.5 * jnp.sum(jnp.square(alpha), axis=(-2, -1)))

    def draw_samples_impl(self, rv_shape, num_samples, key, X, X_cond,
                          Y_cond, **inputs):
        mean, cov = self._conditional_moments(X, X_cond, Y_cond, inputs)
        if self.jitter > 0:
            cov = cov + self.jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        L = jnp.linalg.cholesky(cov)
        eps = self._rand_gen.sample_normal(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        return mean + p_einsum("...ij,...jk->...ik", L, eps)

    def _generate_outputs(self, shape):
        if shape is None:
            raise ValueError(
                "ConditionalGaussianProcess requires an explicit shape.")
        self.set_outputs([Variable(shape=shape)])

    @classmethod
    def define_variable(cls, X, X_cond, Y_cond, kernel, shape=None, mean=None,
                        mean_cond=None, rand_gen=None, dtype=None,
                        jitter=0.0):
        gp = cls(X=X, X_cond=X_cond, Y_cond=Y_cond, kernel=kernel, mean=mean,
                 mean_cond=mean_cond, rand_gen=rand_gen, dtype=dtype,
                 jitter=jitter)
        gp._generate_outputs(shape=shape)
        return gp.random_variable

    def replicate_self(self, attribute_map=None):
        replica = super().replicate_self(attribute_map)
        replica.kernel = self.kernel.replicate_self(attribute_map)
        replica.has_mean = self.has_mean
        replica.has_mean_cond = self.has_mean_cond
        replica.jitter = self.jitter
        return replica
