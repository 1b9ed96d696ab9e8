"""GaussianProcess distribution: joint MVN of function values at X.

Reference: /root/reference/mxfusion/components/distributions/gp/gp.py:22-162.
Kernel parameters are first-class graph inputs (gp.py:46), so gradients
flow to lengthscales/variances through the Cholesky. Output columns are
treated as independent GPs sharing the kernel matrix (one Cholesky, all
columns solved in a single batched triangular solve — MXU-friendly).
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..distribution import Distribution
from ...variables.variable import Variable
from ....ops.precision import einsum as p_einsum

LOG2PI = float(np.log(2.0 * np.pi))


class GaussianProcess(Distribution):
    """``f ~ GP(mean, kernel)`` evaluated at inputs ``X``.

    The factor's inputs are ``X``, optionally ``mean``, plus every kernel
    parameter under its prefixed name.
    """

    def __init__(self, X, kernel, mean=None, rand_gen=None, dtype=None,
                 jitter=0.0):
        inputs = [("X", X)] + [(n, v) for n, v in kernel.parameters.items()]
        input_names = [n for n, _ in inputs]
        self.has_mean = mean is not None
        if self.has_mean:
            inputs.append(("mean", mean))
            input_names.append("mean")
        self.kernel = kernel
        self.jitter = jitter
        super().__init__(inputs=inputs, outputs=None,
                         input_names=input_names,
                         output_names=["random_variable"],
                         rand_gen=rand_gen, dtype=dtype)

    # ------------------------------------------------------------------
    def _kernel_args(self, inputs):
        kp = {n: inputs[n] for n in self.kernel.parameter_names}
        return kp

    def log_pdf_impl(self, random_variable, X, **inputs):
        rv = random_variable
        if self.has_mean:
            rv = rv - inputs["mean"]
        K = self.kernel.K(X, **self._kernel_args(inputs))
        if self.jitter > 0:
            K = K + self.jitter * jnp.eye(K.shape[-1], dtype=K.dtype)
        L = jnp.linalg.cholesky(K)
        alpha = jsl.solve_triangular(L, rv, lower=True)   # (..., N, Dout)
        N = rv.shape[-2]
        logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                         axis=-1)
        Dout = rv.shape[-1]
        return (-0.5 * N * Dout * LOG2PI - Dout * logdet
                - 0.5 * jnp.sum(jnp.square(alpha), axis=(-2, -1)))

    def draw_samples_impl(self, rv_shape, num_samples, key, X, **inputs):
        K = self.kernel.K(X, **self._kernel_args(inputs))
        if self.jitter > 0:
            K = K + self.jitter * jnp.eye(K.shape[-1], dtype=K.dtype)
        L = jnp.linalg.cholesky(K)
        eps = self._rand_gen.sample_normal(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        out = p_einsum("...ij,...jk->...ik", L, eps)
        if self.has_mean:
            out = out + inputs["mean"]
        return out

    # ------------------------------------------------------------------
    def _generate_outputs(self, shape):
        if shape is None:
            raise ValueError("GaussianProcess requires an explicit shape.")
        self.set_outputs([Variable(shape=shape)])

    @classmethod
    def define_variable(cls, X, kernel, shape=None, mean=None, rand_gen=None,
                        dtype=None, jitter=0.0):
        gp = cls(X=X, kernel=kernel, mean=mean, rand_gen=rand_gen,
                 dtype=dtype, jitter=jitter)
        gp._generate_outputs(shape=shape)
        return gp.random_variable

    def replicate_self(self, attribute_map=None):
        replica = super().replicate_self(attribute_map)
        replica.kernel = self.kernel.replicate_self(attribute_map)
        replica.has_mean = self.has_mean
        replica.jitter = self.jitter
        return replica
