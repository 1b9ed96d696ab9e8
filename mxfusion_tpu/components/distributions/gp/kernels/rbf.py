"""RBF (squared-exponential) kernel.

Reference: /root/reference/mxfusion/components/distributions/gp/kernels/
rbf.py:19-72. ``K = variance * exp(-R²/2)``. When
``mxfusion_tpu.ops.pallas_kernels.use_pallas()`` is on and shapes are
TPU-tile friendly, the fused Pallas kernel assembles K in one pass over
VMEM tiles (scaling + matmul + exp fused).
"""
import jax.numpy as jnp

from .stationary import StationaryKernel


class RBF(StationaryKernel):
    def __init__(self, input_dim, ARD=False, variance=1., lengthscale=1.,
                 name="rbf", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, ARD=ARD, variance=variance,
                         lengthscale=lengthscale, name=name,
                         active_dims=active_dims, dtype=dtype)

    def _compute_K(self, X, X2=None, lengthscale=None, variance=None):
        from .....ops.pallas_kernels import rbf_kernel_matrix, pallas_eligible
        if pallas_eligible(X, X2):
            return rbf_kernel_matrix(X, X2, lengthscale, variance)
        R2 = self._compute_R2(X, X2, lengthscale)
        return jnp.expand_dims(variance, axis=-1) * jnp.exp(-0.5 * R2)
