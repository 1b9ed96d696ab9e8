"""Stationary kernels: ARD lengthscale + variance, scaled squared distance.

Reference: /root/reference/mxfusion/components/distributions/gp/kernels/
stationary.py:21-132. The scaled squared distance uses the
``|x|² + |x'|² − 2 x·x'`` expansion whose cross term is a single batched
matmul (einsum) — the dominant FLOPs land on the MXU. A fused Pallas
path for the full (R² → amplitude) pipeline lives in
``mxfusion_tpu.ops.pallas_kernels`` and is used by RBF when enabled.
"""
import jax.numpy as jnp

from .kernel import NativeKernel
from .....ops.precision import einsum as p_einsum


class StationaryKernel(NativeKernel):
    """Base for kernels that depend only on scaled distance r = |x - x'| / l."""

    def __init__(self, input_dim, ARD=False, variance=1., lengthscale=1.,
                 name="stationary", active_dims=None, dtype=None):
        super().__init__(input_dim=input_dim, name=name,
                         active_dims=active_dims, dtype=dtype)
        self.ARD = ARD
        ls_shape = (input_dim,) if ARD else (1,)
        self.lengthscale = self._make_param(lengthscale, ls_shape)
        self.variance = self._make_param(variance, (1,))

    def _compute_R2(self, X, X2, lengthscale):
        """Scaled squared distance matrix (..., N, M), clamped at 0."""
        ls = jnp.expand_dims(lengthscale, axis=-2)  # (..., 1, D)
        Xs = X / ls
        if X2 is None:
            X2s = Xs
        else:
            X2s = X2 / ls
        # the |x|^2 + |x'|^2 - 2 x.x' expansion relies on CANCELLATION
        # between large terms, so the cross product must stay HIGHEST
        # even under relaxed data-side precision: a bf16-pass cross term
        # perturbs R2 by O(|x||x'| * eps), i.e. exp(-R2/2) by O(1)
        # (measured: the 10^6-point SVGP converged ~5x slower). The
        # gram is ~2% of the step's FLOPs — relaxing it buys nothing.
        cross = p_einsum("...nd,...md->...nm", Xs, X2s)
        x1sq = jnp.sum(jnp.square(Xs), axis=-1)
        x2sq = jnp.sum(jnp.square(X2s), axis=-1)
        R2 = x1sq[..., :, None] + x2sq[..., None, :] - 2.0 * cross
        return jnp.maximum(R2, 0.0)

    def _compute_Kdiag(self, X, lengthscale, variance):
        return jnp.broadcast_to(variance, X.shape[:-1])
