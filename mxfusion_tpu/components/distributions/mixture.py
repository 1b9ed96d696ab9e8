"""Finite Gaussian mixture with marginalized assignments.

Beyond the reference's distribution set. The discrete component
assignment is marginalized inside ``log_pdf`` (a ``logsumexp`` over a
trailing component axis), so the density is smooth in every parameter
and works directly with gradient-based inference (SVI/MAP/HMC/SGLD) —
no discrete latent, no score-function estimator needed.

Convention: the component axis is the LAST axis of ``weights``,
``means`` and ``variances`` (shape ``(..., K)``); the random variable
has the event shape WITHOUT the component axis. Events right-align
against the parameter shapes minus the component axis.
"""
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .distribution import UnivariateDistribution

_LOG2PI = 1.8378770664093453


class NormalMixture(UnivariateDistribution):
    """``p(x) = Σ_k w_k N(x | mean_k, var_k)`` with ``w`` normalized
    internally (softmax-free: weights are positive and renormalized, so
    place a ``PositiveTransformation`` on trainable weights)."""

    def __init__(self, weights, means, variances, rand_gen=None,
                 dtype=None):
        super().__init__(
            inputs=[("weights", weights), ("means", means),
                    ("variances", variances)],
            outputs=None,
            input_names=["weights", "means", "variances"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    @staticmethod
    def _align(p, target_ndim):
        """Right-align a (sample, ..., K) parameter against
        x[..., None]: keep axis 0 (samples) and the trailing component
        axis, pad broadcast axes in between."""
        while p.ndim < target_ndim:
            p = jnp.expand_dims(p, axis=1)
        return p

    def log_pdf_impl(self, random_variable, weights, means, variances):
        x = jnp.expand_dims(random_variable, axis=-1)      # (..., 1)
        weights = self._align(weights, x.ndim)
        means = self._align(means, x.ndim)
        variances = self._align(variances, x.ndim)
        w = weights / jnp.sum(weights, axis=-1, keepdims=True)
        comp = -0.5 * (_LOG2PI + jnp.log(variances)
                       + (x - means) ** 2 / variances)     # (..., K)
        return logsumexp(comp + jnp.log(w), axis=-1)

    def draw_samples_impl(self, rv_shape, num_samples, key, weights,
                          means, variances):
        import jax
        w = weights / jnp.sum(weights, axis=-1, keepdims=True)
        kc, kn = jax.random.split(key)
        shape = (num_samples,) + rv_shape
        # right-aligned broadcasting would pit the leading sample axis
        # of (s, K) parameters against the event dims of ``shape``;
        # align as in log_pdf_impl (keep sample + component axes, pad
        # singletons in between) before broadcasting
        target = len(shape) + 1
        w = self._align(w, target)
        means = self._align(means, target)
        variances = self._align(variances, target)
        # component indices per draw via the rand_gen facade (Gumbel
        # argmax), then gather the selected component's moments
        probs = jnp.broadcast_to(w, shape + w.shape[-1:])
        idx = self._rand_gen.sample_multinomial(kc, probs)
        mean_b = jnp.broadcast_to(means, shape + means.shape[-1:])
        var_b = jnp.broadcast_to(variances, shape + variances.shape[-1:])
        mean_sel = jnp.take_along_axis(
            mean_b, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
        var_sel = jnp.take_along_axis(
            var_b, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return self._rand_gen.sample_normal(
            kn, loc=mean_sel, scale=jnp.sqrt(var_sel), shape=shape,
            dtype=self.dtype)

    @classmethod
    def define_variable(cls, weights, means, variances, shape=None,
                        rand_gen=None, dtype=None):
        dist = cls(weights=weights, means=means, variances=variances,
                   rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
