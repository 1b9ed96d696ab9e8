"""Variational inference algorithms.

Reference: /root/reference/mxfusion/inference/variational.py:19-108.
``StochasticVariationalInference`` is the reparameterized ELBO: sample
the posterior, evaluate ``log p − log q`` on the same env (model and
posterior share variable UUIDs by replication), negate. Under
``jax.grad`` the pathwise gradient flows through the sampled values
automatically — no tape management.
"""
from .inference_alg import InferenceAlgorithm, SamplingAlgorithm


class VariationalInference(InferenceAlgorithm):
    """Base class holding the (model, posterior) pair."""

    def __init__(self, num_samples, model, posterior, observed):
        super().__init__(model=model, observed=observed,
                         extra_graphs=[posterior] if posterior is not None
                         else [])
        self.num_samples = num_samples

    @property
    def posterior(self):
        return self._extra_graphs[0] if self._extra_graphs else None


class VariationalSamplingAlgorithm(SamplingAlgorithm):
    """Base for sampling algorithms conditioned on a variational posterior."""

    def __init__(self, model, posterior, observed, num_samples=1,
                 target_variables=None):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples,
                         target_variables=target_variables,
                         extra_graphs=[posterior] if posterior is not None
                         else [])

    @property
    def posterior(self):
        return self._extra_graphs[0] if self._extra_graphs else None


class StochasticVariationalInference(VariationalInference):
    """Reparameterized ELBO (reference variational.py:73-107)."""

    def compute(self, env, ctx):
        samples = self.posterior.draw_samples(
            env, ctx.next_key(), num_samples=self.num_samples)
        env.update(samples)
        logL = self.model.log_pdf(env, ctx=ctx) - \
            self.posterior.log_pdf(env, ctx=ctx)
        return -logL, -logL


class ImportanceWeightedVariationalInference(VariationalInference):
    """Multi-sample importance-weighted bound (IWAE, Burda et al. 2016).

    No reference counterpart (the reference's algorithm set stops at
    the single/averaged-sample ELBO). The bound

        L_S = E[ log (1/S) Σ_s p(x, z_s) / q(z_s) ],  z_s ~ q

    is tighter than the ELBO, monotone in ``num_samples``, and →
    log p(x) as S → ∞; when q equals the true posterior the weights are
    constant and L_S equals the log evidence exactly for any S. The
    whole estimator is one reparameterized expression — ``jax.grad``
    yields the standard IWAE pathwise gradient. The S samples ride the
    framework's leading sample axis: one batched density evaluation,
    no per-sample loop."""

    def compute(self, env, ctx):
        import jax.numpy as jnp
        from jax.scipy.special import logsumexp
        samples = self.posterior.draw_samples(
            env, ctx.next_key(), num_samples=self.num_samples)
        env.update(samples)
        logw = self.model.log_pdf_per_sample(env, ctx=ctx) - \
            self.posterior.log_pdf_per_sample(env, ctx=ctx)
        bound = logsumexp(logw, axis=0) - \
            jnp.log(jnp.asarray(float(self.num_samples), dtype=logw.dtype))
        return -bound, -bound
