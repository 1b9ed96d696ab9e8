"""Stochastic-gradient Langevin dynamics (SGLD) posterior sampling.

No reference counterpart (amzn/MXFusion has no MCMC; SURVEY §2.8 lists
its complete algorithm set). This extends the HMC extension
(inference/hmc.py) to the large-N regime the framework targets: the
gradient of the log-joint is estimated on device-resident minibatches
with the standard N/B likelihood rescaling (the same ``log_pdf_scaling``
plumbing the minibatch SVI loop uses), so one chain step costs a
minibatch gradient instead of a full-data pass (Welling & Teh 2011).
Optional RMSProp preconditioning (pSGLD, Li et al. 2016) handles
latents with very different posterior scales.

TPU shape: the ENTIRE chain — burn-in, thinned sampling, minibatch
gather, preconditioner state — is one ``lax.scan``-ed pure function,
chains vectorized on the framework's leading sample axis. Minibatches
are assembled ON DEVICE by uniform index gather (with replacement, the
standard SGLD estimator) — no host round trips inside the chain.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .inference import Inference
from .inference_alg import (SamplingAlgorithm, VariableEnv,
                            create_sampling_executor)
from .hmc import HMCInference
from ..common.exceptions import InferenceError


class SGLDAlgorithm(SamplingAlgorithm):
    """SGLD sampling of the model's latent RANDVARs.

    Parameters
    ----------
    num_samples : int
        Kept (post-burn-in, thinned) draws per chain.
    num_burnin : int
        Discarded leading steps.
    thin : int
        Chain steps per kept draw.
    num_chains : int
        Chains, vectorized on the sample axis (prior-initialized).
    batch_size : int or None
        Minibatch rows per step; ``None`` runs full-batch (unadjusted
        Langevin). The likelihood is rescaled by N/B via
        ``log_pdf_scaling`` (set by the driver's executor creation).
    step_size : float
        Base step size ``a`` of the Welling–Teh schedule
        ``eps_t = a * (1 + t/b) ** (-gamma)``.
    step_decay_b, step_decay_gamma : float
        Schedule parameters; ``gamma=0`` keeps the step constant.
    preconditioning : bool
        RMSProp-preconditioned SGLD (pSGLD): per-dimension adaptive
        scaling ``1/(lambda + sqrt(V))`` with ``V`` an exponential
        moving average of squared stochastic gradients. The update
        omits the curvature drift term ``Gamma(theta)`` of Li et al.
        2016 (eq. 5) — the standard practical simplification (the
        term vanishes as the preconditioner equilibrates, and
        computing it needs dG/dtheta); it introduces a small
        asymptotic bias relative to the exact pSGLD dynamics.
    precond_alpha, precond_lambda : float
        pSGLD EMA rate and damping.

    ``compute`` returns ``(samples, diagnostics)`` like HMC: samples is
    {uuid: (num_samples, num_chains, *event_shape)}; diagnostics holds
    the final step size and final per-chain minibatch log-joint.
    """

    def __init__(self, model, observed, num_samples=1000, num_burnin=500,
                 thin=1, num_chains=4, batch_size=None, step_size=1e-3,
                 step_decay_b=1000.0, step_decay_gamma=0.55,
                 preconditioning=False, precond_alpha=0.99,
                 precond_lambda=1e-5, target_variables=None,
                 extra_graphs=None):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples,
                         target_variables=target_variables,
                         extra_graphs=extra_graphs)
        self.num_burnin = num_burnin
        self.thin = thin
        self.num_chains = num_chains
        self.batch_size = batch_size
        self.step_size = step_size
        self.step_decay_b = step_decay_b
        self.step_decay_gamma = step_decay_gamma
        self.preconditioning = preconditioning
        self.precond_alpha = precond_alpha
        self.precond_lambda = precond_lambda

    # ------------------------------------------------------------------
    def _latent_uuids(self):
        from .hmc import sampler_latent_uuids
        return sampler_latent_uuids(self, "SGLD")

    def compute(self, env, ctx):
        from .hmc import (init_chains_from_prior, sum_log_pdf_terms,
                          make_support_transforms)
        C = self.num_chains
        latent_uuids = self._latent_uuids()
        observed = list(self.observed_variable_UUIDs)

        # chains initialized by ancestral prior draws (C on sample axis)
        q = init_chains_from_prior(self.model, env, ctx.next_key(),
                                   latent_uuids, C)
        dtype = list(q.values())[0].dtype
        bij = make_support_transforms(self.model, latent_uuids)
        if bij is not None:
            q = bij.unconstrain(q)

        B = self.batch_size
        if B is not None:
            n_rows = {env[u].shape[1] for u in observed
                      if env[u].ndim >= 2}
            if len(n_rows) != 1:
                raise InferenceError(
                    "SGLD minibatching expects every observed array to "
                    "share one leading data dimension; got sizes {}. "
                    "Use batch_size=None for full-batch Langevin."
                    .format(sorted(n_rows)))
            (N,) = n_rows
            if B > N:
                raise InferenceError(
                    "batch_size {} exceeds the data size {}.".format(B, N))

        def log_joint(q, batch_env):
            e = VariableEnv(batch_env)
            e.update(bij.constrain(q) if bij is not None else q)
            lp = sum_log_pdf_terms(
                self.model.log_pdf_terms(e, ctx=ctx), dtype)
            if bij is not None:
                # prior-side term: NOT subject to the N/B rescaling
                lp = lp + bij.log_jacobian(q).astype(dtype)
            return lp

        grad_logp = jax.grad(lambda q, be: jnp.sum(log_joint(q, be)))

        def batch_env_at(key):
            if B is None:
                return env
            idx = jax.random.randint(key, (B,), 0, N)
            be = VariableEnv(env)
            for u in observed:
                if env[u].ndim >= 2 and env[u].shape[1] == N:
                    be[u] = jnp.take(env[u], idx, axis=1)
            return be

        a = jnp.asarray(self.step_size, dtype=dtype)

        def eps_at(t):
            if self.step_decay_gamma == 0.0:
                return a
            return a * (1.0 + t / self.step_decay_b) ** \
                (-self.step_decay_gamma)

        def sgld_step(carry, key):
            q, V, t = carry
            kb, kn = jax.random.split(key)
            be = batch_env_at(kb)
            g = grad_logp(q, be)
            eps = eps_at(t)
            keys = jax.random.split(kn, len(latent_uuids))
            qn, Vn = {}, {}
            for u, k in zip(latent_uuids, keys):
                if self.preconditioning:
                    Vn[u] = self.precond_alpha * V[u] + \
                        (1.0 - self.precond_alpha) * g[u] ** 2
                    P = 1.0 / (self.precond_lambda + jnp.sqrt(Vn[u]))
                else:
                    Vn[u] = V[u]
                    P = 1.0
                noise = jax.random.normal(k, q[u].shape, dtype=dtype)
                qn[u] = q[u] + 0.5 * eps * P * g[u] + \
                    jnp.sqrt(eps * P) * noise
            return (qn, Vn, t + 1.0), None

        V0 = {u: jnp.zeros_like(q[u]) for u in q}
        t0 = jnp.zeros((), dtype=dtype)

        # burn-in: no collection
        if self.num_burnin > 0:
            (q, V0, t0), _ = jax.lax.scan(
                sgld_step, (q, V0, t0),
                jax.random.split(ctx.next_key(), self.num_burnin))

        # sampling: `thin` chain steps per kept draw
        def sample_body(carry, key):
            if self.thin == 1:
                carry, _ = sgld_step(carry, key)
            else:
                carry, _ = jax.lax.scan(
                    sgld_step, carry, jax.random.split(key, self.thin))
            return carry, carry[0]

        (q, _, t_final), chain = jax.lax.scan(
            sample_body, (q, V0, t0),
            jax.random.split(ctx.next_key(), self.num_samples))

        targets = self.target_variables if self.target_variables \
            else latent_uuids
        if bij is not None:
            chain = bij.constrain(chain)  # back to the native support
        samples = {u: chain[u] for u in targets}
        diagnostics = {
            "step_size_final": eps_at(t_final - 1.0),
            "final_minibatch_log_joint": log_joint(
                q, batch_env_at(ctx.next_key())),
        }
        return samples, diagnostics


class SGLDInference(Inference):
    """Driver: ``run(**data)`` returns the posterior sample dict and
    stores ``.diagnostics``. Applies the N/B likelihood rescaling to
    every observed RANDVAR's generating factor before tracing the
    chain.

    Example::

        alg = SGLDAlgorithm(model=m, observed=[m.y], batch_size=256,
                            num_samples=2000, num_chains=4)
        infr = SGLDInference(alg)
        samples = infr.run(y=y)[w_uuid]      # (2000, 4, *event)
    """

    def run(self, key=None, **kwargs):
        data = [np.asarray(d) for d in self._fetch_observed(kwargs)]
        alg = self._algorithm
        rv_scaling = None
        if alg.batch_size is not None:
            # symbolic data dims bind to the BATCH size (the same
            # convention as GradBasedInference._bind_minibatch_shapes):
            # the likelihood subgraph evaluates on B-row slices, so
            # models minibatched by SGLD must declare the data axis
            # with a symbolic dim (m.n = Variable()), not a python int
            from ..util.inference import discover_shape_constants
            B = alg.batch_size
            data_shapes = {uuid: (min(B, np.shape(d)[0]),) +
                           tuple(np.shape(d)[1:])
                           for uuid, d in zip(self.observed_variable_UUIDs,
                                              data)}
            self.params.constants.update(
                discover_shape_constants(data_shapes, self.graphs))
            self.params.initialize_params(
                self.graphs, self.observed_variable_UUIDs, key=key)
            self._initialized = True
            N = data[0].shape[0]
            scale = N / float(B)
            rv_scaling = {u: scale for u in alg.observed_variable_UUIDs}
        elif not self._initialized:
            self.initialize(key=key, **kwargs)
        if key is None:
            key = jax.random.PRNGKey(0)
        executor = create_sampling_executor(alg, self.params,
                                            rv_scaling=rv_scaling)
        samples, diagnostics = executor(
            self.params.trainable_params(), self.params.fixed_params(),
            data, key)
        self.diagnostics = {k: np.asarray(v)
                            for k, v in diagnostics.items()}
        from .hmc import _chain_convergence_diagnostics
        self.diagnostics.update(
            _chain_convergence_diagnostics(samples))
        self._samples = samples
        return samples


# posterior-predictive sampling works identically to HMC's: latents
# pinned to stored draws, ancestral sampling of the rest
SGLDInference.sample_predictive = HMCInference.sample_predictive
