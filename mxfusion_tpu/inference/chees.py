"""ChEES-HMC: self-tuning trajectory lengths, TPU-native.

No reference counterpart. Where CPU/GPU PPLs reach for NUTS, its
recursive, data-dependent tree building is exactly the control flow
XLA compiles worst (divergent per-chain trip counts, unbounded
recursion). ChEES-HMC (Hoffman, Radul & Sountsov 2021) was designed
for accelerators: ALL chains share one jittered trajectory length
whose distribution is adapted by maximizing the Change in the
Estimator of the Expected Squared jump distance

    ChEES = 1/4 E[ (‖q⁺−μ‖² − ‖q−μ‖²)² ]

by Adam on log T, with the criterion's analytic gradient estimated
across the vectorized chains. The result: NUTS-quality trajectory
tuning with a single ``lax.while_loop`` leapfrog (dynamic trip count,
static program) — one XLA program for the whole run, chains on the
framework's sample axis.

Step size co-adapts by dual averaging toward ``target_accept``
(harmonic-mean accept statistic, as in the paper). Metric: identity —
combine with whitened/standardized parameterizations for scale; the
Stan-style diagonal metric lives in HMCAlgorithm.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .inference import Inference
from .inference_alg import SamplingAlgorithm, VariableEnv
from .hmc import HMCInference


class ChEESHMCAlgorithm(SamplingAlgorithm):
    """ChEES-adaptive HMC over the model's latent RANDVARs.

    Parameters
    ----------
    num_samples, num_warmup, num_chains : int
    step_size : float
        Initial leapfrog step (dual-averaged during warmup).
    trajectory_length : float
        Initial mean trajectory length T (adapted during warmup).
    target_accept : float
    max_leapfrog : int
        Hard cap on leapfrog steps per proposal (while_loop bound).

    ``compute`` returns ``(samples, diagnostics)`` with the same
    contract as HMCAlgorithm; diagnostics add the adapted trajectory
    length and mean leapfrog count.
    """

    def __init__(self, model, observed, num_samples=500, num_warmup=500,
                 num_chains=8, step_size=0.1, trajectory_length=1.0,
                 target_accept=0.651, max_leapfrog=256,
                 target_variables=None, extra_graphs=None):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples,
                         target_variables=target_variables,
                         extra_graphs=extra_graphs)
        self.num_warmup = num_warmup
        self.num_chains = num_chains
        self.step_size = step_size
        self.trajectory_length = trajectory_length
        self.target_accept = target_accept
        self.max_leapfrog = max_leapfrog

    def _latent_uuids(self):
        from .hmc import sampler_latent_uuids
        return sampler_latent_uuids(self, "ChEES-HMC")

    def compute(self, env, ctx):
        from .hmc import (init_chains_from_prior, sum_log_pdf_terms,
                          make_support_transforms,
                          _per_chain_sum as per_chain_sum)
        C = self.num_chains
        latent_uuids = self._latent_uuids()
        q0 = init_chains_from_prior(self.model, env, ctx.next_key(),
                                    latent_uuids, C)
        dtype = list(q0.values())[0].dtype
        bij = make_support_transforms(self.model, latent_uuids)
        if bij is not None:
            q0 = bij.unconstrain(q0)

        def neg_logp(q):
            e = VariableEnv(env)
            e.update(bij.constrain(q) if bij is not None else q)
            lp = sum_log_pdf_terms(
                self.model.log_pdf_terms(e, ctx=ctx), dtype)
            if bij is not None:
                lp = lp + bij.log_jacobian(q).astype(dtype)
            return -lp

        grad_U = jax.grad(lambda q: jnp.sum(neg_logp(q)))

        def kinetic(p):
            k = jnp.zeros((C,), dtype=dtype)
            for v in p.values():
                k = k + 0.5 * per_chain_sum(v ** 2)
            return k

        def leapfrog(q, p, eps, n_steps):
            """n_steps is a TRACED scalar: dynamic while_loop trip
            count, one compiled program for every trajectory length."""
            g = grad_U(q)
            p = {u: p[u] - 0.5 * eps * g[u] for u in p}

            def cond(state):
                i, q, p, v = state
                return i < n_steps

            def body(state):
                i, q, p, _ = state
                q = {u: q[u] + eps * p[u] for u in q}
                g = grad_U(q)
                # half-step momentum at the boundary, full inside
                last = i == n_steps - 1
                scale = jnp.where(last, 0.5, 1.0)
                p = {u: p[u] - scale * eps * g[u] for u in p}
                # velocity at the endpoint (for the ChEES gradient)
                v = p
                return i + 1, q, p, v

            _, q, p, v = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32), q, p, p))
            return q, p, v

        def hmc_step(q, eps, traj_frac, T, key):
            """One jittered-trajectory proposal for all chains.
            traj_frac ~ U(0,1); t = traj_frac * T; n = ceil(t/eps)."""
            kp, ka = jax.random.split(key)
            keys = jax.random.split(kp, len(latent_uuids))
            p0 = {u: jax.random.normal(k, q[u].shape, dtype=dtype)
                  for u, k in zip(latent_uuids, keys)}
            t = traj_frac * T
            n_steps = jnp.clip(
                jnp.ceil(t / eps).astype(jnp.int32), 1,
                self.max_leapfrog)
            H0 = neg_logp(q) + kinetic(p0)
            q1, p1, v1 = leapfrog(q, p0, eps, n_steps)
            H1 = neg_logp(q1) + kinetic(p1)
            dH = H0 - H1
            accept_prob = jnp.minimum(1.0, jnp.exp(dH))
            accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0,
                                    accept_prob)
            log_u = jnp.log(jax.random.uniform(ka, (C,), dtype=dtype))
            accept = log_u < dH
            qn = {u: jnp.where(
                accept.reshape((C,) + (1,) * (q[u].ndim - 1)),
                q1[u], q[u]) for u in q}
            return qn, q1, v1, accept_prob, n_steps

        def chees_grad(q, q1, v1, accept_prob, traj_frac):
            """d ChEES / d T estimated across chains (paper eq. 6):
            weight each chain's  (‖q⁺−μ‖²−‖q−μ‖²)·(q⁺−μ)ᵀv⁺ · u
            by its acceptance probability."""
            def centered(z):
                flat = jnp.concatenate(
                    [z[u].reshape(C, -1) for u in latent_uuids], axis=1)
                return flat - jnp.mean(flat, axis=0, keepdims=True)
            cq = centered(q)
            cq1 = centered(q1)
            v = jnp.concatenate(
                [v1[u].reshape(C, -1) for u in latent_uuids], axis=1)
            jump = jnp.sum(cq1 ** 2, axis=1) - jnp.sum(cq ** 2, axis=1)
            term = jump * jnp.sum(cq1 * v, axis=1) * traj_frac
            w = accept_prob / (jnp.sum(accept_prob) + 1e-12)
            return jnp.sum(w * term)

        # ---- warmup: dual averaging on eps + Adam on log T
        eps0 = jnp.asarray(self.step_size, dtype=dtype)
        T0 = jnp.asarray(self.trajectory_length, dtype=dtype)
        gamma, t0, kappa = 0.05, 10.0, 0.75
        b1, b2, adam_lr = 0.9, 0.95, 0.025

        def warmup_body(carry, key):
            (q, log_eps, log_eps_bar, h_bar, it, log_T, mT, vT) = carry
            ku, ks = jax.random.split(key)
            traj_frac = jax.random.uniform(ku, (), dtype=dtype)
            eps = jnp.exp(log_eps)
            T = jnp.exp(log_T)
            qn, q1, v1, accept_prob, _ = hmc_step(q, eps, traj_frac, T,
                                                  ks)
            # harmonic-mean accept statistic (paper): robust to a few
            # stuck chains
            mean_accept = 1.0 / jnp.mean(1.0 / (accept_prob + 1e-6))
            it = it + 1.0
            h_bar = (1.0 - 1.0 / (it + t0)) * h_bar + \
                (self.target_accept - mean_accept) / (it + t0)
            mu = jnp.log(10.0 * eps0)
            log_eps = mu - jnp.sqrt(it) / gamma * h_bar
            w = it ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            # Adam ASCENT on log T along the ChEES gradient
            g = chees_grad(q, q1, v1, accept_prob, traj_frac) * T
            mT = b1 * mT + (1.0 - b1) * g
            vT = b2 * vT + (1.0 - b2) * g ** 2
            mh = mT / (1.0 - b1 ** it)
            vh = vT / (1.0 - b2 ** it)
            log_T = log_T + adam_lr * mh / (jnp.sqrt(vh) + 1e-8)
            # keep T inside the leapfrog cap
            log_T = jnp.clip(log_T, jnp.log(eps),
                             jnp.log(eps * self.max_leapfrog))
            return (qn, log_eps, log_eps_bar, h_bar, it, log_T, mT,
                    vT), None

        zero = jnp.zeros((), dtype)
        carry = (q0, jnp.log(eps0), jnp.log(eps0), zero, zero,
                 jnp.log(T0), zero, zero)
        carry, _ = jax.lax.scan(
            warmup_body, carry,
            jax.random.split(ctx.next_key(), self.num_warmup))
        q, _, log_eps_bar, _, _, log_T, _, _ = carry
        eps = jnp.exp(log_eps_bar)
        T = jnp.exp(log_T)

        # ---- sampling at fixed (eps, T), still jittered
        def sample_body(q, key):
            ku, ks = jax.random.split(key)
            traj_frac = jax.random.uniform(ku, (), dtype=dtype)
            qn, _, _, accept_prob, n_steps = hmc_step(q, eps, traj_frac,
                                                      T, ks)
            return qn, (qn, accept_prob, n_steps)

        q, (chain, accept_probs, n_steps) = jax.lax.scan(
            sample_body, q,
            jax.random.split(ctx.next_key(), self.num_samples))

        targets = self.target_variables if self.target_variables \
            else latent_uuids
        if bij is not None:
            chain = bij.constrain(chain)  # back to the native support
        samples = {u: chain[u] for u in targets}
        diagnostics = {
            "accept_rate": jnp.mean(accept_probs, axis=0),
            "step_size": eps,
            "trajectory_length": T,
            "mean_leapfrog_steps": jnp.mean(n_steps.astype(dtype)),
        }
        return samples, diagnostics


class ChEESHMCInference(Inference):
    """Driver: ``run(**data)`` returns the posterior sample dict and
    stores ``.diagnostics`` (accept rate, adapted step size and
    trajectory length, mean leapfrog steps)."""

    def run(self, key=None, **kwargs):
        out = super().run(key=key, **kwargs)
        samples, diagnostics = out
        self.diagnostics = {k: np.asarray(v)
                            for k, v in diagnostics.items()}
        from .hmc import _chain_convergence_diagnostics
        self.diagnostics.update(
            _chain_convergence_diagnostics(samples))
        self._samples = samples
        return samples


ChEESHMCInference.sample_predictive = HMCInference.sample_predictive
