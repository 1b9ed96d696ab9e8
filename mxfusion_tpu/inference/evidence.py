"""Model evidence by thermodynamic integration (power posteriors).

No reference counterpart. The log marginal likelihood is

    log Z = ∫_0^1 E_{pi_beta}[ log p(y | x) ] dbeta,
    pi_beta(x) ∝ p(x) · p(y | x)^beta            (Gelman & Meng 1998;
                                                  Friel & Pettitt 2008)

— the path from prior (beta = 0) to posterior (beta = 1). This runner
reuses the replica-exchange machinery (inference/tempering.py) with
LIKELIHOOD-ONLY tempering: every rung of the Friel-Pettitt schedule
beta_k = (k / (K-1))^c runs as a replica on the vectorized sample
axis, adjacent rungs swap states for mixing, and the per-rung mean
log-likelihood is averaged over the sampling sweeps. The integral is
the trapezoid over the ladder — one scanned XLA program end to end.

Complements the other evidence routes: Laplace (quadratic
approximation around the MAP) and the IWAE bound (lower bound);
thermodynamic integration is asymptotically exact in sweeps x rungs.
Validated against conjugate closed-form evidences in the tests.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .inference import Inference
from .inference_alg import SamplingAlgorithm, VariableEnv
from .hmc import (init_chains_from_prior, make_support_transforms,
                  sum_log_pdf_terms, sampler_latent_uuids,
                  _per_chain_sum)


class PowerPosteriorAlgorithm(SamplingAlgorithm):
    """HMC over the full power-posterior ladder with replica swaps.

    Parameters mirror ParallelTemperingAlgorithm; ``num_temps`` is the
    number of rungs K (including beta = 0 and beta = 1) and
    ``schedule_power`` the Friel-Pettitt exponent c (rungs concentrate
    near 0, where the integrand changes fastest).

    ``compute`` returns ``(samples, diagnostics)``: posterior
    (beta = 1) samples {uuid: (S, C, *event)}; diagnostics carry
    ``log_evidence`` (trapezoid TI estimate), ``betas``,
    ``mean_loglik_per_temp``, and the swap acceptance per pair.
    """

    def __init__(self, model, observed, num_samples=500, num_warmup=500,
                 num_chains=2, num_temps=16, schedule_power=5.0,
                 step_size=0.1, num_leapfrog=16, target_accept=0.8,
                 target_variables=None, extra_graphs=None):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples,
                         target_variables=target_variables,
                         extra_graphs=extra_graphs)
        if num_temps < 2:
            raise ValueError("num_temps must be >= 2 (the TI grid "
                             "needs beta = 0 and beta = 1).")
        self.num_warmup = num_warmup
        self.num_chains = num_chains
        self.num_temps = num_temps
        self.schedule_power = schedule_power
        self.step_size = step_size
        self.num_leapfrog = num_leapfrog
        self.target_accept = target_accept

    def _latent_uuids(self):
        return sampler_latent_uuids(self, "PowerPosterior")

    def compute(self, env, ctx):
        C, K = self.num_chains, self.num_temps
        R = C * K
        latent_uuids = self._latent_uuids()
        q0 = init_chains_from_prior(self.model, env, ctx.next_key(),
                                    latent_uuids, R)
        dtype = list(q0.values())[0].dtype
        bij = make_support_transforms(self.model, latent_uuids)
        if bij is not None:
            q0 = bij.unconstrain(q0)

        # Friel-Pettitt schedule INCLUDING the endpoints, coldest
        # (beta=1) first so row r%K == 0 is the posterior rung
        betas_k = jnp.asarray(
            (np.linspace(1.0, 0.0, K)) ** self.schedule_power,
            dtype=dtype)
        betas = jnp.tile(betas_k, C)                       # (R,)

        lik_targets = [u for u in self.observed_variable_UUIDs
                       if self.model.variables[u].factor is not None]

        def log_parts(q):
            """(log prior + Jacobian, log likelihood), each (R,)."""
            e = VariableEnv(env)
            e.update(bij.constrain(q) if bij is not None else q)
            lik = sum_log_pdf_terms(
                self.model.log_pdf_terms(e, targets=lik_targets,
                                         ctx=ctx), dtype)
            pri = sum_log_pdf_terms(
                self.model.log_pdf_terms(e, targets=latent_uuids,
                                         ctx=ctx), dtype)
            if bij is not None:
                pri = pri + bij.log_jacobian(q).astype(dtype)
            return pri, lik

        def neg_logp_t(q):
            pri, lik = log_parts(q)
            return -(pri + betas * lik)

        grad_U = jax.grad(lambda q: jnp.sum(neg_logp_t(q)))
        # the beta=0 rung targets the prior: bounded step scaling
        eps_scale = (0.25 + betas) ** -0.5                 # (R,)

        def bshape(u):
            return (R,) + (1,) * (q0[u].ndim - 1)

        def kinetic(p):
            k = jnp.zeros((R,), dtype=dtype)
            for v in p.values():
                k = k + 0.5 * _per_chain_sum(v ** 2)
            return k

        def leapfrog(q, p, eps):
            er = {u: (eps * eps_scale).reshape(bshape(u))
                  for u in latent_uuids}
            g = grad_U(q)
            p = {u: p[u] - 0.5 * er[u] * g[u] for u in p}

            def body(i, qp):
                q, p = qp
                q = {u: q[u] + er[u] * p[u] for u in q}
                g = grad_U(q)
                scale = jnp.where(i == self.num_leapfrog - 1, 0.5, 1.0)
                p = {u: p[u] - scale * er[u] * g[u] for u in p}
                return q, p

            q, p = jax.lax.fori_loop(0, self.num_leapfrog, body, (q, p))
            return q, p

        def hmc_sweep(q, pri, lik, eps, key):
            kp, ka = jax.random.split(key)
            keys = jax.random.split(kp, len(latent_uuids))
            p0 = {u: jax.random.normal(k, q[u].shape, dtype=dtype)
                  for u, k in zip(latent_uuids, keys)}
            H0 = -(pri + betas * lik) + kinetic(p0)
            q1, p1 = leapfrog(q, p0, eps)
            pri1, lik1 = log_parts(q1)
            H1 = -(pri1 + betas * lik1) + kinetic(p1)
            dH = H0 - H1
            accept_prob = jnp.minimum(1.0, jnp.exp(dH))
            accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0,
                                    accept_prob)
            accept = jnp.log(jax.random.uniform(
                ka, (R,), dtype=dtype)) < dH
            qn = {u: jnp.where(accept.reshape(bshape(u)), q1[u], q[u])
                  for u in q}
            prin = jnp.where(accept, pri1, pri)
            likn = jnp.where(accept, lik1, lik)
            return qn, prin, likn, accept_prob

        t_idx = jnp.tile(jnp.arange(K), C)

        def swap_pass(q, pri, lik, parity, key):
            """Adjacent-rung swaps; the ratio uses the LIKELIHOOD only
            (the prior factor is common to both rungs)."""
            lik_up = jnp.roll(lik, -1)
            beta_up = jnp.roll(betas, -1)
            is_lower = (t_idx % 2 == parity) & (t_idx < K - 1)
            log_alpha = (betas - beta_up) * (lik_up - lik)
            u = jax.random.uniform(key, (R,), dtype=dtype)
            do_swap = is_lower & (jnp.log(u) < log_alpha)
            take_next = do_swap
            take_prev = jnp.roll(do_swap, 1)

            def permute(x):
                return jnp.where(take_next, jnp.roll(x, -1),
                                 jnp.where(take_prev, jnp.roll(x, 1),
                                           x))

            qn = {}
            for uu in latent_uuids:
                x = q[uu]
                sel_n = take_next.reshape(bshape(uu))
                sel_p = take_prev.reshape(bshape(uu))
                qn[uu] = jnp.where(sel_n, jnp.roll(x, -1, axis=0),
                                   jnp.where(sel_p,
                                             jnp.roll(x, 1, axis=0),
                                             x))
            return (qn, permute(pri), permute(lik), do_swap, is_lower)

        # ---- warmup with dual-averaged base step
        eps0 = jnp.asarray(self.step_size, dtype=dtype)
        gamma, t0, kappa = 0.05, 10.0, 0.75
        mu = jnp.log(10.0 * eps0)
        pri0, lik0 = log_parts(q0)

        def warmup_body(carry, inp):
            q, pri, lik, log_eps, log_eps_bar, h_bar, t = carry
            i, key = inp
            ks, kw = jax.random.split(key)
            q, pri, lik, accept_prob = hmc_sweep(
                q, pri, lik, jnp.exp(log_eps), ks)
            q, pri, lik, _, _ = swap_pass(q, pri, lik, i % 2, kw)
            # PER-REPLICA dual averaging: every rung's target has its
            # own curvature (beta=1 sharpest), so each adapts its own
            # step size toward the target acceptance
            accept_r = accept_prob.astype(dtype)             # (R,)
            t = t + 1.0
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + \
                (self.target_accept - accept_r) / (t + t0)
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            return (q, pri, lik, log_eps, log_eps_bar, h_bar, t), None

        zero = jnp.zeros((), dtype)
        zeros_r = jnp.zeros((R,), dtype)
        carry = (q0, pri0, lik0, zeros_r + jnp.log(eps0),
                 zeros_r + jnp.log(eps0), zeros_r, zero)
        steps = jnp.arange(self.num_warmup)
        carry, _ = jax.lax.scan(
            warmup_body, carry,
            (steps, jax.random.split(ctx.next_key(), self.num_warmup)))
        q, pri, lik, _, log_eps_bar, _, _ = carry
        eps = jnp.exp(log_eps_bar)

        # ---- sampling sweeps: collect posterior-rung states and the
        # per-replica loglik for the TI average
        def sample_body(carry, inp):
            q, pri, lik = carry
            i, key = inp
            ks, kw = jax.random.split(key)
            q, pri, lik, accept_prob = hmc_sweep(q, pri, lik, eps, ks)
            q, pri, lik, do_swap, is_lower = swap_pass(q, pri, lik,
                                                       i % 2, kw)
            return (q, pri, lik), (q, lik, accept_prob, do_swap,
                                   is_lower)

        steps = jnp.arange(self.num_samples)
        (q, pri, lik), (chain, liks, accept_probs, do_swap, is_lower) \
            = jax.lax.scan(
                sample_body, (q, pri, lik),
                (steps,
                 jax.random.split(ctx.next_key(), self.num_samples)))

        if bij is not None:
            chain = bij.constrain(chain)
        cold = jnp.nonzero(t_idx == 0, size=C)[0]
        targets = self.target_variables if self.target_variables \
            else latent_uuids
        samples = {u: jnp.take(chain[u], cold, axis=1)
                   for u in targets}

        # TI: mean loglik per rung (sweeps x chains pooled), trapezoid
        # over beta ascending
        mean_lik = jnp.mean(liks.reshape(self.num_samples, C, K),
                            axis=(0, 1))                   # (K,)
        order = jnp.argsort(betas_k)                       # ascending
        b_asc = betas_k[order]
        l_asc = mean_lik[order]
        log_Z = jnp.sum(0.5 * (l_asc[1:] + l_asc[:-1])
                        * (b_asc[1:] - b_asc[:-1]))

        prop = is_lower.astype(dtype)
        acc = do_swap.astype(dtype)
        pair_acc = (jnp.sum(acc, axis=0) /
                    jnp.maximum(jnp.sum(prop, axis=0), 1.0))
        pair_acc = jnp.mean(pair_acc.reshape(C, K), axis=0)[:-1]
        diagnostics = {
            "log_evidence": log_Z,
            "betas": betas_k,
            "mean_loglik_per_temp": mean_lik,
            "accept_rate": jnp.mean(
                accept_probs, axis=0).reshape(C, K)[:, 0],
            "swap_accept_rate": pair_acc,
            "step_size": eps,
        }
        return samples, diagnostics


class PowerPosteriorInference(Inference):
    """Driver: ``run(**data)`` returns posterior-rung samples and
    stores ``.diagnostics`` incl. ``log_evidence`` (also exposed as
    ``.log_evidence`` after the run)."""

    def run(self, key=None, **kwargs):
        out = super().run(key=key, **kwargs)
        samples, diagnostics = out
        self.diagnostics = {k: np.asarray(v)
                            for k, v in diagnostics.items()}
        from .hmc import _chain_convergence_diagnostics
        self.diagnostics.update(
            _chain_convergence_diagnostics(samples))
        self.log_evidence = float(self.diagnostics["log_evidence"])
        self._samples = samples
        return samples
