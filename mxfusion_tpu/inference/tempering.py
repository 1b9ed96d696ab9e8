"""Parallel-tempering (replica-exchange) HMC.

No reference counterpart (amzn/MXFusion has no MCMC; SURVEY §2.8).
Multimodal posteriors defeat single-temperature HMC — a chain that
falls into one mode essentially never crosses an energy barrier. PT
runs K replicas of every chain against the tempered targets
``pi_beta ∝ exp(beta · log p)`` on a geometric inverse-temperature
ladder (beta_0 = 1 cold ... beta_{K-1} hot), and after every HMC sweep
proposes even/odd adjacent-pair state swaps accepted with the standard
Metropolis ratio  exp((beta_i − beta_j)(logp(x_j) − logp(x_i)))
(Swendsen & Wang 1986; Earl & Deem 2005 review). Hot replicas roam
freely across modes and ferry states down to beta = 1.

TPU shape: all C·K replicas ride the framework's leading sample axis —
one batched gradient/leapfrog per sweep regardless of K, the swap pass
is a pure permutation + where(), and the ENTIRE run (warmup with
dual-averaged step size, sweeps, swaps, collection) is one
``lax.scan``-ed XLA program. Per-replica step sizes follow
``eps · beta^(-1/2)`` (hotter target ⇒ wider moves). Support
bijectors apply as in plain HMC (the tempered potential is
``beta · (logp + log|J|)``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from .inference import Inference
from .inference_alg import SamplingAlgorithm, VariableEnv
from .hmc import (HMCInference, init_chains_from_prior,
                  make_support_transforms, sum_log_pdf_terms,
                  sampler_latent_uuids, _per_chain_sum)


class ParallelTemperingAlgorithm(SamplingAlgorithm):
    """Replica-exchange HMC over the model's latent RANDVARs.

    Parameters
    ----------
    num_samples, num_warmup : int
        Kept cold-chain draws / discarded adaptation sweeps.
    num_chains : int
        Independent chains per temperature.
    num_temps : int
        Ladder size K (1 degenerates to plain HMC).
    max_inv_temp_ratio : float
        beta_{K-1} (the hottest inverse temperature); the ladder is
        geometric between 1 and this value.
    step_size, num_leapfrog, target_accept : HMC controls (the step
        size is dual-averaged during warmup on the pooled accept rate).

    ``compute`` returns ``(samples, diagnostics)``: samples is
    {uuid: (num_samples, num_chains, *event_shape)} from the COLD
    replicas only; diagnostics add the per-adjacent-pair swap
    acceptance rate (the ladder-health signal: near-zero for some pair
    means the ladder has a gap there).
    """

    def __init__(self, model, observed, num_samples=500, num_warmup=500,
                 num_chains=4, num_temps=6, max_inv_temp_ratio=0.05,
                 step_size=0.1, num_leapfrog=16, target_accept=0.8,
                 target_variables=None, extra_graphs=None):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples,
                         target_variables=target_variables,
                         extra_graphs=extra_graphs)
        if num_temps < 1:
            raise ValueError("num_temps must be >= 1.")
        self.num_warmup = num_warmup
        self.num_chains = num_chains
        self.num_temps = num_temps
        self.max_inv_temp_ratio = max_inv_temp_ratio
        self.step_size = step_size
        self.num_leapfrog = num_leapfrog
        self.target_accept = target_accept

    def _latent_uuids(self):
        return sampler_latent_uuids(self, "PT-HMC")

    def compute(self, env, ctx):
        C, K = self.num_chains, self.num_temps
        R = C * K                      # replicas on the sample axis
        latent_uuids = self._latent_uuids()
        q0 = init_chains_from_prior(self.model, env, ctx.next_key(),
                                    latent_uuids, R)
        dtype = list(q0.values())[0].dtype
        bij = make_support_transforms(self.model, latent_uuids)
        if bij is not None:
            q0 = bij.unconstrain(q0)

        # geometric beta ladder, tiled per chain: row r = chain r//K,
        # temperature r%K (so adjacent temperatures are adjacent rows)
        betas_k = jnp.asarray(
            np.geomspace(1.0, self.max_inv_temp_ratio, K), dtype=dtype)
        betas = jnp.tile(betas_k, C)                       # (R,)

        def log_post(q):               # (R,) untempered log target
            e = VariableEnv(env)
            e.update(bij.constrain(q) if bij is not None else q)
            lp = sum_log_pdf_terms(
                self.model.log_pdf_terms(e, ctx=ctx), dtype)
            if bij is not None:
                lp = lp + bij.log_jacobian(q).astype(dtype)
            return lp

        def neg_logp_t(q):             # tempered potential
            return -betas * log_post(q)

        grad_U = jax.grad(lambda q: jnp.sum(neg_logp_t(q)))
        # hotter replicas take wider steps
        eps_scale = betas ** -0.5                          # (R,)

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

        def hmc_sweep(q, lp, eps, key):
            """One tempered proposal for all replicas. ``lp`` is the
            CURRENT untempered log_post of q (carried through the scan
            so the model forward runs once per sweep, not three
            times). Returns the new state with its log_post."""
            kp, ka = jax.random.split(key)
            keys = jax.random.split(kp, len(latent_uuids))
            p0 = {u: jax.random.normal(k, q[u].shape, dtype=dtype)
                  for u, k in zip(latent_uuids, keys)}
            H0 = -betas * lp + kinetic(p0)
            q1, p1 = leapfrog(q, p0, eps)
            lp1 = log_post(q1)
            H1 = -betas * lp1 + kinetic(p1)
            dH = H0 - H1
            accept_prob = jnp.minimum(1.0, jnp.exp(dH))
            accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0,
                                    accept_prob)
            accept = jnp.log(jax.random.uniform(
                ka, (R,), dtype=dtype)) < dH
            qn = {u: jnp.where(accept.reshape(bshape(u)), q1[u], q[u])
                  for u in q}
            lpn = jnp.where(accept, lp1, lp)
            return qn, lpn, accept_prob

        # temperature indices within each chain block
        t_idx = jnp.tile(jnp.arange(K), C)                 # (R,)

        def swap_pass(q, lp, parity, key):
            """Even/odd adjacent-pair swaps within each chain block.
            Pair (t, t+1) with t ≡ parity (mod 2): the LOWER row of a
            pair proposes to swap with its +1 neighbor. ``lp`` is the
            carried log_post; the post-swap values are the same
            permutation applied to it (no model evaluation here)."""
            lp_up = jnp.roll(lp, -1)
            beta_up = jnp.roll(betas, -1)
            is_lower = (t_idx % 2 == parity) & (t_idx < K - 1)
            log_alpha = (betas - beta_up) * (lp_up - lp)
            u = jax.random.uniform(key, (R,), dtype=dtype)
            do_swap = is_lower & (jnp.log(u) < log_alpha)  # (R,)
            take_next = do_swap                            # row r <- r+1
            take_prev = jnp.roll(do_swap, 1)               # row r <- r-1
            qn = {}
            for uu in latent_uuids:
                x = q[uu]
                nxt = jnp.roll(x, -1, axis=0)
                prv = jnp.roll(x, 1, axis=0)
                sel_n = take_next.reshape(bshape(uu))
                sel_p = take_prev.reshape(bshape(uu))
                qn[uu] = jnp.where(sel_n, nxt,
                                   jnp.where(sel_p, prv, x))
            lpn = jnp.where(take_next, lp_up,
                            jnp.where(take_prev, jnp.roll(lp, 1), lp))
            # per-pair acceptance (for diagnostics): mean over proposing
            # rows of this parity
            return qn, lpn, do_swap, is_lower

        # ---- warmup: dual averaging of the base step size on the
        # pooled accept statistic
        eps0 = jnp.asarray(self.step_size, dtype=dtype)
        gamma, t0, kappa = 0.05, 10.0, 0.75
        mu = jnp.log(10.0 * eps0)

        def warmup_body(carry, inp):
            q, lp, log_eps, log_eps_bar, h_bar, t = carry
            i, key = inp
            ks, kw = jax.random.split(key)
            qn, lpn, accept_prob = hmc_sweep(q, lp, jnp.exp(log_eps),
                                             ks)
            qn, lpn, _, _ = swap_pass(qn, lpn, i % 2, kw)
            mean_accept = jnp.mean(accept_prob).astype(dtype)
            t = t + 1.0
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + \
                (self.target_accept - mean_accept) / (t + t0)
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            return (qn, lpn, log_eps, log_eps_bar, h_bar, t), None

        zero = jnp.zeros((), dtype)
        lp0 = log_post(q0)
        carry = (q0, lp0, jnp.log(eps0), jnp.log(eps0), zero, zero)
        steps = jnp.arange(self.num_warmup)
        carry, _ = jax.lax.scan(
            warmup_body, carry,
            (steps, jax.random.split(ctx.next_key(), self.num_warmup)))
        q, lp, _, log_eps_bar, _, _ = carry
        eps = jnp.exp(log_eps_bar)

        # ---- sampling
        def sample_body(carry, inp):
            q, lp = carry
            i, key = inp
            ks, kw = jax.random.split(key)
            qn, lpn, accept_prob = hmc_sweep(q, lp, eps, ks)
            qn, lpn, do_swap, is_lower = swap_pass(qn, lpn, i % 2, kw)
            return (qn, lpn), (qn, accept_prob, do_swap, is_lower)

        steps = jnp.arange(self.num_samples)
        (q, lp), (chain, accept_probs, do_swap, is_lower) = \
            jax.lax.scan(
                sample_body, (q, lp),
                (steps,
                 jax.random.split(ctx.next_key(), self.num_samples)))

        if bij is not None:
            chain = bij.constrain(chain)
        # keep only the cold replicas: rows with t_idx == 0,
        # (S, R, ...) -> (S, C, ...)
        cold = jnp.nonzero(t_idx == 0, size=C)[0]
        targets = self.target_variables if self.target_variables \
            else latent_uuids
        samples = {u: jnp.take(chain[u], cold, axis=1) for u in targets}
        # swap acceptance per adjacent pair, averaged over chains and
        # sweeps (each pair proposes on alternate sweeps)
        prop = is_lower.astype(dtype)
        acc = do_swap.astype(dtype)
        pair_acc = (jnp.sum(acc, axis=0) /
                    jnp.maximum(jnp.sum(prop, axis=0), 1.0))  # (R,)
        pair_acc = jnp.mean(pair_acc.reshape(C, K), axis=0)[:-1]
        diagnostics = {
            "accept_rate": jnp.mean(
                accept_probs, axis=0).reshape(C, K)[:, 0],  # cold (C,)
            "swap_accept_rate": pair_acc,                   # (K-1,)
            "step_size": eps,
            "betas": betas_k,
        }
        return samples, diagnostics


class ParallelTemperingInference(Inference):
    """Driver: ``run(**data)`` returns cold-chain samples {uuid:
    (S, C, *event)} and stores ``.diagnostics`` (per-pair swap
    acceptance = the ladder-health signal)."""

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


ParallelTemperingInference.sample_predictive = \
    HMCInference.sample_predictive
