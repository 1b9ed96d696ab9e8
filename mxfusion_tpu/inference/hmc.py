"""Hamiltonian Monte Carlo over a FactorGraph's latent variables.

No reference counterpart (amzn/MXFusion has no MCMC; SURVEY §2.8 lists
its complete algorithm set). This is a TPU-native extension in the
style the retrieved JAX PPL literature establishes (NumPyro, BlackJAX —
PAPERS.md): the ENTIRE chain — warmup with dual-averaging step-size
adaptation, leapfrog integration, Metropolis correction, sample
collection — is one pure function, ``lax.scan``-ed into a single XLA
program, with chains vectorized along the framework's standard leading
sample axis (so the per-chain joint log-density is just the sum of
``FactorGraph.log_pdf_terms``).

Constrained latents (positive / unit-interval support, declared by the
generating distribution's ``support`` attribute) are reparameterized to
an unconstrained space via log / logit bijectors with the Jacobian
folded into the potential (``SupportTransforms`` below) — the NumPyro
convention. Samples are returned in the native support. Real-valued
latents pay no extra ops (the transform set is None).
"""
import jax
import jax.numpy as jnp
import numpy as np

from .inference import Inference
from .inference_alg import SamplingAlgorithm, VariableEnv
from ..common.exceptions import InferenceError
from ..ops import simplex as simplex_ops


def _per_chain_sum(x):
    """Sum every axis except the leading chain axis."""
    return jnp.sum(x.reshape((x.shape[0], -1)), axis=-1)


# --- shared sampler scaffolding (HMC / ChEES / SGLD / SVGD) -----------

def sampler_latent_uuids(algorithm, name):
    """The latent RANDVAR uuids a sampler targets; raises if none."""
    latents = [v.uuid for v in algorithm.model.get_latent_variables(
        algorithm.observed_variable_UUIDs)]
    if not latents:
        raise InferenceError("{}: the model has no latent variables "
                             "given the observed set.".format(name))
    return latents


def init_chains_from_prior(model, env, key, latent_uuids, num_chains):
    """Ancestral prior draws, broadcast to C entries on the sample
    axis — the standard chain/particle initialization."""
    drawn = model.draw_samples(VariableEnv(env), key, num_samples=num_chains)
    q = {}
    for u in latent_uuids:
        a = drawn[u]
        if a.shape[0] != num_chains:
            a = jnp.broadcast_to(a, (num_chains,) + a.shape[1:])
        q[u] = a
    return q


class SupportTransforms:
    """Bijectors taking constrained latents to an unconstrained sampling
    space (NumPyro-style): positive -> log/exp, unit_interval ->
    logit/sigmoid, simplex -> stick-breaking over the LAST event axis
    (K -> K-1 unconstrained coordinates; shared bijector in
    ops/simplex.py). ``log_jacobian`` is the
    per-chain sum of log|dx/dz| to fold into the potential so the
    chain targets the correct density in z-space."""

    def __init__(self, supports):
        self.supports = supports

    def unconstrain(self, q):
        # boundary guard: a prior draw that underflows to exactly 0 (or
        # rounds to 1) would map to an infinite z0 and permanently stick
        # the chain (accept_prob 0 forever); clip by the dtype's eps
        out = {}
        for u, x in q.items():
            s = self.supports.get(u, "real")
            if s == "positive":
                tiny = jnp.finfo(x.dtype).tiny
                out[u] = jnp.log(jnp.maximum(x, tiny))
            elif s == "unit_interval":
                eps = jnp.finfo(x.dtype).eps
                x = jnp.clip(x, eps, 1.0 - eps)
                out[u] = jnp.log(x) - jnp.log1p(-x)
            elif s == "simplex":
                out[u] = simplex_ops.inverse(x)
            else:
                out[u] = x
        return out

    def constrain(self, z):
        out = {}
        for u, zv in z.items():
            s = self.supports.get(u, "real")
            if s == "positive":
                out[u] = jnp.exp(zv)
            elif s == "unit_interval":
                out[u] = jax.nn.sigmoid(zv)
            elif s == "simplex":
                out[u] = simplex_ops.forward(zv)
            else:
                out[u] = zv
        return out

    def log_jacobian(self, z):
        tot = None
        for u, zv in z.items():
            s = self.supports.get(u, "real")
            if s == "positive":
                term = _per_chain_sum(zv)
            elif s == "unit_interval":
                term = _per_chain_sum(-jax.nn.softplus(zv)
                                      - jax.nn.softplus(-zv))
            elif s == "simplex":
                term = _per_chain_sum(
                    simplex_ops.log_det_jacobian(zv)[..., None])
            else:
                continue
            tot = term if tot is None else tot + term
        return tot


def make_support_transforms(model, latent_uuids):
    """SupportTransforms for the latents whose generating factor
    declares a non-real ``support``; None when every latent is real
    (the common fast path — no extra ops in the potential)."""
    supports = {}
    for u in latent_uuids:
        f = model.variables[u].factor
        supports[u] = getattr(f, "support", "real")
    if all(s == "real" for s in supports.values()):
        return None
    return SupportTransforms(supports)


def sum_log_pdf_terms(terms, dtype):
    """Per-chain total of log_pdf_terms: size-1 sample-axis terms
    broadcast; everything cast to the latent dtype (observed-data
    terms may be wider, e.g. float64 data against float32 chains)."""
    tot = jnp.zeros((), dtype=dtype)
    for t in terms:
        t = t.astype(dtype)
        tot = tot + (t if t.shape[0] != 1 else t[0])
    return tot


def effective_sample_size(samples, max_lag=None):
    """ESS via the initial-monotone-sequence estimator (Geyer 1992)
    over autocorrelations averaged across chains; samples (S, C, ...).
    """
    x = np.asarray(samples)
    S, C = x.shape[:2]
    x = x.reshape(S, C, -1)
    x = x - x.mean(axis=0, keepdims=True)
    max_lag = min(S - 1, max_lag or S - 1)
    var0 = (x ** 2).mean(axis=(0, 1))          # (D,)
    var0 = np.where(var0 == 0, 1.0, var0)
    rho = np.empty((max_lag + 1,) + var0.shape)
    rho[0] = 1.0
    for t in range(1, max_lag + 1):
        rho[t] = (x[:-t] * x[t:]).mean(axis=(0, 1)) / var0
    # sum paired autocorrelations while the pair sums stay positive
    ess = np.empty_like(var0)
    for d in range(var0.shape[0]):
        s = 0.0
        for t in range(1, max_lag, 2):
            pair = rho[t, d] + rho[t + 1, d]
            if pair <= 0:
                break
            s += pair
        ess[d] = S * C / (1.0 + 2.0 * s)
    shape = np.asarray(samples).shape[2:]
    return ess.reshape(shape) if shape else float(ess[0])


def potential_scale_reduction(samples):
    """Split R-hat (Gelman et al.) for samples shaped (S, C, ...)."""
    samples = jnp.asarray(samples)
    S, C = samples.shape[:2]
    half = S // 2
    x = jnp.concatenate([samples[:half], samples[half:2 * half]], axis=1)
    n, m = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=0)
    chain_var = jnp.var(x, axis=0, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    B = n * jnp.var(chain_mean, axis=0, ddof=1)
    var_est = (n - 1) / n * W + B / n
    return jnp.sqrt(var_est / W)


class HMCAlgorithm(SamplingAlgorithm):
    """HMC posterior sampling of the model's latent RANDVARs.

    Parameters
    ----------
    num_samples : int
        Post-warmup draws kept per chain.
    num_warmup : int
        Adaptation draws (dual averaging of the step size toward
        ``target_accept``; discarded).
    num_chains : int
        Chains, vectorized on the sample axis (prior-initialized).
    num_leapfrog : int
    step_size : float
        Initial leapfrog step size (adapted during warmup).
    target_accept : float

    ``compute`` returns ``(samples, diagnostics)``: samples is
    {uuid: (num_samples, num_chains, *event_shape)} over the latent
    (or requested target) variables; diagnostics holds the per-chain
    acceptance rate and the adapted step size.
    """

    def __init__(self, model, observed, num_samples=500, num_warmup=500,
                 num_chains=4, step_size=0.1, num_leapfrog=16,
                 target_accept=0.8, adapt_mass=True,
                 target_variables=None, extra_graphs=None):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples,
                         target_variables=target_variables,
                         extra_graphs=extra_graphs)
        self.num_warmup = num_warmup
        self.num_chains = num_chains
        self.step_size = step_size
        self.num_leapfrog = num_leapfrog
        self.target_accept = target_accept
        # diagonal metric adaptation (Stan-style): first half of warmup
        # estimates per-dimension posterior variance (chains pooled),
        # second half re-adapts the step size under that metric
        self.adapt_mass = adapt_mass

    # ------------------------------------------------------------------
    def _latent_uuids(self):
        return sampler_latent_uuids(self, "HMC")

    def compute(self, env, ctx):
        C = self.num_chains
        latent_uuids = self._latent_uuids()

        # chains initialized by ancestral prior draws (C on sample axis)
        q0 = init_chains_from_prior(self.model, env, ctx.next_key(),
                                    latent_uuids, C)
        dtype0 = list(q0.values())[0].dtype
        bij = make_support_transforms(self.model, latent_uuids)
        if bij is not None:
            q0 = bij.unconstrain(q0)

        def neg_logp(q):  # (C,) potential energy
            e = VariableEnv(env)
            e.update(bij.constrain(q) if bij is not None else q)
            lp = sum_log_pdf_terms(
                self.model.log_pdf_terms(e, ctx=ctx), dtype0)
            if bij is not None:
                lp = lp + bij.log_jacobian(q).astype(dtype0)
            return -lp

        grad_U = jax.grad(lambda q: jnp.sum(neg_logp(q)))

        def kinetic(p, inv_mass):
            k = jnp.zeros((C,), dtype=list(p.values())[0].dtype)
            for u, v in p.items():
                k = k + 0.5 * _per_chain_sum(v ** 2 * inv_mass[u])
            return k

        def leapfrog(q, p, eps, inv_mass):
            g = grad_U(q)
            p = {u: p[u] - 0.5 * eps * g[u] for u in p}

            def body(i, qp):
                q, p = qp
                q = {u: q[u] + eps * inv_mass[u] * p[u] for u in q}
                g = grad_U(q)
                # full momentum step except after the last position step
                scale = jnp.where(i == self.num_leapfrog - 1, 0.5, 1.0)
                p = {u: p[u] - scale * eps * g[u] for u in p}
                return q, p

            q, p = jax.lax.fori_loop(0, self.num_leapfrog, body, (q, p))
            return q, p

        def hmc_step(q, eps, inv_mass, key):
            kp, ka = jax.random.split(key)
            keys = jax.random.split(kp, len(latent_uuids))
            # p ~ N(0, M) with M = 1/inv_mass (diagonal metric)
            p0 = {u: jax.random.normal(k, q[u].shape, dtype=q[u].dtype)
                  / jnp.sqrt(inv_mass[u])
                  for u, k in zip(latent_uuids, keys)}
            H0 = neg_logp(q) + kinetic(p0, inv_mass)
            q1, p1 = leapfrog(q, p0, eps, inv_mass)
            H1 = neg_logp(q1) + kinetic(p1, inv_mass)
            dH = H0 - H1
            log_u = jnp.log(jax.random.uniform(
                ka, (C,), dtype=dH.dtype))
            accept = log_u < dH
            qn = {u: jnp.where(
                accept.reshape((C,) + (1,) * (q[u].ndim - 1)),
                q1[u], q[u]) for u in q}
            accept_prob = jnp.minimum(1.0, jnp.exp(dH))
            # guard NaN trajectories (divergences count as rejections)
            accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0,
                                    accept_prob)
            return qn, jnp.mean(accept_prob), accept_prob

        # ---- warmup: dual averaging (Hoffman & Gelman 2014, §3.2) in
        # two phases: phase 1 adapts the step size under the identity
        # metric while accumulating per-dimension posterior variance
        # (chains pooled); phase 2 re-adapts the step size under the
        # adapted diagonal metric (Stan-style windowed adaptation,
        # collapsed to one window)
        dtype = list(q0.values())[0].dtype
        eps0 = jnp.asarray(self.step_size, dtype=dtype)
        gamma, t0, kappa = 0.05, 10.0, 0.75

        def make_warmup_body(inv_mass, mu, accumulate):
            def warmup_body(carry, key):
                q, log_eps, log_eps_bar, h_bar, t, s1, s2 = carry
                qn, mean_accept, _ = hmc_step(q, jnp.exp(log_eps),
                                              inv_mass, key)
                # observed-data log-pdf terms may be wider (x64) than
                # the latent dtype; keep adaptation at a fixed dtype
                mean_accept = mean_accept.astype(dtype)
                t = t + 1.0
                h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + \
                    (self.target_accept - mean_accept) / (t + t0)
                log_eps = mu - jnp.sqrt(t) / gamma * h_bar
                w = t ** (-kappa)
                log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
                if accumulate:
                    s1 = {u: s1[u] + jnp.sum(qn[u], axis=0) for u in s1}
                    s2 = {u: s2[u] + jnp.sum(qn[u] ** 2, axis=0)
                          for u in s2}
                return (qn, log_eps, log_eps_bar, h_bar, t, s1, s2), None
            return warmup_body

        def run_warmup(q, eps_init, inv_mass, n, accumulate, key):
            zeros = {u: jnp.zeros(q[u].shape[1:], dtype=dtype)
                     for u in q}
            mu = jnp.log(10.0 * eps_init)
            carry = (q, jnp.log(eps_init), jnp.log(eps_init),
                     jnp.zeros((), dtype), jnp.zeros((), dtype),
                     zeros, dict(zeros))
            body = make_warmup_body(inv_mass, mu, accumulate)
            (q, _, log_eps_bar, _, _, s1, s2), _ = jax.lax.scan(
                body, carry, jax.random.split(key, n))
            return q, jnp.exp(log_eps_bar), s1, s2

        unit_mass = {u: jnp.ones(q0[u].shape[1:], dtype=dtype)
                     for u in q0}
        kw1, kw2, ks = jax.random.split(ctx.next_key(), 3)
        if self.adapt_mass and self.num_warmup >= 4:
            n1 = self.num_warmup // 2
            n2 = self.num_warmup - n1
            q, eps, s1, s2 = run_warmup(q0, eps0, unit_mass, n1, True,
                                        kw1)
            n_obs = n1 * C
            var = {u: jnp.clip(s2[u] / n_obs - (s1[u] / n_obs) ** 2,
                               1e-6, 1e6) for u in s1}
            inv_mass = var  # inverse metric = posterior variance (Stan)
            q, eps, _, _ = run_warmup(q, eps, inv_mass, n2, False, kw2)
        else:
            inv_mass = unit_mass
            q, eps, _, _ = run_warmup(q0, eps0, unit_mass,
                                      self.num_warmup, False, kw1)

        # ---- sampling
        def sample_body(q, key):
            qn, _, accept_prob = hmc_step(q, eps, inv_mass, key)
            return qn, (qn, accept_prob)

        _, (chain, accept_probs) = jax.lax.scan(
            sample_body, q, jax.random.split(ks, self.num_samples))

        targets = self.target_variables if self.target_variables \
            else latent_uuids
        if bij is not None:
            chain = bij.constrain(chain)  # back to the native support
        samples = {u: chain[u] for u in targets}
        diagnostics = {
            "accept_rate": jnp.mean(accept_probs, axis=0),  # (C,)
            "step_size": eps,
        }
        return samples, diagnostics


def _chain_convergence_diagnostics(samples):
    """Split R-hat per latent plus the worst value across all latents
    and dimensions — the at-a-glance convergence summary every
    multi-chain driver attaches to its diagnostics."""
    r_hat = {u: np.asarray(potential_scale_reduction(a))
             for u, a in samples.items()
             if np.asarray(a).shape[:2][0] >= 4}
    out = {"r_hat": r_hat}
    if r_hat:
        out["r_hat_max"] = float(max(np.max(v) for v in r_hat.values()))
    return out


class HMCInference(Inference):
    """Driver: ``run(**data)`` returns the posterior sample dict and
    stores ``.diagnostics`` (accept_rate per chain, adapted step size,
    split R-hat per latent and its max across latents).

    Example::

        infr = HMCInference(HMCAlgorithm(model=m, observed=[m.y],
                                         num_samples=500, num_chains=4))
        samples = infr.run(y=y)[q_uuid]      # (500, 4, *event)
        infr.diagnostics["accept_rate"], infr.diagnostics["r_hat_max"]
    """

    def run(self, key=None, **kwargs):
        out = super().run(key=key, **kwargs)
        samples, diagnostics = out
        self.diagnostics = {k: np.asarray(v)
                            for k, v in diagnostics.items()}
        self.diagnostics.update(
            _chain_convergence_diagnostics(samples))
        self._samples = samples
        return samples

    def sample_predictive(self, key=None, samples=None, targets=None,
                          **data):
        """Posterior-predictive draws: ancestral sampling of the model
        with the latents pinned to the stored (or given) HMC draws —
        one draw of every downstream variable per posterior sample.
        Chains merge onto the standard leading sample axis.

        Returns {uuid: (num_samples * num_chains, *event_shape)} for
        ``targets`` (default: the model's leaves not given as data).
        """
        import jax as _jax
        if samples is None:
            samples = getattr(self, "_samples", None)
        if samples is None:
            raise InferenceError("run() the chain before "
                                 "sample_predictive().")
        if key is None:
            key = _jax.random.PRNGKey(0)
        alg = self._algorithm
        flat = {u: jnp.reshape(jnp.asarray(a),
                               (-1,) + tuple(a.shape[2:]))
                for u, a in samples.items()}
        n = list(flat.values())[0].shape[0]
        model = alg.model

        class _Predictive(SamplingAlgorithm):
            def compute(self, env, ctx):
                env = VariableEnv(env)
                env.update(flat)   # pinned latents: sampling skips them
                return self.model.draw_samples(
                    env, ctx.next_key(), num_samples=n,
                    targets=self.target_variables)

        from .inference_alg import create_sampling_executor
        # only the variables actually passed stay observed; the rest
        # (e.g. the training targets) are ancestrally sampled
        observed = [v for v in alg.observed_variables if v.name in data]
        pred_alg = _Predictive(
            model=model, observed=observed, num_samples=n,
            target_variables=[t.uuid if hasattr(t, "uuid") else t
                              for t in targets] if targets else None)
        executor = create_sampling_executor(pred_alg, self.params)
        data_list = [np.asarray(data[v.name]) for v in observed]
        return executor(self.params.trainable_params(),
                        self.params.fixed_params(), data_list, key)
