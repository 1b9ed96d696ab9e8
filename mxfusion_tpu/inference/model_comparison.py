"""Model comparison from posterior samples: WAIC and PSIS-LOO.

No reference counterpart (amzn/MXFusion has no model-criticism tier).
Standard definitions (Vehtari, Gelman & Gabry 2017): both start from
the pointwise log-likelihood matrix ``loglik[s, n] = log p(y_n | θ_s)``
over S posterior draws — computed here in ONE batched density
evaluation with the draws on the framework's sample axis.

``waic``: elpd ≈ Σ_n [logmeanexp_s loglik - Var_s loglik].
``loo_psis``: leave-one-out elpd via Pareto-smoothed importance
sampling (raw weights 1/p(y_n|θ_s); the largest 20% replaced by
generalized-Pareto quantiles, Zhang & Stephens 2009 fit), with the
per-point Pareto-k diagnostic.
"""
import numpy as np
import jax.numpy as jnp

from .inference_alg import (SamplingAlgorithm, VariableEnv,
                            create_sampling_executor)
from ..common.exceptions import InferenceError


def pointwise_log_likelihood(infr, samples=None, key=None,
                             has_chain_axis=True, **data):
    """Per-datapoint log-likelihoods under stored posterior draws.

    Parameters
    ----------
    infr : HMCInference / SGLDInference / any Inference whose
        ``_samples`` hold {uuid: (S, C, *event)} draws (or pass
        ``samples`` explicitly).
    has_chain_axis : bool
        False for particle draws shaped (S, *event) with no chain
        axis (SVGDInference).
    data : the observed data arrays by variable name (as in ``run``).

    Returns {observed_name: (S*C, N)} numpy arrays — (S, N) when
    ``has_chain_axis=False`` — the likelihood factor's log-density
    summed over trailing event dims, the leading data axis kept.
    """
    import jax
    alg = infr._algorithm
    if samples is None:
        samples = getattr(infr, "_samples", None)
    if samples is None:
        raise InferenceError("run() the sampler first (or pass "
                             "samples=...).")
    event_from = 2 if has_chain_axis else 1
    flat = {u: jnp.reshape(jnp.asarray(a),
                           (-1,) + tuple(a.shape[event_from:]))
            for u, a in samples.items()}
    S = list(flat.values())[0].shape[0]
    model = alg.model
    observed = [v for v in alg.observed_variables if v.name in data]
    if not observed:
        raise InferenceError(
            "pass the observed data arrays by name, e.g. y=y.")
    from ..modules.module import Module

    class _Pointwise(SamplingAlgorithm):
        def compute(self, env, ctx):
            env = VariableEnv(env)
            env.update(flat)
            # deterministic factors upstream must evaluate first;
            # targets=[] skips every density term (pure env fill)
            model.log_pdf_terms(env, targets=[], ctx=ctx)
            out = {}
            for v in observed:
                f = v.factor
                if isinstance(f, Module):
                    raise InferenceError(
                        "pointwise_log_likelihood needs an explicit "
                        "likelihood factor; Module-valued observations "
                        "({}) marginalize internally.".format(v.name))
                lp = f.log_pdf(env)            # (S, N, *event)
                lp = jnp.sum(lp.reshape(lp.shape[:2] + (-1,)), axis=-1)
                out[v.name] = lp               # (S, N)
            return out

    pw = _Pointwise(model=model, observed=observed, num_samples=S)
    if key is None:
        key = jax.random.PRNGKey(0)
    data_list = [np.asarray(data[v.name]) for v in observed]
    # a minibatch sampler (SGLD) leaves symbolic data dims bound to
    # the BATCH size; re-bind them to the full evaluation shapes for
    # this executor, then restore
    from ..util.inference import discover_shape_constants
    data_shapes = {v.uuid: tuple(np.shape(d))
                   for v, d in zip(observed, data_list)}
    rebound = discover_shape_constants(data_shapes, [model])
    saved = {u: infr.params.constants.get(u) for u in rebound}
    infr.params.constants.update(rebound)
    try:
        executor = create_sampling_executor(pw, infr.params)
        out = executor(infr.params.trainable_params(),
                       infr.params.fixed_params(), data_list, key)
    finally:
        for u, v in saved.items():
            if v is None:
                infr.params.constants.pop(u, None)
            else:
                infr.params.constants[u] = v
    return {k: np.asarray(v) for k, v in out.items()}


def _logmeanexp(a, axis=0):
    m = a.max(axis=axis)
    return m + np.log(np.mean(np.exp(a - m), axis=axis))


def waic(loglik):
    """Widely applicable information criterion.

    ``loglik``: (S, N). Returns dict with ``elpd_waic``, ``p_waic``,
    ``se`` (standard error over data points), ``pointwise``.
    """
    loglik = np.asarray(loglik)
    lppd_i = _logmeanexp(loglik, axis=0)
    p_i = loglik.var(axis=0, ddof=1)
    elpd_i = lppd_i - p_i
    n = loglik.shape[1]
    return {"elpd_waic": float(elpd_i.sum()),
            "p_waic": float(p_i.sum()),
            "se": float(np.sqrt(n * elpd_i.var(ddof=1))),
            "pointwise": elpd_i}


def _gpd_fit(x):
    """Generalized-Pareto (xi, sigma) fit to exceedances x > 0 —
    the Zhang & Stephens (2009) posterior-mean estimator in the
    STANDARD xi convention (xi > 0 = heavy tail), with the weak
    Vehtari-et-al. prior pulling xi toward 0.5 at tiny n."""
    x = np.sort(np.asarray(x))
    n = len(x)
    if n < 5:
        return 0.5, max(float(np.mean(x)), 1e-12)
    prior_bs, prior_k = 3.0, 10.0
    m_est = 30 + int(np.sqrt(n))
    b = 1.0 - np.sqrt(m_est / (np.arange(1, m_est + 1) - 0.5))
    b = b / (prior_bs * x[int(n / 4 + 0.5) - 1]) + 1.0 / x[-1]
    # theta-profile log-likelihood; k here = -xi (the Z&S internal k)
    k = np.mean(np.log1p(-b[:, None] * x[None, :]), axis=1)
    l_b = n * (np.log(-b / k) - k - 1.0)
    w = np.exp(l_b - l_b.max())
    w = w / w.sum()
    b_post = np.sum(b * w)
    k_post = np.mean(np.log1p(-b_post * x))
    sigma = -k_post / b_post
    # k_post = mean(log1p(-b x)) = -k_ZS = +xi; regularize toward 0.5
    # (weakly informative prior) and report the standard xi
    xi = (n * k_post + prior_k * 0.5) / (n + prior_k)
    return float(xi), float(sigma)


def _gpd_quantiles(p, xi, sigma):
    """Inverse CDF of GPD(xi, sigma): sigma/xi ((1-p)^-xi - 1)."""
    if abs(xi) < 1e-12:
        return -sigma * np.log1p(-p)
    return sigma * np.expm1(-xi * np.log1p(-p)) / xi


def loo_psis(loglik):
    """PSIS-LOO: Pareto-smoothed importance-sampling leave-one-out.

    ``loglik``: (S, N). Returns dict with ``elpd_loo``, ``p_loo``,
    ``se``, ``pareto_k`` (per-point diagnostic; k > 0.7 flags
    unreliable points), ``pointwise``.
    """
    def logsumexp(a):
        m = a.max()
        return m + np.log(np.sum(np.exp(a - m)))

    loglik = np.asarray(loglik)
    S, N = loglik.shape
    logw = -loglik                       # raw IS log-weights
    logw = logw - logw.max(axis=0)
    elpd_i = np.empty(N)
    ks = np.empty(N)
    M = int(min(0.2 * S, 3 * np.sqrt(S)))
    for n in range(N):
        lw = logw[:, n].copy()
        if M >= 5:
            order = np.argsort(lw)
            tail = order[-M:]
            cutoff = np.exp(lw[order[-M - 1]])
            exceed = np.exp(lw[tail]) - cutoff
            k, sigma = _gpd_fit(exceed)
            ks[n] = k
            if np.isfinite(k):
                # replace the tail by GPD quantiles (smoothing)
                p = (np.arange(1, M + 1) - 0.5) / M
                smoothed = cutoff + _gpd_quantiles(p, k, sigma)
                lw[tail] = np.log(np.maximum(smoothed, 1e-300))
                # PSIS truncation at the raw maximum
                lw = np.minimum(lw, logw[:, n].max())
        else:
            # too few draws for a tail fit: plain (truncated) IS,
            # diagnostic unavailable
            ks[n] = np.nan
        lw = lw - logsumexp(lw)          # normalized log-weights
        elpd_i[n] = logsumexp(lw + loglik[:, n])
    lppd_i = _logmeanexp(loglik, axis=0)
    return {"elpd_loo": float(elpd_i.sum()),
            "p_loo": float((lppd_i - elpd_i).sum()),
            "se": float(np.sqrt(N * elpd_i.var(ddof=1))),
            "pareto_k": ks,
            "pointwise": elpd_i}


def posterior_predictive_check(infr, statistic, observed_name,
                               key=None, **data):
    """Bayesian posterior predictive check (Gelman et al., BDA ch. 6).

    Replicates the observed variable from the stored posterior draws
    (one y_rep per draw via ``sample_predictive``), evaluates a test
    statistic on each replicate and on the real data, and returns the
    posterior predictive p-value  P(T(y_rep) >= T(y_obs)).

    Parameters
    ----------
    infr : a sampler Inference (HMC/ChEES/SGLD/SVGD) that has run.
    statistic : callable(ndarray) -> float, evaluated on one
        replicate's event array (e.g. ``lambda y: y.var()``).
    observed_name : name of the checked variable; its real data must be
        in ``data`` and is EXCLUDED from conditioning.
    data : observed arrays by name (conditioning inputs + the checked
        variable's realization).

    Returns dict with ``p_value``, ``T_obs``, ``T_rep`` (per-draw
    statistics). Extreme p-values (< 0.05 or > 0.95) flag aspects of
    the data the model cannot reproduce.
    """
    if observed_name not in data:
        raise InferenceError(
            "pass the checked variable's data, e.g. {}=y."
            .format(observed_name))
    y_obs = np.asarray(data[observed_name])
    cond = {k: v for k, v in data.items() if k != observed_name}
    target = getattr(infr._algorithm.model, observed_name)
    (y_rep,) = infr.sample_predictive(key=key, targets=[target.uuid],
                                      **cond)
    y_rep = np.asarray(y_rep)
    T_rep = np.asarray([float(statistic(y_rep[s]))
                        for s in range(y_rep.shape[0])])
    T_obs = float(statistic(y_obs))
    return {"p_value": float(np.mean(T_rep >= T_obs)),
            "T_obs": T_obs, "T_rep": T_rep}
