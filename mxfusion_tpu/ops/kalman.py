"""Kalman filtering / RTS smoothing / LGSSM simulation.

Beyond the reference (amzn/MXFusion has no temporal models). These are
the pure-array workhorses behind the ``LinearGaussianSSM`` distribution
(components/distributions/ssm.py): a linear-Gaussian state-space model

    x_t = A x_{t-1} + w_t,   w_t ~ N(0, Q)        (t = 1..T-1)
    y_t = H x_t + v_t,       v_t ~ N(0, R)        (t = 0..T-1)
    x_0 ~ N(m0, P0)

TPU shape: one ``lax.scan`` over time with (D, D)/(E, E) dense algebra
per step — the standard sequential filter (time recursions are
inherently serial; state dims ride the MXU). All covariance
propagation uses the Joseph form and Cholesky solves for stability;
matrix products that feed a Cholesky stay on the precision-pinned
einsum path (CLAUDE.md).
"""
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .precision import einsum as p_einsum

_LOG2PI = 1.8378770664093453


def kalman_filter(y, A, H, Q, R, m0, P0):
    """Forward filter; returns a dict with

    - ``loglik``: scalar  log p(y_{0:T-1})
    - ``filtered_means`` (T, D), ``filtered_covs`` (T, D, D)
    - ``pred_means`` (T, D), ``pred_covs`` (T, D, D): p(x_t | y_{<t})
    - ``y_pred_means`` (T, E), ``y_pred_vars`` (T, E): one-step-ahead
      observation predictive (diagonal)
    """
    y = jnp.asarray(y)
    A, H, Q, R, m0, P0 = (jnp.asarray(a, dtype=y.dtype)
                          for a in (A, H, Q, R, m0, P0))
    E = y.shape[-1]
    eye_d = jnp.eye(A.shape[-1], dtype=y.dtype)

    def step(carry, y_t):
        m, P, first = carry
        # no transition into t=0: the prior N(m0, P0) IS the predictive
        m_pred = jnp.where(first, m, A @ m)
        AP = p_einsum("ij,jk->ik", A, P)
        P_pred = jnp.where(
            first, P, p_einsum("ij,kj->ik", AP, A) + Q)
        S = p_einsum("ij,jk->ik",
                     p_einsum("ij,jk->ik", H, P_pred),
                     H.T) + R
        L = jnp.linalg.cholesky(S)
        innov = y_t - H @ m_pred
        alpha = jsl.cho_solve((L, True), innov)
        PHt = p_einsum("ij,kj->ik", P_pred, H)
        K = jsl.cho_solve((L, True), PHt.T).T
        m_new = m_pred + K @ innov
        IKH = eye_d - K @ H
        P_new = p_einsum("ij,kj->ik",
                         p_einsum("ij,jk->ik", IKH, P_pred), IKH) \
            + p_einsum("ij,jk,lk->il", K, R, K)
        ll_t = -0.5 * (E * _LOG2PI
                       + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
                       + innov @ alpha)
        Hm = H @ m_pred
        y_var = jnp.diagonal(S)
        out = (m_new, P_new, m_pred, P_pred, Hm, y_var, ll_t)
        return (m_new, P_new, jnp.zeros((), bool)), out

    init = (m0, P0, jnp.ones((), bool))
    _, (ms, Ps, mp, Pp, ym, yv, lls) = jax.lax.scan(step, init, y)
    return {"loglik": jnp.sum(lls), "filtered_means": ms,
            "filtered_covs": Ps, "pred_means": mp, "pred_covs": Pp,
            "y_pred_means": ym, "y_pred_vars": yv}


def rts_smoother(filtered_means, filtered_covs, pred_means, pred_covs,
                 A):
    """Rauch-Tung-Striebel backward pass over filter outputs; returns
    (smoothed_means (T, D), smoothed_covs (T, D, D))."""
    filtered_means = jnp.asarray(filtered_means)
    A = jnp.asarray(A, dtype=filtered_means.dtype)

    def step(carry, inp):
        ms_next, Ps_next = carry
        m, P, mp_next, Pp_next = inp
        # G = P A^T Pp_next^{-1} via Cholesky solve
        Lp = jnp.linalg.cholesky(Pp_next)
        PAt = p_einsum("ij,kj->ik", P, A)
        G = jsl.cho_solve((Lp, True), PAt.T).T
        m_s = m + G @ (ms_next - mp_next)
        P_s = P + p_einsum("ij,jk,lk->il", G, Ps_next - Pp_next, G)
        return (m_s, P_s), (m_s, P_s)

    mT = filtered_means[-1]
    PT = filtered_covs[-1]
    inputs = (filtered_means[:-1], filtered_covs[:-1],
              pred_means[1:], pred_covs[1:])
    _, (ms, Ps) = jax.lax.scan(step, (mT, PT), inputs, reverse=True)
    return (jnp.concatenate([ms, mT[None]], axis=0),
            jnp.concatenate([Ps, PT[None]], axis=0))


def lgssm_sample(key, T, A, H, Q, R, m0, P0, dtype=None):
    """Simulate one trajectory; returns (x (T, D), y (T, E))."""
    D = A.shape[-1]
    E = H.shape[-2]
    dtype = dtype or A.dtype
    kx0, kw, kv = jax.random.split(key, 3)
    Lq = jnp.linalg.cholesky(Q)
    Lr = jnp.linalg.cholesky(R)
    L0 = jnp.linalg.cholesky(P0)
    x0 = m0 + L0 @ jax.random.normal(kx0, (D,), dtype=dtype)
    ws = jax.random.normal(kw, (T - 1, D), dtype=dtype)
    vs = jax.random.normal(kv, (T, E), dtype=dtype)

    def step(x, w):
        xn = A @ x + Lq @ w
        return xn, xn

    _, xs = jax.lax.scan(step, x0, ws)
    x = jnp.concatenate([x0[None], xs], axis=0)
    y = p_einsum("ed,td->te", H, x) + p_einsum("ef,tf->te", Lr, vs)
    return x, y
