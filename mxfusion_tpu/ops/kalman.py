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


def kalman_filter(y, A, H, Q, R, m0, P0, mask=None):
    """Forward filter; returns a dict with

    - ``loglik``: scalar  log p(y_{0:T-1})
    - ``filtered_means`` (T, D), ``filtered_covs`` (T, D, D)
    - ``pred_means`` (T, D), ``pred_covs`` (T, D, D): p(x_t | y_{<t})
    - ``y_pred_means`` (T, E), ``y_pred_vars`` (T, E): one-step-ahead
      observation predictive (diagonal)

    ``mask`` (T,) marks observed steps (1) vs missing (0): missing
    steps contribute nothing to the likelihood and perform a pure
    predict (their y values may be arbitrary placeholders, including
    NaN-free garbage) — irregularly sampled series filter exactly.
    """
    y = jnp.asarray(y)
    A, H, Q, R, m0, P0 = (jnp.asarray(a, dtype=y.dtype)
                          for a in (A, H, Q, R, m0, P0))
    E = y.shape[-1]
    eye_d = jnp.eye(A.shape[-1], dtype=y.dtype)
    if mask is None:
        mask = jnp.ones(y.shape[0], dtype=y.dtype)
    else:
        mask = jnp.asarray(mask, dtype=y.dtype).reshape(y.shape[0])

    def step(carry, inp):
        m, P, first = carry
        y_t, obs = inp
        # no transition into t=0: the prior N(m0, P0) IS the predictive
        m_pred = jnp.where(first, m, A @ m)
        AP = p_einsum("ij,jk->ik", A, P)
        P_pred = jnp.where(
            first, P, p_einsum("ij,kj->ik", AP, A) + Q)
        S = p_einsum("ij,jk->ik",
                     p_einsum("ij,jk->ik", H, P_pred),
                     H.T) + R
        L = jnp.linalg.cholesky(S)
        Hm = H @ m_pred
        # sanitize the placeholder at missing steps BEFORE arithmetic
        innov = jnp.where(obs > 0, y_t - Hm, jnp.zeros_like(y_t))
        alpha = jsl.cho_solve((L, True), innov)
        PHt = p_einsum("ij,kj->ik", P_pred, H)
        K = jsl.cho_solve((L, True), PHt.T).T
        m_new = m_pred + obs * (K @ innov)
        IKH = eye_d - K @ H
        P_up = p_einsum("ij,kj->ik",
                        p_einsum("ij,jk->ik", IKH, P_pred), IKH) \
            + p_einsum("ij,jk,lk->il", K, R, K)
        P_new = obs * P_up + (1.0 - obs) * P_pred
        ll_t = obs * (-0.5 * (E * _LOG2PI
                              + 2.0 * jnp.sum(jnp.log(
                                  jnp.diagonal(L)))
                              + innov @ alpha))
        y_var = jnp.diagonal(S)
        out = (m_new, P_new, m_pred, P_pred, Hm, y_var, ll_t)
        return (m_new, P_new, jnp.zeros((), bool)), out

    init = (m0, P0, jnp.ones((), bool))
    _, (ms, Ps, mp, Pp, ym, yv, lls) = jax.lax.scan(
        step, init, (y, mask))
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


def kalman_filter_parallel(y, A, H, Q, R, m0, P0):
    """Parallel-in-time Kalman filter via ``lax.associative_scan``
    (Särkkä & García-Fernández 2021, "Temporal Parallelization of
    Bayesian Smoothers", IEEE TAC — filtering elements eq. 10-12):
    log-depth over T on parallel hardware instead of the sequential
    scan's O(T) critical path. Returns the same dict as
    :func:`kalman_filter` (verified equal in tests); the log-likelihood
    and predictives are recovered from the prefix results with one
    batched post-pass (no scan).

    Each element a_t = (A_t, b_t, C_t, eta_t, J_t) parameterizes
    p(x_t | y_t, x_{t-1}) = N(A_t x_{t-1} + b_t, C_t) plus the
    information pair (eta, J) of the likelihood message; composition is
    associative, so the all-prefix combine gives every filtering
    marginal at once.
    """
    y = jnp.asarray(y)
    A, H, Q, R, m0, P0 = (jnp.asarray(a, dtype=y.dtype)
                          for a in (A, H, Q, R, m0, P0))
    T = y.shape[0]
    D = A.shape[-1]
    E = y.shape[-1]
    eye_d = jnp.eye(D, dtype=y.dtype)
    return _kalman_filter_parallel(y, A, H, Q, R, m0, P0, T, D, E,
                                   eye_d)


def _kalman_filter_parallel(y, A, H, Q, R, m0, P0, T, D, E, eye_d):
    # Every product here feeds covariance algebra ending in a Cholesky
    # — pin full precision INSIDE this function so it is bf16-safe
    # standalone (TPU matmuls default to bf16 passes, CLAUDE.md; the
    # context also covers the solve/LU internals, which the pinned
    # einsum wrapper cannot reach)
    with jax.default_matmul_precision("highest"):
        return _kalman_filter_parallel_impl(y, A, H, Q, R, m0, P0, T,
                                            D, E, eye_d)


def _kalman_filter_parallel_impl(y, A, H, Q, R, m0, P0, T, D, E,
                                 eye_d):
    # generic element (t >= 1): predictive covariance entering the
    # element is Q (conditioning on x_{t-1} is exact)
    S = H @ Q @ H.T + R
    K = jnp.linalg.solve(S, H @ Q).T                     # Q H^T S^-1
    A_el = (eye_d - K @ H) @ A
    C_el = (eye_d - K @ H) @ Q
    HtSinv = jnp.linalg.solve(S, H).T                    # H^T S^-1
    b_el = y[1:] @ K.T                                   # (T-1, D)
    eta_el = y[1:] @ (A.T @ HtSinv).T                    # (T-1, D)
    J_el = A.T @ HtSinv @ H @ A

    # first element: absorb the prior N(m0, P0) and y_0 (A_0 = 0)
    S0 = H @ P0 @ H.T + R
    K0 = jnp.linalg.solve(S0, H @ P0).T
    b0 = m0 + K0 @ (y[0] - H @ m0)
    C0 = (eye_d - K0 @ H) @ P0

    As = jnp.concatenate([jnp.zeros((1, D, D), y.dtype),
                          jnp.broadcast_to(A_el, (T - 1, D, D))])
    bs = jnp.concatenate([b0[None], b_el])
    Cs = jnp.concatenate([C0[None],
                          jnp.broadcast_to(C_el, (T - 1, D, D))])
    etas = jnp.concatenate([jnp.zeros((1, D), y.dtype), eta_el])
    Js = jnp.concatenate([jnp.zeros((1, D, D), y.dtype),
                          jnp.broadcast_to(J_el, (T - 1, D, D))])

    def combine(a, b):
        A1, b1, C1, e1, J1 = a
        A2, b2, C2, e2, J2 = b
        I = jnp.broadcast_to(eye_d, C1.shape)
        # X @ inv(M) = solve(M^T, X^T)^T, batched over the time axis
        IC = I + C1 @ J2
        A2M = jnp.linalg.solve(jnp.swapaxes(IC, -1, -2),
                               jnp.swapaxes(A2, -1, -2))
        A2M = jnp.swapaxes(A2M, -1, -2)                  # A2 (I+C1J2)^-1
        N = I + J2 @ C1
        A1tN = jnp.linalg.solve(jnp.swapaxes(N, -1, -2), A1)
        A1tN = jnp.swapaxes(A1tN, -1, -2)                # A1^T (I+J2C1)^-1
        An = A2M @ A1
        bn = (A2M @ (b1 + (C1 @ e2[..., None])[..., 0]
                     )[..., None])[..., 0] + b2
        Cn = A2M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
        en = (A1tN @ (e2 - (J2 @ b1[..., None])[..., 0]
                      )[..., None])[..., 0] + e1
        Jn = A1tN @ J2 @ A1 + J1
        return An, bn, Cn, en, Jn

    _, ms, Ps, _, _ = jax.lax.associative_scan(
        combine, (As, bs, Cs, etas, Js), axis=0)

    # predictives and log-likelihood: one batched post-pass
    mp = jnp.concatenate([m0[None], ms[:-1] @ A.T])
    Pp = jnp.concatenate([P0[None],
                          A @ Ps[:-1] @ A.T + Q])
    Sp = (H @ Pp) @ H.T + R
    innov = y - mp @ H.T
    Lp = jnp.linalg.cholesky(Sp)
    alpha = jsl.cho_solve((Lp, True), innov[..., None])[..., 0]
    lls = -0.5 * (E * _LOG2PI
                  + 2.0 * jnp.sum(jnp.log(
                      jnp.diagonal(Lp, axis1=-2, axis2=-1)), axis=-1)
                  + jnp.sum(innov * alpha, axis=-1))
    return {"loglik": jnp.sum(lls), "filtered_means": ms,
            "filtered_covs": Ps, "pred_means": mp, "pred_covs": Pp,
            "y_pred_means": mp @ H.T,
            "y_pred_vars": jnp.diagonal(Sp, axis1=-2, axis2=-1)}


def rts_smoother_parallel(filtered_means, filtered_covs, pred_means,
                          pred_covs, A):
    """Parallel-in-time RTS smoother via ``lax.associative_scan``
    (Särkkä & García-Fernández 2021, smoothing elements §IV): each
    element a_t = (E_t, g_t, L_t) parameterizes
    p(x_t | y_{1:t}, x_{t+1}) = N(E_t x_{t+1} + g_t, L_t); the
    REVERSED all-prefix combine yields every smoothing marginal at log
    depth. Matches :func:`rts_smoother` (tested)."""
    ms = jnp.asarray(filtered_means)
    A = jnp.asarray(A, dtype=ms.dtype)
    Ps = jnp.asarray(filtered_covs, dtype=ms.dtype)
    mp = jnp.asarray(pred_means, dtype=ms.dtype)
    Pp = jnp.asarray(pred_covs, dtype=ms.dtype)
    with jax.default_matmul_precision("highest"):
        # smoother gains G_t = P_t A^T Pp_{t+1}^{-1} for t < T-1
        Lp = jnp.linalg.cholesky(Pp[1:])
        PAt = Ps[:-1] @ A.T
        G = jsl.cho_solve((Lp, True),
                          jnp.swapaxes(PAt, -1, -2))
        G = jnp.swapaxes(G, -1, -2)                      # (T-1, D, D)
        E = G
        g = ms[:-1] - (G @ mp[1:, :, None])[..., 0]
        # G Pp G^T == (Ps A^T) G^T exactly (G = Ps A^T Pp^{-1})
        L = Ps[:-1] - PAt @ jnp.swapaxes(G, -1, -2)
        # terminal element: the filtered marginal itself (E = 0)
        D = ms.shape[-1]
        E_all = jnp.concatenate(
            [E, jnp.zeros((1, D, D), ms.dtype)])
        g_all = jnp.concatenate([g, ms[-1:]])
        L_all = jnp.concatenate([L, Ps[-1:]])

        def combine(a, b):
            # reverse-mode associative_scan passes the LATER-time
            # accumulator as `a` and the earlier element as `b`; the
            # smoothing composition is earlier ∘ later
            E2, g2, L2 = a                  # later
            E1, g1, L1 = b                  # earlier
            return (E1 @ E2,
                    (E1 @ g2[..., None])[..., 0] + g1,
                    E1 @ L2 @ jnp.swapaxes(E1, -1, -2) + L1)

        E_s, m_s, P_s = jax.lax.associative_scan(
            combine, (E_all, g_all, L_all), axis=0, reverse=True)
    return m_s, P_s
