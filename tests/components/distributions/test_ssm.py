"""LinearGaussianSSM + ops.kalman.

Oracle tier: the Kalman marginal likelihood, filtered moments, and RTS
smoother are re-derived in an independent numpy sequential
implementation (float64). Behavior tier: MAP through the model IR
recovers the transition matrix; sampling matches the model's
stationary statistics; smoothing beats filtering."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import LinearGaussianSSM
from mxfusion_tpu.ops.kalman import (kalman_filter, rts_smoother,
                                     lgssm_sample)
from mxfusion_tpu.inference import GradBasedInference, MAP

D, E, T = 2, 1, 80
A_TRUE = np.array([[0.9, 0.2], [0.0, 0.7]])
H_TRUE = np.array([[1.0, 0.5]])
Q_TRUE = np.eye(D) * 0.05
R_TRUE = np.eye(E) * 0.1
M0 = np.zeros(D)
P0 = np.eye(D)


def _simulate(seed=0, n_t=T):
    rng = np.random.default_rng(seed)
    x = np.zeros((n_t, D))
    x[0] = rng.multivariate_normal(M0, P0)
    for t in range(1, n_t):
        x[t] = A_TRUE @ x[t - 1] + rng.multivariate_normal(
            np.zeros(D), Q_TRUE)
    y = x @ H_TRUE.T + rng.multivariate_normal(np.zeros(E), R_TRUE,
                                               size=n_t)
    return x, y


def _np_filter(y, A, H, Q, R, m0, P0):
    """Independent numpy sequential Kalman filter."""
    m, P, ll = m0.copy(), P0.copy(), 0.0
    ms, Ps, mps, Pps = [], [], [], []
    for t in range(len(y)):
        if t > 0:
            m = A @ m
            P = A @ P @ A.T + Q
        mps.append(m.copy())
        Pps.append(P.copy())
        S = H @ P @ H.T + R
        innov = y[t] - H @ m
        ll += -0.5 * (len(innov) * np.log(2 * np.pi)
                      + np.linalg.slogdet(S)[1]
                      + innov @ np.linalg.solve(S, innov))
        K = P @ H.T @ np.linalg.inv(S)
        m = m + K @ innov
        P = (np.eye(len(m)) - K @ H) @ P
        ms.append(m.copy())
        Ps.append(P.copy())
    return ll, np.array(ms), np.array(Ps), np.array(mps), np.array(Pps)


def _np_rts(ms, Ps, mps, Pps, A):
    Tn = len(ms)
    sm = ms.copy()
    sP = Ps.copy()
    for t in range(Tn - 2, -1, -1):
        G = Ps[t] @ A.T @ np.linalg.inv(Pps[t + 1])
        sm[t] = ms[t] + G @ (sm[t + 1] - mps[t + 1])
        sP[t] = Ps[t] + G @ (sP[t + 1] - Pps[t + 1]) @ G.T
    return sm, sP


def test_filter_matches_numpy_oracle():
    _, y = _simulate()
    ll_np, ms, Ps, mps, Pps = _np_filter(y, A_TRUE, H_TRUE, Q_TRUE,
                                         R_TRUE, M0, P0)
    out = kalman_filter(jnp.asarray(y), jnp.asarray(A_TRUE),
                        jnp.asarray(H_TRUE), jnp.asarray(Q_TRUE),
                        jnp.asarray(R_TRUE), jnp.asarray(M0),
                        jnp.asarray(P0))
    np.testing.assert_allclose(float(out["loglik"]), ll_np, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["filtered_means"]), ms,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["filtered_covs"]), Ps,
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["pred_means"]), mps,
                               rtol=1e-9, atol=1e-12)


def test_smoother_matches_numpy_and_beats_filter():
    x, y = _simulate(seed=1)
    out = kalman_filter(jnp.asarray(y), jnp.asarray(A_TRUE),
                        jnp.asarray(H_TRUE), jnp.asarray(Q_TRUE),
                        jnp.asarray(R_TRUE), jnp.asarray(M0),
                        jnp.asarray(P0))
    sm, sP = rts_smoother(out["filtered_means"], out["filtered_covs"],
                          out["pred_means"], out["pred_covs"],
                          jnp.asarray(A_TRUE))
    _, ms, Ps, mps, Pps = _np_filter(y, A_TRUE, H_TRUE, Q_TRUE, R_TRUE,
                                     M0, P0)
    sm_np, sP_np = _np_rts(ms, Ps, mps, Pps, A_TRUE)
    np.testing.assert_allclose(np.asarray(sm), sm_np, rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(sP), sP_np, rtol=1e-7,
                               atol=1e-12)
    err_f = np.abs(np.asarray(out["filtered_means"]) - x).mean()
    err_s = np.abs(np.asarray(sm) - x).mean()
    assert err_s < err_f


def _build(A_init):
    m = Model()
    m.A = Variable(shape=(D, D), initial_value=A_init)
    m.y = LinearGaussianSSM.define_variable(
        A=m.A, H=Variable(value=H_TRUE),
        trans_cov=Variable(value=Q_TRUE),
        obs_cov=Variable(value=R_TRUE),
        initial_mean=Variable(value=M0),
        initial_cov=Variable(value=P0), shape=(T, E), dtype="float64")
    return m


def test_log_pdf_through_model_ir_matches_filter():
    _, y = _simulate(seed=2)
    m = _build(A_TRUE)
    infr = GradBasedInference(MAP(model=m, observed=[m.y]),
                              dtype="float64")
    infr.initialize(y=y)
    from mxfusion_tpu.inference import create_executor
    alg = infr._algorithm
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [y],
                    jax.random.PRNGKey(0))
    ll_np, *_ = _np_filter(y, A_TRUE, H_TRUE, Q_TRUE, R_TRUE, M0, P0)
    np.testing.assert_allclose(-float(np.asarray(loss)), ll_np,
                               rtol=1e-10)


def test_map_recovers_transition_matrix():
    # long series, MAP over A only
    _, y = _simulate(seed=3, n_t=400)
    m = Model()
    m.A = Variable(shape=(D, D), initial_value=np.eye(D) * 0.5)
    m.y = LinearGaussianSSM.define_variable(
        A=m.A, H=Variable(value=H_TRUE),
        trans_cov=Variable(value=Q_TRUE),
        obs_cov=Variable(value=R_TRUE),
        initial_mean=Variable(value=M0),
        initial_cov=Variable(value=P0), shape=(400, E),
        dtype="float64")
    infr = GradBasedInference(MAP(model=m, observed=[m.y]),
                              dtype="float64")
    loss = float(np.asarray(infr.run(
        y=y, max_iter=400, learning_rate=0.05, verbose=False)))
    assert np.isfinite(loss)
    A_hat = np.asarray(infr.params[m.A])
    # individual entries/eigenvalues of A are weakly identified from
    # 1-D observations (similarity transforms of the state are
    # invisible); the identifiable requirements are (a) the observable
    # row H A is close and (b) the fitted system explains the data at
    # least as well as the true one
    np.testing.assert_allclose(H_TRUE @ A_hat, H_TRUE @ A_TRUE,
                               atol=0.25)
    ll_hat, *_ = _np_filter(y, A_hat, H_TRUE, Q_TRUE, R_TRUE, M0, P0)
    ll_true, *_ = _np_filter(y, A_TRUE, H_TRUE, Q_TRUE, R_TRUE, M0, P0)
    assert ll_hat >= ll_true - 1.0, (ll_hat, ll_true)


def test_forward_sampling_statistics():
    m = _build(A_TRUE)
    from mxfusion_tpu.inference import Inference, \
        ForwardSamplingAlgorithm
    alg = ForwardSamplingAlgorithm(model=m, observed=[],
                                   num_samples=300,
                                   target_variables=[m.y.uuid])
    infr = Inference(inference_algorithm=alg, dtype="float64")
    out = infr.run(key=jax.random.PRNGKey(0))
    s = np.asarray(out[0])
    assert s.shape == (300, T, E)
    # stationary variance of y under the model: solve the Lyapunov
    # equation for the state covariance numerically by iteration
    P = P0.copy()
    for _ in range(200):
        P = A_TRUE @ P @ A_TRUE.T + Q_TRUE
    var_stat = (H_TRUE @ P @ H_TRUE.T + R_TRUE)[0, 0]
    late = s[:, T // 2:, 0]
    np.testing.assert_allclose(late.var(), var_stat, rtol=0.15)
    np.testing.assert_allclose(late.mean(), 0.0, atol=0.1)


@pytest.mark.slow
def test_hmc_bayesian_noise_posterior():
    # Bayesian structural variant: Gamma prior on the observation
    # variance, HMC through the Kalman marginal likelihood (support
    # bijector handles positivity; the SSM's latent path never appears
    # as a sampled quantity)
    from mxfusion_tpu.components.distributions import Gamma
    from mxfusion_tpu.components.functions.operators import (
        multiply, broadcast_to)
    from mxfusion_tpu.inference.hmc import HMCInference, HMCAlgorithm
    _, y = _simulate(seed=5, n_t=120)
    m = Model()
    m.r = Gamma.define_variable(alpha=2.0, beta=10.0, shape=(1,))
    m.y = LinearGaussianSSM.define_variable(
        A=Variable(value=A_TRUE), H=Variable(value=H_TRUE),
        trans_cov=Variable(value=Q_TRUE),
        obs_cov=multiply(broadcast_to(m.r, (1, 1)),
                         Variable(value=np.eye(1))),
        initial_mean=Variable(value=M0),
        initial_cov=Variable(value=P0), shape=(120, E),
        dtype="float64")
    infr = HMCInference(HMCAlgorithm(
        model=m, observed=[m.y], num_samples=200, num_chains=2,
        num_warmup=200, num_leapfrog=8))
    samples = infr.run(y=y, key=jax.random.PRNGKey(0))
    r = np.asarray(samples[m.r.uuid]).reshape(-1)
    assert np.all(r > 0)
    # true observation variance is 0.1; the posterior must concentrate
    # near it (prior mean 0.2)
    assert 0.05 < r.mean() < 0.2, r.mean()
    assert infr.diagnostics["accept_rate"].min() > 0.5


@pytest.mark.slow
def test_parallel_filter_matches_sequential():
    # the associative-scan filter must agree with the sequential scan
    # on EVERY output (loglik, filtered/pred moments, predictives)
    from mxfusion_tpu.ops.kalman import kalman_filter_parallel
    rng = np.random.default_rng(7)
    Dp, Ep, Tp = 3, 2, 64
    Ap = rng.standard_normal((Dp, Dp)) * 0.3 + np.eye(Dp) * 0.5
    Hp = rng.standard_normal((Ep, Dp))
    Qp = np.eye(Dp) * 0.05 + np.ones((Dp, Dp)) * 0.01
    Rp = np.eye(Ep) * 0.1
    m0p = rng.standard_normal(Dp)
    P0p = np.eye(Dp) * 0.7
    y = rng.standard_normal((Tp, Ep))
    a = kalman_filter(y, Ap, Hp, Qp, Rp, m0p, P0p)
    b = kalman_filter_parallel(y, Ap, Hp, Qp, Rp, m0p, P0p)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-8, atol=1e-10,
                                   err_msg=k)


@pytest.mark.slow
def test_parallel_filter_through_distribution():
    _, y = _simulate(seed=8)
    m_seq = _build(A_TRUE)
    m_par = Model()
    m_par.A = Variable(shape=(D, D), initial_value=A_TRUE)
    m_par.y = LinearGaussianSSM.define_variable(
        A=m_par.A, H=Variable(value=H_TRUE),
        trans_cov=Variable(value=Q_TRUE),
        obs_cov=Variable(value=R_TRUE),
        initial_mean=Variable(value=M0),
        initial_cov=Variable(value=P0), shape=(T, E),
        parallel_filter=True, dtype="float64")
    from mxfusion_tpu.inference import create_executor
    vals = []
    for m in (m_seq, m_par):
        infr = GradBasedInference(MAP(model=m, observed=[m.y]),
                                  dtype="float64")
        infr.initialize(y=y)
        ex = create_executor(infr._algorithm, infr.params)
        loss, _, _ = ex(infr.params.trainable_params(),
                        infr.params.fixed_params(), [y],
                        jax.random.PRNGKey(0))
        vals.append(float(np.asarray(loss)))
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-9)


def _np_filter_masked(y, mask, A, H, Q, R, m0, P0):
    """Numpy filter skipping the update at masked-out steps."""
    m, P, ll = m0.copy(), P0.copy(), 0.0
    for t in range(len(y)):
        if t > 0:
            m = A @ m
            P = A @ P @ A.T + Q
        if mask[t] > 0:
            S = H @ P @ H.T + R
            innov = y[t] - H @ m
            ll += -0.5 * (len(innov) * np.log(2 * np.pi)
                          + np.linalg.slogdet(S)[1]
                          + innov @ np.linalg.solve(S, innov))
            K = P @ H.T @ np.linalg.inv(S)
            m = m + K @ innov
            P = (np.eye(len(m)) - K @ H) @ P
    return ll


def test_masked_filter_matches_numpy_and_ignores_placeholders():
    rng = np.random.default_rng(9)
    _, y = _simulate(seed=9)
    mask = (rng.random(T) < 0.7).astype(np.float64)
    ll_np = _np_filter_masked(y, mask, A_TRUE, H_TRUE, Q_TRUE, R_TRUE,
                              M0, P0)
    out = kalman_filter(y, A_TRUE, H_TRUE, Q_TRUE, R_TRUE, M0, P0,
                        mask=mask)
    np.testing.assert_allclose(float(out["loglik"]), ll_np, rtol=1e-10)
    # poisoned placeholders at masked steps: bit-identical loglik
    y_poison = np.where(mask[:, None] > 0, y, 1e12)
    out2 = kalman_filter(y_poison, A_TRUE, H_TRUE, Q_TRUE, R_TRUE, M0,
                         P0, mask=mask)
    np.testing.assert_allclose(float(out2["loglik"]),
                               float(out["loglik"]), rtol=1e-14)


def test_masked_ssm_through_model_ir():
    rng = np.random.default_rng(10)
    _, y = _simulate(seed=10)
    mask = (rng.random(T) < 0.6).astype(np.float64)
    m = Model()
    m.y = LinearGaussianSSM.define_variable(
        A=Variable(value=A_TRUE), H=Variable(value=H_TRUE),
        trans_cov=Variable(value=Q_TRUE),
        obs_cov=Variable(value=R_TRUE),
        initial_mean=Variable(value=M0),
        initial_cov=Variable(value=P0),
        observation_mask=Variable(value=mask), shape=(T, E),
        dtype="float64")
    infr = GradBasedInference(MAP(model=m, observed=[m.y]),
                              dtype="float64")
    infr.initialize(y=y)
    from mxfusion_tpu.inference import create_executor
    ex = create_executor(infr._algorithm, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [y],
                    jax.random.PRNGKey(0))
    ll_np = _np_filter_masked(y, mask, A_TRUE, H_TRUE, Q_TRUE, R_TRUE,
                              M0, P0)
    np.testing.assert_allclose(-float(np.asarray(loss)), ll_np,
                               rtol=1e-10)


@pytest.mark.slow
def test_parallel_smoother_matches_sequential():
    from mxfusion_tpu.ops.kalman import rts_smoother_parallel
    _, y = _simulate(seed=12)
    out = kalman_filter(y, A_TRUE, H_TRUE, Q_TRUE, R_TRUE, M0, P0)
    sm_seq, sP_seq = rts_smoother(
        out["filtered_means"], out["filtered_covs"],
        out["pred_means"], out["pred_covs"], A_TRUE)
    sm_par, sP_par = rts_smoother_parallel(
        out["filtered_means"], out["filtered_covs"],
        out["pred_means"], out["pred_covs"], A_TRUE)
    np.testing.assert_allclose(np.asarray(sm_par), np.asarray(sm_seq),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sP_par), np.asarray(sP_seq),
                               rtol=1e-7, atol=1e-10)
