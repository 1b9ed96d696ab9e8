"""LMC multi-output SVGP regression (beyond-reference).

Oracle tier: the closed-form ELBO and the predictive moments are
re-derived independently in numpy float64. Behavior tier: correlated
outputs are recovered through the shared latents; GSPMD data sharding
leaves the bound bit-identical in value."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg as sla

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import LMCSVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor, ModulePredictionAlgorithm,
    TransferInference, Inference, ForwardSamplingAlgorithm)

M_IND, C, Q = 5, 3, 2


def np_rbf(X, X2, lengthscale, variance):
    r2 = (((X / lengthscale)[:, None, :]
           - (X2 / lengthscale)[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * r2)


def _build(ls, var, Z0, Wmix, nv, num_latents=Q, jitter=0.0,
           whitened=False):
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.Y = LMCSVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=2, variance=var, lengthscale=ls,
                          dtype="float64"),
        num_outputs=C, num_latents=num_latents, shape=(m.n, C),
        noise_var=Variable(value=nv),
        mixing_matrix=Variable(shape=Wmix.shape, initial_value=Wmix),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        dtype="float64", jitter=jitter, whitened=whitened)
    return m


def _set_q(infr, m, seed=7):
    post = m.Y.factor._extra_graphs[0]
    rng = np.random.default_rng(seed)
    qU_mean = rng.standard_normal((M_IND, Q)) * 0.5
    W = rng.standard_normal((M_IND, M_IND)) * 0.2 + np.eye(M_IND)
    diag = rng.random(M_IND) * 0.1 + 0.05
    infr.params[post.qU_mean] = jnp.asarray(qU_mean)
    infr.params[post.qU_cov_W] = jnp.asarray(W)
    infr.params[post.qU_cov_diag] = jnp.asarray(diag)
    return qU_mean, W, diag


def _numpy_q_moments(X, Z, ls, var, qU_mean, W, diag):
    """Independent float64 re-derivation of the latent q(g) moments."""
    Kuu = np_rbf(Z, Z, ls, var)
    Kuf = np_rbf(Z, X, ls, var)
    Kff_diag = np.full(X.shape[0], var)
    S = W @ W.T + np.diag(diag)
    L = np.linalg.cholesky(Kuu)
    Ls = np.linalg.cholesky(S)
    Linvmu = sla.solve_triangular(L, qU_mean, lower=True)
    LinvLs = sla.solve_triangular(L, Ls, lower=True)
    LinvKuf = sla.solve_triangular(L, Kuf, lower=True)
    mu_g = LinvKuf.T @ Linvmu                              # (N, Q)
    var_g = Kff_diag - np.square(LinvKuf).sum(0) \
        + np.square(LinvLs.T @ LinvKuf).sum(0)             # (N,)
    return mu_g, var_g, Linvmu, LinvLs


def test_lmc_elbo_vs_numpy():
    rng = np.random.default_rng(0)
    N, ls, var, nv = 12, 0.9, 1.3, 0.07
    X = rng.random((N, 2)) * 4
    Y = rng.standard_normal((N, C))
    Z0 = rng.random((M_IND, 2)) * 4
    Wmix = rng.standard_normal((Q, C))

    m = _build(ls, var, Z0, Wmix, nv)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    qU_mean, W, diag = _set_q(infr, m)
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, Y],
                    jax.random.PRNGKey(0))
    result = -float(np.asarray(loss))

    mu_g, var_g, Linvmu, LinvLs = _numpy_q_moments(
        X, Z0, ls, var, qU_mean, W, diag)
    mean = mu_g @ Wmix
    w2 = np.square(Wmix).sum(0)                            # (C,)
    var_y = var_g[:, None] * w2[None, :]
    ll = -0.5 * (np.log(2 * np.pi * nv)
                 + (np.square(Y - mean) + var_y) / nv).sum()
    M = M_IND
    neg_kl = (M / 2.0 + np.log(np.diag(LinvLs)).sum()) * Q \
        - 0.5 * np.square(LinvLs).sum() * Q \
        - 0.5 * np.square(Linvmu).sum()
    np.testing.assert_allclose(result, ll + neg_kl, rtol=1e-8)


def test_lmc_prediction_vs_numpy():
    rng = np.random.default_rng(1)
    N, ls, var, nv = 9, 1.1, 0.8, 0.05
    X = rng.random((N, 2)) * 4
    Y = rng.standard_normal((N, C))
    Xt = rng.random((7, 2)) * 4
    Z0 = rng.random((M_IND, 2)) * 4
    Wmix = rng.standard_normal((Q, C))

    m = _build(ls, var, Z0, Wmix, nv)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    qU_mean, W, diag = _set_q(infr, m, seed=3)

    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params, dtype="float64")
    mu, v = pred.run(X=Xt)[0]
    mu = np.asarray(mu)[0]
    v = np.asarray(v)[0]

    mu_g, var_g, _, _ = _numpy_q_moments(
        Xt, Z0, ls, var, qU_mean, W, diag)
    np.testing.assert_allclose(mu, mu_g @ Wmix, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        v, var_g[:, None] * np.square(Wmix).sum(0)[None, :],
        rtol=1e-7, atol=1e-10)


def test_lmc_whitened_matches_unwhitened_elbo():
    # whitened coords: v = L^{-1} u. Setting q_white(v) = N(L^{-1}m,
    # L^{-1} S L^{-T}) must give the SAME bound value.
    rng = np.random.default_rng(2)
    N, ls, var, nv = 10, 0.9, 1.3, 0.1
    X = rng.random((N, 2)) * 4
    Y = rng.standard_normal((N, C))
    Z0 = rng.random((M_IND, 2)) * 4
    Wmix = rng.standard_normal((Q, C))

    m = _build(ls, var, Z0, Wmix, nv)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    qU_mean, W, diag = _set_q(infr, m, seed=5)
    ex = create_executor(alg, infr.params)
    plain = -float(np.asarray(ex(
        infr.params.trainable_params(), infr.params.fixed_params(),
        [X, Y], jax.random.PRNGKey(0))[0]))

    Kuu = np_rbf(Z0, Z0, ls, var)
    L = np.linalg.cholesky(Kuu)
    S = W @ W.T + np.diag(diag)
    Sw = sla.solve_triangular(L, sla.solve_triangular(
        L, S, lower=True).T, lower=True).T
    Lw = np.linalg.cholesky(Sw)
    mw = sla.solve_triangular(L, qU_mean, lower=True)

    m2 = _build(ls, var, Z0, Wmix, nv, whitened=True)
    alg2 = MAP(model=m2, observed=[m2.X, m2.Y])
    infr2 = GradBasedInference(inference_algorithm=alg2,
                               dtype="float64")
    infr2.initialize(X=X, Y=Y)
    post2 = m2.Y.factor._extra_graphs[0]
    infr2.params[post2.qU_mean] = jnp.asarray(mw)
    infr2.params[post2.qU_cov_W] = jnp.asarray(Lw)
    infr2.params[post2.qU_cov_diag] = jnp.asarray(
        np.full(M_IND, 1e-300))  # S already = Lw Lw^T
    ex2 = create_executor(alg2, infr2.params)
    white = -float(np.asarray(ex2(
        infr2.params.trainable_params(), infr2.params.fixed_params(),
        [X, Y], jax.random.PRNGKey(0))[0]))
    np.testing.assert_allclose(white, plain, rtol=1e-7)


def test_lmc_training_recovers_correlated_outputs():
    rng = np.random.default_rng(4)
    N = 90
    X = np.sort(rng.random((N, 1)) * 6, axis=0)
    G = np.stack([np.sin(X[:, 0]), np.cos(1.3 * X[:, 0])], -1)
    Wtrue = np.array([[1.0, 0.5, -1.0], [0.2, -0.8, 0.4]])
    Y = G @ Wtrue + rng.standard_normal((N, C)) * 0.05

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.Y = LMCSVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        num_outputs=C, num_latents=Q, shape=(m.n, C),
        inducing_inputs=Variable(
            shape=(12, 1),
            initial_value=np.linspace(0.1, 5.9, 12)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    loss = float(np.asarray(infr.run(
        X=X, Y=Y, max_iter=800, learning_rate=0.03, verbose=False)))
    assert np.isfinite(loss)
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, var = pred.run(X=X)[0]
    mu = np.asarray(mu)[0]
    rmse = np.sqrt(((mu - Y) ** 2).mean())
    assert rmse < 0.1, rmse
    assert np.all(np.asarray(var) > 0)


def test_lmc_sharded_elbo_equals_unsharded():
    from mxfusion_tpu.parallel import make_mesh, shard_data
    rng = np.random.default_rng(5)
    N = 160
    X = rng.random((N, 2)) * 4
    Y = rng.standard_normal((N, C))
    Z0 = rng.random((M_IND, 2)) * 4
    Wmix = rng.standard_normal((Q, C))
    m = _build(0.9, 1.3, Z0, Wmix, 0.1, jitter=1e-8)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    ex = create_executor(alg, infr.params)
    tr = infr.params.trainable_params()
    fx = infr.params.fixed_params()
    plain, _, _ = jax.jit(ex)(tr, fx, [jnp.asarray(X), jnp.asarray(Y)],
                              jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    sharded, _, _ = jax.jit(ex)(tr, fx, shard_data(mesh, [X, Y]),
                                jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(np.asarray(plain)),
                               float(np.asarray(sharded)), rtol=1e-10)


def test_lmc_forward_sampling_shapes():
    rng = np.random.default_rng(6)
    N = 10
    X = rng.random((N, 2)) * 4
    Z0 = rng.random((M_IND, 2)) * 4
    Wmix = rng.standard_normal((Q, C))
    m = _build(1.0, 1.0, Z0, Wmix, 0.01, jitter=1e-8)
    alg = ForwardSamplingAlgorithm(model=m, observed=[m.X],
                                   num_samples=6,
                                   target_variables=[m.Y.uuid])
    infr = Inference(inference_algorithm=alg, dtype="float64")
    out = infr.run(X=X, key=jax.random.PRNGKey(0))
    s = np.asarray(out[0])
    assert s.shape == (6, N, C)
    assert np.isfinite(s).all()


def test_lmc_full_output_covariance():
    # full cross-output covariance: var_n * W^T W (+ noise diag), with
    # the diagonal equal to the diagonal-variance path
    from mxfusion_tpu.modules.gp_modules.lmc_svgp import \
        LMCSVGPMeanVariancePrediction
    from mxfusion_tpu.inference import TransferInference
    rng = np.random.default_rng(11)
    N, ls, var, nv = 9, 1.1, 0.8, 0.05
    X = rng.random((N, 2)) * 4
    Y = rng.standard_normal((N, C))
    Xt = rng.random((7, 2)) * 4
    Z0 = rng.random((M_IND, 2)) * 4
    Wmix = rng.standard_normal((Q, C))
    m = _build(ls, var, Z0, Wmix, nv)
    alg0 = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg0,
                              dtype="float64")
    infr.initialize(X=X, Y=Y)
    qU_mean, W, diag = _set_q(infr, m, seed=13)

    mod = m.Y.factor
    alg = LMCSVGPMeanVariancePrediction(
        mod._module_graph, mod._extra_graphs[0],
        [v for _, v in mod.inputs], noise_free=False,
        full_output_cov=True)
    alg.target_variables = [mod._module_graph.Y.uuid]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params, dtype="float64")
    mu_d, var_d = pred.run(X=Xt)[0]           # diagonal path

    from mxfusion_tpu.inference import create_sampling_executor
    ex = create_sampling_executor(alg, infr.params)
    (mu_f, cov_f) = ex(infr.params.trainable_params(),
                       infr.params.fixed_params(), [np.asarray(Xt)],
                       jax.random.PRNGKey(0))[0]
    mu_f, cov_f = np.asarray(mu_f)[0], np.asarray(cov_f)[0]
    np.testing.assert_allclose(mu_f, np.asarray(mu_d)[0], rtol=1e-10)

    mu_g, var_g, _, _ = _numpy_q_moments(Xt, Z0, ls, var, qU_mean, W,
                                         diag)
    cov_np = var_g[:, None, None] * (Wmix.T @ Wmix)[None] \
        + np.eye(C) * nv
    np.testing.assert_allclose(cov_f, cov_np, rtol=1e-7, atol=1e-10)
    # diagonal agrees with the diagonal-variance path + noise
    np.testing.assert_allclose(
        np.diagonal(cov_f, axis1=-2, axis2=-1),
        np.asarray(var_d)[0] + nv, rtol=1e-7)
