"""Multi-class SVGP classification (beyond-reference).

Oracle tier: the MC ELBO is DETERMINISTIC once the normal draws are
injected through FixedRandomGenerator — re-derived independently in
numpy float64. Behavior tier: 3-class training separates clusters."""
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import FixedRandomGenerator
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPMultiClassification
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor, ModulePredictionAlgorithm,
    TransferInference, Inference, ForwardSamplingAlgorithm)

M_IND, C = 5, 3


def np_rbf(X, X2, lengthscale, variance):
    r2 = (((X / lengthscale)[:, None, :]
           - (X2 / lengthscale)[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * r2)


def _build(ls, var, Z0, rand_gen=None, num_mc=4, jitter=0.0):
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.Y = SVGPMultiClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=2, variance=var, lengthscale=ls,
                          dtype="float64"),
        num_classes=C, shape=(m.n, C),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        dtype="float64", jitter=jitter, rand_gen=rand_gen,
        num_mc_samples=num_mc)
    return m


def test_multiclass_elbo_vs_numpy_with_fixed_draws():
    rng = np.random.default_rng(0)
    N, ls, var, K_mc = 12, 0.9, 1.3, 4
    X = rng.random((N, 2)) * 4
    labels = rng.integers(0, C, N)
    Y = np.eye(C)[labels]
    Z0 = rng.random((M_IND, 2)) * 4
    raw_eps = rng.standard_normal((N * C * K_mc,))
    gen = FixedRandomGenerator(raw_eps)

    m = _build(ls, var, Z0, rand_gen=gen, num_mc=K_mc)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    post = m.Y.factor._extra_graphs[0]
    rng2 = np.random.default_rng(7)
    qU_mean = rng2.standard_normal((M_IND, C)) * 0.5
    W = rng2.standard_normal((M_IND, M_IND)) * 0.2 + np.eye(M_IND)
    diag = rng2.random(M_IND) * 0.1 + 0.05
    infr.params[post.qU_mean] = jnp.asarray(qU_mean)
    infr.params[post.qU_cov_W] = jnp.asarray(W)
    infr.params[post.qU_cov_diag] = jnp.asarray(diag)

    gen.reset()
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, Y],
                    jax.random.PRNGKey(0))
    result = -float(np.asarray(loss))

    # independent numpy: q(f) moments, the SAME eps, CE, KL
    S = W @ W.T + np.diag(diag)
    Kuu = np_rbf(Z0, Z0, ls, var)
    Kuu_inv = np.linalg.inv(Kuu)
    A = np_rbf(Z0, X, ls, var).T @ Kuu_inv
    mean_f = A @ qU_mean                              # (N, C)
    var_f = (np_rbf(X, X, ls, var).diagonal()
             - np.einsum("nm,mk,nk->n", A, Kuu, A)
             + np.einsum("nm,mk,nk->n", A, S, A))     # (N,)
    eps = raw_eps.reshape(1, N, C, K_mc)
    f = mean_f[None, :, :, None] + \
        np.sqrt(var_f)[None, :, None, None] * eps
    ce = (Y[None, :, :, None] * f).sum(axis=2) - \
        np.log(np.exp(f).sum(axis=2))
    exp_lik = ce.mean(axis=-1).sum()
    KL = 0.5 * (C * np.trace(Kuu_inv @ S)
                + np.einsum("mc,mk,kc->", qU_mean, Kuu_inv, qU_mean)
                - C * M_IND + C * np.linalg.slogdet(Kuu)[1]
                - C * np.linalg.slogdet(S)[1])
    expected = exp_lik - KL
    assert np.isclose(result, expected, rtol=1e-7), (result, expected)


def test_multiclass_trains_and_separates_clusters():
    rng = np.random.default_rng(1)
    N = 240
    centers = np.array([[0.5, 0.5], [3.0, 0.8], [1.8, 3.2]])
    labels = rng.integers(0, C, N)
    X = centers[labels] + rng.standard_normal((N, 2)) * 0.35
    Y = np.eye(C)[labels]
    Z0 = rng.random((12, 2)) * 4

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.Y = SVGPMultiClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=2, variance=2.0, lengthscale=0.8),
        num_classes=C, shape=(m.n, C),
        inducing_inputs=Variable(shape=(12, 2), initial_value=Z0),
        whitened=True)
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    loss = float(np.asarray(infr.run(
        X=X, Y=Y, max_iter=400, learning_rate=0.05, verbose=False)))
    assert np.isfinite(loss)

    Xt = centers[np.repeat(np.arange(C), 30)] + \
        np.random.default_rng(2).standard_normal((90, 2)) * 0.3
    yt = np.repeat(np.arange(C), 30)
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    p, _ = pred.run(X=Xt)[0]
    p = np.asarray(p)[0]                               # (90, C)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=0.02)
    acc = (p.argmax(-1) == yt).mean()
    assert acc > 0.9, acc


def test_multiclass_sampling_one_hot():
    rng = np.random.default_rng(3)
    N = 10
    X = rng.random((N, 2)) * 4
    Z0 = np.linspace(0.2, 3.8, M_IND)[:, None] * np.ones((1, 2))
    m = _build(1.0, 1.0, Z0, jitter=1e-8)
    alg = ForwardSamplingAlgorithm(model=m, observed=[m.X],
                                   num_samples=6,
                                   target_variables=[m.Y.uuid])
    infr = Inference(inference_algorithm=alg, dtype="float64")
    out = infr.run(X=X, key=jax.random.PRNGKey(0))
    s = np.asarray(out[0]).astype(np.float64)
    assert s.shape == (6, N, C)
    assert np.allclose(s.sum(-1), 1.0)
    assert set(np.unique(s)).issubset({0.0, 1.0})


def test_multiclass_sharded_elbo_equals_unsharded():
    # GSPMD data sharding must not change the MC ELBO: the (s,N,C,K)
    # draws depend only on the key and logical shape, not the layout
    # (mirrors test_classification_sharded_elbo_equals_unsharded for
    # the binary quadrature ELBO).
    from mxfusion_tpu.parallel import make_mesh, shard_data
    rng = np.random.default_rng(5)
    N = 160
    X = rng.random((N, 2)) * 4
    Y = np.eye(C)[rng.integers(0, C, N)]
    Z0 = rng.random((M_IND, 2)) * 4
    m = _build(0.9, 1.3, Z0, num_mc=4, jitter=1e-8)
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
