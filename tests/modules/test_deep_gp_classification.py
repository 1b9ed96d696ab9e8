"""Deep GP binary classification (doubly-stochastic VI; beyond-
reference module).

Oracle: a 1-layer DeepGPClassification has no propagation sampling, so
its quadrature ELBO must equal SVGPClassification's EXACTLY (both
links, both parameterizations) and its predictive class probabilities
must match. Deeper stacks are checked for finite complete gradients
and end-to-end training on a boundary a stationary single-layer model
fits poorly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import DeepGPClassification, SVGPClassification
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor, ModulePredictionAlgorithm,
    TransferInference)

M_IND = 6


def _data(seed=0, n=30, d=2):
    rng = np.random.default_rng(seed)
    X = rng.random((n, d)) * 4
    Y = (np.sin(X[:, :1]) > 0).astype(float)
    Z0 = rng.random((M_IND, d)) * 4
    return X, Y, Z0


def _build_svgp(X, whitened, link):
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, X.shape[1]))
    m.Y = SVGPClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=X.shape[1], variance=1.0,
                          lengthscale=1.0),
        shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M_IND, X.shape[1])),
        jitter=1e-8, whitened=whitened, link=link, dtype="float64")
    return m


def _build_deep(X, Z0s, whitened, link="logit", num_samples=3,
                jitter=1e-8):
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, X.shape[1]))
    kernels = [RBF(input_dim=z.shape[1], variance=1.0, lengthscale=1.0)
               for z in Z0s]
    m.Y = DeepGPClassification.define_variable(
        X=m.X, kernels=kernels, shape=(m.n, 1),
        inducing_inputs=[Variable(shape=z.shape, initial_value=z)
                         for z in Z0s],
        jitter=jitter, whitened=whitened, link=link,
        num_samples=num_samples, dtype="float64")
    return m


def _exec(m, X, Y):
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=X, Y=Y)
    return create_executor(alg, infr.params), infr


def _set_q(infr, post, mean, W, diag, suffix=""):
    infr.params[getattr(post, "qU_mean" + suffix)] = jnp.asarray(mean)
    infr.params[getattr(post, "qU_cov_W" + suffix)] = jnp.asarray(W)
    infr.params[getattr(post, "qU_cov_diag" + suffix)] = \
        jnp.asarray(diag)


@pytest.mark.parametrize("whitened", [True, False])
@pytest.mark.parametrize("link", ["logit", "probit"])
def test_one_layer_equals_svgp_classification_elbo(whitened, link):
    X, Y, Z0 = _data()
    m_s = _build_svgp(X, whitened, link)
    m_d = _build_deep(X, [Z0], whitened, link=link)
    ex_s, infr_s = _exec(m_s, X, Y)
    ex_d, infr_d = _exec(m_d, X, Y)

    rng = np.random.default_rng(7)
    q_mean = rng.standard_normal((M_IND, 1))
    q_W = rng.standard_normal((M_IND, M_IND)) * 0.3 + np.eye(M_IND)
    q_diag = np.full(M_IND, 1e-10)
    _set_q(infr_s, m_s.Y.factor._extra_graphs[0], q_mean, q_W, q_diag)
    _set_q(infr_d, m_d.Y.factor._extra_graphs[0], q_mean, q_W, q_diag,
           suffix="_0")
    # align the inducing inputs BIT-EXACTLY on both sides (the deep
    # builder's initial_value allocation casts to the module dtype;
    # an override dodges any dtype-of-initialization skew)
    infr_s.params[m_s.Y.factor._module_graph.inducing_inputs] = \
        jnp.asarray(Z0)
    infr_d.params[m_d.Y.factor._module_graph.inducing_inputs_0] = \
        jnp.asarray(Z0)

    key = jax.random.PRNGKey(0)
    loss_s = float(ex_s(infr_s.params.trainable_params(),
                        infr_s.params.fixed_params(), [X, Y], key)[0])
    loss_d = float(ex_d(infr_d.params.trainable_params(),
                        infr_d.params.fixed_params(), [X, Y], key)[0])
    assert np.isclose(loss_s, loss_d, rtol=1e-8), (loss_s, loss_d)


@pytest.mark.parametrize("link", ["logit", "probit"])
def test_one_layer_prediction_matches_svgp(link):
    X, Y, Z0 = _data(seed=1, n=40)
    m_s = _build_svgp(X, True, link)
    m_d = _build_deep(X, [Z0], True, link=link)
    _, infr_s = _exec(m_s, X, Y)
    _, infr_d = _exec(m_d, X, Y)
    rng = np.random.default_rng(3)
    q_mean = rng.standard_normal((M_IND, 1))
    q_W = rng.standard_normal((M_IND, M_IND)) * 0.2 + np.eye(M_IND)
    q_diag = np.full(M_IND, 1e-10)
    _set_q(infr_s, m_s.Y.factor._extra_graphs[0], q_mean, q_W, q_diag)
    _set_q(infr_d, m_d.Y.factor._extra_graphs[0], q_mean, q_W, q_diag,
           suffix="_0")
    infr_s.params[m_s.Y.factor._module_graph.inducing_inputs] = \
        jnp.asarray(Z0)
    infr_d.params[m_d.Y.factor._module_graph.inducing_inputs_0] = \
        jnp.asarray(Z0)

    Xt = X[:12]

    def predict(m, infr):
        p = TransferInference(ModulePredictionAlgorithm(
            model=m, observed=[m.X], target_variables=[m.Y.uuid]),
            infr_params=infr.params)
        return p.run(X=Xt)[0]

    p_s, pv_s = predict(m_s, infr_s)
    p_d, pv_d = predict(m_d, infr_d)
    np.testing.assert_allclose(np.asarray(p_d)[0], np.asarray(p_s)[0],
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pv_d)[0],
                               np.asarray(pv_s)[0], rtol=1e-6,
                               atol=1e-10)
    p_arr = np.asarray(p_d)
    assert np.all(p_arr >= 0) and np.all(p_arr <= 1)


def test_two_layer_gradients_finite_and_complete():
    X, Y, Z0 = _data(seed=2, n=20)
    Z1 = np.random.default_rng(5).standard_normal((M_IND, 2))
    m = _build_deep(X, [Z0, Z1], whitened=True, num_samples=2)
    ex, infr = _exec(m, X, Y)
    key = jax.random.PRNGKey(1)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())

    def loss_fn(tr):
        return ex(tr, fx, [X, Y], key)[1]

    val, grads = jax.value_and_grad(loss_fn)(tr)
    assert np.isfinite(float(val))
    n_nonzero = 0
    for uuid, g in grads.items():
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), uuid
        n_nonzero += bool(np.any(g != 0.0))
    assert n_nonzero >= len(grads) - 2, \
        "more than two trainables have identically-zero gradients"


@pytest.mark.slow
def test_two_layer_trains_on_nonstationary_boundary():
    """Classify by a sharp square-wave band — the warped composition
    fits the repeated jumps better than a stationary 1-layer model with
    the same few inducing points."""
    rng = np.random.default_rng(4)
    N = 140
    X = np.sort(rng.random((N, 1)) * 4, axis=0)
    Y = ((X % 2.0) > 1.0).astype(float)
    Z0 = np.linspace(0.2, 3.8, 10)[:, None]
    Z1 = np.linspace(-1.5, 1.5, 10)[:, None]
    m = _build_deep(X, [Z0, Z1], whitened=True, num_samples=3,
                    jitter=1e-5)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    losses = []
    infr.run(max_iter=400, learning_rate=0.02, X=X, Y=Y,
             callback=lambda i, l: losses.append(float(l)))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=50), infr_params=infr.params)
    prob, _ = p.run(X=X)[0]
    acc = float(np.mean((np.asarray(prob)[0] > 0.5) == (Y > 0.5)))
    assert acc > 0.85, acc


def test_replicated_deep_classifier_matches_original():
    X, Y, Z0 = _data(seed=6, n=16)
    Z1 = np.random.default_rng(9).standard_normal((4, 2))
    m = _build_deep(X, [Z0[:4], Z1], whitened=True, num_samples=2)
    m2 = m.clone()
    ex1, infr1 = _exec(m, X, Y)
    ex2, infr2 = _exec(m2, X, Y)
    post1 = m.Y.factor._extra_graphs[0]
    post2 = m2.Y.factor._extra_graphs[0]
    rng = np.random.default_rng(11)
    for l, M_l, D_l in ((0, 4, 2), (1, 4, 1)):
        mean = rng.standard_normal((M_l, D_l))
        W = np.eye(M_l)
        diag = np.full(M_l, 1e-8)
        _set_q(infr1, post1, mean, W, diag, suffix="_%d" % l)
        _set_q(infr2, post2, mean, W, diag, suffix="_%d" % l)
    key = jax.random.PRNGKey(2)
    l1 = float(ex1(infr1.params.trainable_params(),
                   infr1.params.fixed_params(), [X, Y], key)[0])
    l2 = float(ex2(infr2.params.trainable_params(),
                   infr2.params.fixed_params(), [X, Y], key)[0])
    assert np.isclose(l1, l2, rtol=1e-6), (l1, l2)


def test_forward_sampling_walks_the_generative_graph():
    X, Y, Z0 = _data(seed=5, n=14)
    Z1 = np.random.default_rng(8).standard_normal((4, 2))
    m = _build_deep(X, [Z0[:4], Z1], whitened=True, num_samples=2)
    _, infr = _exec(m, X, Y)
    from mxfusion_tpu.inference import ForwardSamplingAlgorithm
    fwd = TransferInference(ForwardSamplingAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=5), infr_params=infr.params)
    draws = np.asarray(fwd.run(X=X[:7])[0])
    assert draws.shape == (5, 7, 1)
    assert set(np.unique(draws)).issubset({0.0, 1.0})


def test_constructor_validation():
    with pytest.raises(ValueError):
        DeepGPClassification(X=np.zeros((3, 2)),
                             kernels=[RBF(input_dim=2)], link="cauchit")
    with pytest.raises(ValueError):
        DeepGPClassification.define_variable(
            X=np.zeros((3, 2)), kernels=[RBF(input_dim=2)],
            shape=(3, 2))
