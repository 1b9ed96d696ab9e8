"""Deep GP regression (doubly-stochastic VI; beyond-reference module).

Oracle: a 1-layer DeepGP has no propagation sampling (the final
layer's Gaussian expected log-likelihood is analytic), so its bound
must equal the SVGP ELBO EXACTLY — for both parameterizations — and
its predictions must equal SVGP's. Deeper stacks are checked for
estimator sanity (finite gradients everywhere, MC-average semantics),
end-to-end training on a composition the single-layer model cannot
fit well (a step function), and replication/prediction plumbing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPRegression, DeepGPRegression
from mxfusion_tpu.modules.gp_modules.deep_gp import (
    DeepGPSamplingPrediction)
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor, ModulePredictionAlgorithm,
    TransferInference)

M_IND = 6


def _data(seed=0, n=25, d=2):
    rng = np.random.default_rng(seed)
    X = rng.random((n, d)) * 4
    Y = np.sin(X[:, :1]) + rng.standard_normal((n, 1)) * 0.1
    Z0 = rng.random((M_IND, d)) * 4
    return X, Y, Z0


def _build_svgp(X, Y, Z0, whitened):
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, X.shape[1]))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=X.shape[1], variance=1.0,
                          lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        jitter=1e-8, whitened=whitened)
    return m


def _build_deep(X, Y, Z0s, whitened, num_samples=3, jitter=1e-8):
    """Z0s: list of per-layer inducing inits (layer widths follow)."""
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, X.shape[1]))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    kernels = [RBF(input_dim=z.shape[1], variance=1.0, lengthscale=1.0)
               for z in Z0s]
    m.Y = DeepGPRegression.define_variable(
        X=m.X, kernels=kernels, noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=[Variable(shape=z.shape, initial_value=z)
                         for z in Z0s],
        jitter=jitter, whitened=whitened, num_samples=num_samples)
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
def test_one_layer_deep_gp_equals_svgp_elbo(whitened):
    X, Y, Z0 = _data()
    m_s = _build_svgp(X, Y, Z0, whitened)
    m_d = _build_deep(X, Y, [Z0], whitened)
    ex_s, infr_s = _exec(m_s, X, Y)
    ex_d, infr_d = _exec(m_d, X, Y)

    rng = np.random.default_rng(7)
    q_mean = rng.standard_normal((M_IND, 1))
    q_W = rng.standard_normal((M_IND, M_IND)) * 0.3 + np.eye(M_IND)
    q_diag = np.full(M_IND, 1e-10)
    _set_q(infr_s, m_s.Y.factor._extra_graphs[0], q_mean, q_W, q_diag)
    _set_q(infr_d, m_d.Y.factor._extra_graphs[0], q_mean, q_W, q_diag,
           suffix="_0")

    key = jax.random.PRNGKey(0)
    loss_s = float(ex_s(infr_s.params.trainable_params(),
                        infr_s.params.fixed_params(), [X, Y], key)[0])
    loss_d = float(ex_d(infr_d.params.trainable_params(),
                        infr_d.params.fixed_params(), [X, Y], key)[0])
    assert np.isclose(loss_s, loss_d, rtol=1e-8), (loss_s, loss_d)


def test_one_layer_prediction_matches_svgp():
    X, Y, Z0 = _data(seed=1, n=40)
    m_s = _build_svgp(X, Y, Z0, whitened=True)
    m_d = _build_deep(X, Y, [Z0], whitened=True)
    _, infr_s = _exec(m_s, X, Y)
    _, infr_d = _exec(m_d, X, Y)
    rng = np.random.default_rng(3)
    q_mean = rng.standard_normal((M_IND, 1))
    q_W = rng.standard_normal((M_IND, M_IND)) * 0.2 + np.eye(M_IND)
    q_diag = np.full(M_IND, 1e-10)
    _set_q(infr_s, m_s.Y.factor._extra_graphs[0], q_mean, q_W, q_diag)
    _set_q(infr_d, m_d.Y.factor._extra_graphs[0], q_mean, q_W, q_diag,
           suffix="_0")

    Xt = X[:15]

    def predict(m, infr):
        p = TransferInference(ModulePredictionAlgorithm(
            model=m, observed=[m.X], target_variables=[m.Y.uuid]),
            infr_params=infr.params)
        return p.run(X=Xt)[0]

    mu_s, var_s = predict(m_s, infr_s)
    mu_d, var_d = predict(m_d, infr_d)
    np.testing.assert_allclose(np.asarray(mu_d)[0],
                               np.asarray(mu_s)[0], rtol=1e-6,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_d)[0].ravel(),
                               np.asarray(var_s)[0].ravel(), rtol=1e-6,
                               atol=1e-10)


def test_two_layer_gradients_finite_and_complete():
    X, Y, Z0 = _data(seed=2, n=20)
    Z1 = np.random.default_rng(5).standard_normal((M_IND, 2))
    m = _build_deep(X, Y, [Z0, Z1], whitened=True, num_samples=2)
    ex, infr = _exec(m, X, Y)
    key = jax.random.PRNGKey(1)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())

    def loss_fn(tr):
        return ex(tr, fx, [X, Y], key)[1]

    val, grads = jax.value_and_grad(loss_fn)(tr)
    assert np.isfinite(float(val))
    # every trainable gets a finite gradient; the variational means,
    # kernel parameters and noise get a NONZERO one
    n_nonzero = 0
    for uuid, g in grads.items():
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), uuid
        n_nonzero += bool(np.any(g != 0.0))
    assert n_nonzero >= len(grads) - 2, \
        "more than two trainables have identically-zero gradients"


def test_two_layer_mc_average_semantics():
    """The (S,) bound terms are averaged by the outer interpreter, so
    the loss magnitude must be sample-count independent (not S-summed)."""
    X, Y, Z0 = _data(seed=3, n=15)
    Z1 = np.random.default_rng(6).standard_normal((4, 2))
    losses = {}
    for S in (1, 7):
        m = _build_deep(X, Y, [Z0[:4], Z1], whitened=True,
                        num_samples=S)
        ex, infr = _exec(m, X, Y)
        losses[S] = float(ex(infr.params.trainable_params(),
                             infr.params.fixed_params(), [X, Y],
                             jax.random.PRNGKey(0))[0])
    # same order of magnitude (an S-sum would be ~7x apart)
    assert abs(losses[7] / losses[1]) < 3.0, losses


@pytest.mark.slow
def test_two_layer_trains_on_step_function():
    rng = np.random.default_rng(4)
    N = 120
    X = np.sort(rng.random((N, 1)) * 4, axis=0)
    Y = np.where(X > 2.0, 1.0, -1.0) + \
        rng.standard_normal((N, 1)) * 0.05
    Z0 = np.linspace(0.2, 3.8, 8)[:, None]
    Z1 = np.linspace(-1.2, 1.2, 8)[:, None]
    # jitter is RELATIVE and must be production-sized for training
    # (1e-8 NaNs once the inner lengthscale grows; see deep_gp.py)
    m = _build_deep(X, Y, [Z0, Z1], whitened=True, num_samples=3,
                    jitter=1e-5)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    losses = []
    infr.run(max_iter=300, learning_rate=0.02, X=X, Y=Y,
             callback=lambda i, l: losses.append(float(l)))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=50), infr_params=infr.params)
    mu, var = p.run(X=X)[0]
    rmse = float(np.sqrt(np.mean(
        (np.asarray(mu)[0] - np.where(X > 2.0, 1.0, -1.0)) ** 2)))
    assert rmse < 0.4, rmse
    assert np.all(np.asarray(var) > -1e-8)


def test_sampling_prediction_and_forward_sampling():
    X, Y, Z0 = _data(seed=5, n=18)
    Z1 = np.random.default_rng(8).standard_normal((4, 2))
    m = _build_deep(X, Y, [Z0[:4], Z1], whitened=True, num_samples=2)
    _, infr = _exec(m, X, Y)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=DeepGPSamplingPrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            num_layers=2, whitened=True, jitter=1e-8,
            noise_free=False),
        alg_name="deep_gp_sample_pred")
    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=9), infr_params=infr.params)
    s = np.asarray(p.run(X=X[:7])[0])
    assert s.shape == (9, 7, 1)
    assert np.all(np.isfinite(s))

    # generative-graph sampling (exercises the dot-mean function node)
    from mxfusion_tpu.inference import ForwardSamplingAlgorithm
    fwd = TransferInference(ForwardSamplingAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=5), infr_params=infr.params)
    draws = np.asarray(fwd.run(X=X[:7])[0])
    assert draws.shape == (5, 7, 1)
    assert np.all(np.isfinite(draws))


def test_replicated_deep_gp_matches_original():
    X, Y, Z0 = _data(seed=6, n=16)
    Z1 = np.random.default_rng(9).standard_normal((4, 2))
    m = _build_deep(X, Y, [Z0[:4], Z1], whitened=True, num_samples=2)
    m2 = m.clone()
    ex1, infr1 = _exec(m, X, Y)
    ex2, infr2 = _exec(m2, X, Y)
    # align the replica's parameters with the original's by name
    post1 = m.Y.factor._extra_graphs[0]
    post2 = m2.Y.factor._extra_graphs[0]
    rng = np.random.default_rng(11)
    # layer 0 outputs kernels[1].input_dim = 2 features; layer 1
    # outputs the observed width 1
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


def test_constructor_validation():
    with pytest.raises(ValueError):
        DeepGPRegression(X=np.zeros((3, 2)), kernels=[],
                         noise_var=0.1)
    with pytest.raises(ValueError):
        DeepGPRegression(X=np.zeros((3, 2)),
                         kernels=[RBF(input_dim=2)], noise_var=0.1,
                         inner_mean="bogus")
    with pytest.raises(ValueError):
        DeepGPRegression(
            X=np.zeros((3, 2)), kernels=[RBF(input_dim=2),
                                         RBF(input_dim=1)],
            noise_var=0.1,
            inducing_inputs=[Variable(shape=(4, 2))])


class _ShapeRecordingRandGen:
    """Wraps the default generator, recording sample_normal shapes."""

    def __init__(self):
        from mxfusion_tpu.components.distributions.random_gen import (
            default_rand_gen)
        self._inner = default_rand_gen()
        self.shapes = []

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def sample_normal(self, key, loc=0.0, scale=1.0, shape=None,
                      dtype=None):
        self.shapes.append(tuple(shape) if shape is not None else None)
        return self._inner.sample_normal(key, loc=loc, scale=scale,
                                         shape=shape, dtype=dtype)


def test_explicit_num_samples_one_is_honored():
    """predict(num_samples=1) must run ONE propagation sample (a
    deliberate cheap point estimate), not be promoted to the
    default_samples count; an UNSET request does promote."""
    X, Y, Z0 = _data(seed=9, n=12)
    Z1 = np.random.default_rng(10).standard_normal((4, 2))
    rec = _ShapeRecordingRandGen()
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = DeepGPRegression.define_variable(
        X=m.X, kernels=[RBF(input_dim=2), RBF(input_dim=2)],
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=[Variable(shape=Z0[:4].shape,
                                  initial_value=Z0[:4]),
                         Variable(shape=Z1.shape, initial_value=Z1)],
        jitter=1e-8, whitened=True, num_samples=2, rand_gen=rec)
    _, infr = _exec(m, X, Y)

    def run(num_samples):
        rec.shapes.clear()
        kw = {} if num_samples is None else {"num_samples": num_samples}
        p = TransferInference(ModulePredictionAlgorithm(
            model=m, observed=[m.X], target_variables=[m.Y.uuid], **kw),
            infr_params=infr.params)
        p.run(X=X[:5])
        return [s[0] for s in rec.shapes if s is not None]

    assert run(1) == [1], "explicit num_samples=1 was promoted"
    assert run(None) == [20], \
        "unset request did not promote to default_samples"
    assert run(7) == [7]


def test_log_pdf_with_sampled_hyperparameter_env():
    """An outer SVI pass with s>1 posterior samples of a model-level
    hyperparameter (here the observation noise) hands the module an
    env with sample count s where 1 < s != module num_samples — the
    bound must pin the MC propagation count to s instead of crashing
    on an impossible broadcast."""
    from mxfusion_tpu.components.distributions import Gamma
    from mxfusion_tpu.inference import (
        StochasticVariationalInference, create_Gaussian_meanfield)
    X, Y, Z0 = _data(seed=12, n=10)
    Z1 = np.random.default_rng(13).standard_normal((4, 2))
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.noise_var = Gamma.define_variable(alpha=2.0, beta=10.0, shape=(1,))
    m.Y = DeepGPRegression.define_variable(
        X=m.X, kernels=[RBF(input_dim=2), RBF(input_dim=2)],
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=[Variable(shape=Z0[:4].shape,
                                  initial_value=Z0[:4]),
                         Variable(shape=Z1.shape, initial_value=Z1)],
        jitter=1e-6, whitened=True, num_samples=5)
    q = create_Gaussian_meanfield(model=m, observed=[m.X, m.Y])
    alg = StochasticVariationalInference(num_samples=3, model=m,
                                         posterior=q,
                                         observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=3, learning_rate=0.01, X=X, Y=Y,
             callback=lambda i, l: losses.append(float(l)))
    assert np.all(np.isfinite(losses)), losses
