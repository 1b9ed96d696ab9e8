"""Save → rebuild → load → rerun round trips.

Mirrors /root/reference/testing/inference/inference_serialization_test.py:91-260.
"""
import numpy as np
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.modules import GPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield, MAP, ModulePredictionAlgorithm,
    TransferInference)


def _make_meanfield(n=50):
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (n, 1)),
                                 variance=broadcast_to(m.s, (n, 1)),
                                 shape=(n, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=5, model=m,
                                         posterior=q, observed=[m.y])
    return m, q, alg


def test_meanfield_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((50, 1)) + 2.0
    m1, q1, alg1 = _make_meanfield()
    infr1 = GradBasedInference(inference_algorithm=alg1)
    infr1.run(max_iter=80, learning_rate=0.1, y=y)
    path = str(tmp_path / "inference.zip")
    infr1.save(path)

    # rebuild from scratch (fresh UUIDs), load, check parameters moved over
    m2, q2, alg2 = _make_meanfield()
    infr2 = GradBasedInference(inference_algorithm=alg2)
    infr2.initialize(y=y)
    infr2.load(path)
    v1 = np.asarray(infr1.params[q1.mu.factor.mean]).item()
    v2 = np.asarray(infr2.params[q2.mu.factor.mean]).item()
    assert np.isclose(v1, v2)
    s1 = np.asarray(infr1.params[m1.s]).item()
    s2 = np.asarray(infr2.params[m2.s]).item()
    assert np.isclose(s1, s2)
    # the loaded inference can continue training
    infr2.run(max_iter=10, learning_rate=0.05, y=y)


def _make_gp(n_sym=True):
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    kernel = RBF(input_dim=1, variance=1.0, lengthscale=1.0)
    m.Y = GPRegression.define_variable(X=m.X, kernel=kernel,
                                       noise_var=m.noise_var,
                                       shape=(m.N, 1))
    return m


def test_gp_module_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    X = rng.random((30, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((30, 1)) * 0.1
    m1 = _make_gp()
    infr1 = GradBasedInference(
        inference_algorithm=MAP(model=m1, observed=[m1.X, m1.Y]))
    infr1.run(max_iter=100, learning_rate=0.05, X=X, Y=Y)
    path = str(tmp_path / "gp.zip")
    infr1.save(path)

    m2 = _make_gp()
    infr2 = GradBasedInference(
        inference_algorithm=MAP(model=m2, observed=[m2.X, m2.Y]))
    infr2.initialize(X=X, Y=Y)
    infr2.load(path)
    # module-internal kernel parameters must be reconciled + loaded
    k1 = m1.Y.factor._module_graph.kernel
    k2 = m2.Y.factor._module_graph.kernel
    l1 = np.asarray(infr1.params[k1.lengthscale])
    l2 = np.asarray(infr2.params[k2.lengthscale])
    assert np.allclose(l1, l2)

    # predictions from the loaded inference match
    Xt = np.linspace(0, 4, 10)[:, None]
    p1 = TransferInference(ModulePredictionAlgorithm(
        model=m1, observed=[m1.X], target_variables=[m1.Y.uuid]),
        infr_params=infr1.params)
    mu1, _ = p1.run(X=Xt)[0]
    p2 = TransferInference(ModulePredictionAlgorithm(
        model=m2, observed=[m2.X], target_variables=[m2.Y.uuid]),
        infr_params=infr2.params)
    mu2, _ = p2.run(X=Xt)[0]
    assert np.allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-5,
                       atol=1e-6)


def test_fixed_params_survive_save_load(tmp_path):
    """Module cache variables (posterior L/LinvY/X) must still be FIXED
    after a save/load round trip, so resumed training doesn't train
    them (ADVICE r1: fixed-UUID set was not persisted)."""
    rng = np.random.default_rng(3)
    X = rng.random((20, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((20, 1)) * 0.1
    m1 = _make_gp()
    infr1 = GradBasedInference(
        inference_algorithm=MAP(model=m1, observed=[m1.X, m1.Y]))
    infr1.run(max_iter=20, learning_rate=0.05, X=X, Y=Y)
    n_fixed_before = len(infr1.params.fixed)
    assert n_fixed_before > 0  # the GP module cached L/LinvY/X
    path = str(tmp_path / "gp_fixed.zip")
    infr1.save(path)

    m2 = _make_gp()
    infr2 = GradBasedInference(
        inference_algorithm=MAP(model=m2, observed=[m2.X, m2.Y]))
    infr2.initialize(X=X, Y=Y)
    infr2.load(path)
    assert len(infr2.params.fixed) == n_fixed_before
    # resumed training keeps caches out of the trainable set
    fixed_before_resume = set(infr2.params.fixed)
    infr2.run(max_iter=5, learning_rate=0.01, X=X, Y=Y)
    assert fixed_before_resume <= set(infr2.params.fixed)
    assert not (set(infr2.params.trainable_params())
                & set(infr2.params.fixed))


def _make_bnn(N=30, seed=1):
    """BNN with priors over FlaxFunction-lifted weights (mirrors
    /root/reference/testing/inference/inference_serialization_test.py:
    91-260, the Gluon-function round trip)."""
    import jax
    import flax.linen as nn
    import jax.numpy as jnp
    from mxfusion_tpu.components.functions import FlaxFunction

    class TinyNet(nn.Module):
        hidden: int = 4

        @nn.compact
        def __call__(self, x):
            x = nn.Dense(self.hidden)(x)
            x = jnp.tanh(x)
            return nn.Dense(1)(x)

    net = FlaxFunction(TinyNet(), name="f", input_shapes=[(N, 2)],
                       rng_key=jax.random.PRNGKey(seed))
    m = Model()
    m.x = Variable(shape=(N, 2))
    m.r = net(m.x)
    for name, v in m.r.factor.function.parameters.items():
        v.set_prior(Normal(mean=broadcast_to(Variable(value=0.), v.shape),
                           variance=broadcast_to(Variable(value=1.),
                                                 v.shape)))
    m.noise = Variable(transformation=PositiveTransformation(),
                       initial_value=0.01)
    m.y = Normal.define_variable(mean=m.r,
                                 variance=broadcast_to(m.noise, (N, 1)),
                                 shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.x, m.y])
    alg = StochasticVariationalInference(num_samples=5, model=m,
                                         posterior=q, observed=[m.x, m.y])
    return m, q, alg


def test_bnn_flax_function_save_load_roundtrip(tmp_path):
    """FlaxFunction (BNN) round trip: the lifted flax parameters (named
    via pytree paths) must reconcile onto a freshly built model and
    training must resume continuously."""
    import jax
    rng = np.random.default_rng(4)
    N = 30
    X = rng.random((N, 2)) * 2 - 1
    Y = (X[:, :1] * 0.7 - X[:, 1:] * 0.3
         ) + rng.standard_normal((N, 1)) * 0.05

    m1, q1, alg1 = _make_bnn(N)
    infr1 = GradBasedInference(inference_algorithm=alg1)
    losses1 = []
    infr1.run(max_iter=60, learning_rate=0.05, x=X, y=Y,
              callback=lambda i, l: losses1.append(float(l)))
    path = str(tmp_path / "bnn.zip")
    infr1.save(path)

    m2, q2, alg2 = _make_bnn(N, seed=7)  # fresh UUIDs AND fresh init
    infr2 = GradBasedInference(inference_algorithm=alg2)
    infr2.initialize(x=X, y=Y)
    infr2.load(path)

    # every lifted weight's posterior-mean parameter moved over exactly
    n_checked = 0
    for (n1, v1), (n2, v2) in zip(
            sorted(m1.r.factor.function.parameters.items()),
            sorted(m2.r.factor.function.parameters.items())):
        assert n1 == n2
        mu1 = np.asarray(infr1.params[q1[v1].factor.mean])
        mu2 = np.asarray(infr2.params[q2[v2].factor.mean])
        np.testing.assert_allclose(mu1, mu2, rtol=1e-6)
        n_checked += 1
    assert n_checked == 4  # 2 layers x (kernel, bias)
    s1 = np.asarray(infr1.params[m1.noise]).item()
    s2 = np.asarray(infr2.params[m2.noise]).item()
    assert np.isclose(s1, s2)

    # resumed training continues from the loaded state: the first
    # losses after reload sit near the end of the original run, far
    # below the from-scratch start
    losses2 = []
    infr2.run(max_iter=30, learning_rate=0.05, x=X, y=Y,
              callback=lambda i, l: losses2.append(float(l)))
    assert losses2[0] < losses1[0] * 0.5
    assert losses2[-1] < losses1[-1] * 1.5
