"""SVGPClassification integration: minibatch training, GSPMD data
sharding (sharded ELBO == unsharded ELBO), and save/load reconcile."""
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPClassification
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor, MinibatchInferenceLoop,
    ModulePredictionAlgorithm, TransferInference)
from mxfusion_tpu.parallel import make_mesh, shard_data

N = 160
M_IND = 8


def _data(seed=0, n=N):
    rng = np.random.default_rng(seed)
    X = rng.random((n, 1)) * 4
    p = 1.0 / (1.0 + np.exp(-3.0 * np.sin(2.0 * X[:, :1])))
    y = (rng.random((n, 1)) < p).astype(np.float64)
    return X, y


def _build(whitened=False):
    Z0 = np.linspace(0.1, 3.9, M_IND)[:, None]
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.Y = SVGPClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=0.7),
        shape=(m.n, 1),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        whitened=whitened)
    return m


def test_classification_sharded_elbo_equals_unsharded():
    X, y = _data()
    m = _build()
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=X, Y=y)
    ex = create_executor(alg, infr.params)
    tr = infr.params.trainable_params()
    fx = infr.params.fixed_params()
    plain, _, _ = jax.jit(ex)(tr, fx, [jnp.asarray(X), jnp.asarray(y)],
                              jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    sharded, _, _ = jax.jit(ex)(tr, fx, shard_data(mesh, [X, y]),
                                jax.random.PRNGKey(0))
    assert np.allclose(float(np.asarray(plain)),
                       float(np.asarray(sharded)), rtol=1e-5)


def test_classification_minibatch_training_converges():
    X, y = _data(seed=1, n=256)
    m = _build(whitened=True)
    loop = MinibatchInferenceLoop(batch_size=64, rv_scaling={
        m.Y: 256 / 64})
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]),
                              grad_loop=loop)
    loss = infr.run(X=X, Y=y, max_iter=60, learning_rate=0.05,
                    verbose=False)
    loss = float(np.asarray(loss))
    assert np.isfinite(loss)

    Xt = np.linspace(0.05, 3.95, 40)[:, None]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    p, _ = pred.run(X=Xt)[0]
    p = np.asarray(p)[0, :, 0]
    acc = ((p > 0.5) == (np.sin(2.0 * Xt[:, 0]) > 0)).mean()
    assert acc > 0.75, acc


def test_classification_save_load_roundtrip(tmp_path):
    X, y = _data(seed=2)
    m1 = _build()
    infr1 = GradBasedInference(MAP(model=m1, observed=[m1.X, m1.Y]))
    infr1.run(X=X, Y=y, max_iter=120, learning_rate=0.05, verbose=False)
    path = str(tmp_path / "svgpc.zip")
    infr1.save(path)

    m2 = _build()
    infr2 = GradBasedInference(MAP(model=m2, observed=[m2.X, m2.Y]))
    infr2.initialize(X=X, Y=y)
    infr2.load(path)

    Xt = np.linspace(0.05, 3.95, 15)[:, None]

    def prob(m, infr):
        pred = TransferInference(ModulePredictionAlgorithm(
            model=m, observed=[m.X], target_variables=[m.Y.uuid]),
            infr_params=infr.params)
        p, _ = pred.run(X=Xt)[0]
        return np.asarray(p)[0, :, 0]

    assert np.allclose(prob(m1, infr1), prob(m2, infr2), rtol=1e-5,
                       atol=1e-6)


def test_classification_device_loop_training():
    """DeviceMinibatchLoop (whole epoch = one XLA program) drives the
    classification ELBO like any other objective."""
    from mxfusion_tpu.inference import DeviceMinibatchLoop
    X, y = _data(seed=3, n=256)
    m = _build(whitened=True)
    loop = DeviceMinibatchLoop(batch_size=64,
                               rv_scaling={m.Y: 256 / 64})
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]),
                              grad_loop=loop)
    losses = []
    infr.run(X=X, Y=y, max_iter=30, learning_rate=0.05, verbose=False,
             callback=lambda e, l: losses.append(float(np.asarray(l))))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

    Xt = np.linspace(0.05, 3.95, 40)[:, None]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    p, _ = pred.run(X=Xt)[0]
    p = np.asarray(p)[0, :, 0]
    acc = ((p > 0.5) == (np.sin(2.0 * Xt[:, 0]) > 0)).mean()
    assert acc > 0.75, acc
