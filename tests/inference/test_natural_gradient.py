"""Natural-gradient SVGP tests.

For FIXED hyperparameters and a conjugate (Gaussian) likelihood the
optimal q(U) of the uncollapsed ELBO is available in closed form (it
makes the ELBO equal the Titsias collapsed bound); NGD with gamma=1
must land on it in essentially one step, and far faster than adam.
"""
import numpy as np
import jax
import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (GradBasedInference, MAP,
                                    NaturalGradientLoop)
from mxfusion_tpu.common.exceptions import InferenceError


def _np_rbf(X, X2, ls, var):
    r2 = (((X[:, None, :] - X2[None, :, :]) / ls) ** 2).sum(-1)
    return var * np.exp(-0.5 * r2)


def _setup(N=60, M=8, seed=0, whitened=False):
    rng = np.random.default_rng(seed)
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
    Z0 = np.linspace(0.1, 3.9, M)[:, None]
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.04)
    kernel = RBF(input_dim=1, variance=1.2, lengthscale=0.8,
                 dtype="float64")
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, 1),
        inducing_inputs=Variable(shape=(M, 1), initial_value=Z0),
        dtype="float64", jitter=0.0, whitened=whitened)
    return m, X, Y, Z0


def _collapsed_bound(X, Y, Z, ls, var, noise):
    """Titsias bound = max_q ELBO at fixed hyperparameters."""
    from scipy import stats
    Kuu = _np_rbf(Z, Z, ls, var)
    Kuf = _np_rbf(Z, X, ls, var)
    Qnn = Kuf.T @ np.linalg.solve(Kuu, Kuf)
    N = len(X)
    cov = Qnn + noise * np.eye(N)
    return (stats.multivariate_normal.logpdf(Y[:, 0], np.zeros(N), cov)
            - np.trace(_np_rbf(X, X, ls, var) - Qnn) / (2 * noise))


def _freeze_hypers(infr, m):
    kernel = m.Y.factor._module_graph.kernel
    post = m.Y.factor._extra_graphs[0]
    z_uuid = m.Y.factor._module_graph.inducing_inputs.uuid
    for u in (m.noise_var.uuid, kernel.lengthscale.uuid,
              kernel.variance.uuid, z_uuid):
        infr.params.fixed.add(u)


def test_ngd_reaches_collapsed_bound_in_few_steps():
    m, X, Y, Z0 = _setup()
    alg = MAP(model=m, observed=[m.X, m.Y])
    loop = NaturalGradientLoop(module=m.Y.factor, nat_learning_rate=1.0)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop,
                              dtype="float64")
    infr.initialize(X=X, Y=Y)
    _freeze_hypers(infr, m)
    losses = []
    infr.run(max_iter=3, learning_rate=0.0, X=X, Y=Y,
             key=jax.random.PRNGKey(0),
             callback=lambda i, l: losses.append(l))
    optimal = -_collapsed_bound(X, Y, Z0, 0.8, 1.2, 0.04)
    # gamma=1 NGD with conjugate likelihood: step 2's loss is evaluated
    # AT the optimum found by step 1
    assert np.isclose(losses[1], optimal, rtol=1e-8), \
        (losses, optimal)


def test_ngd_converges_faster_than_adam():
    m, X, Y, Z0 = _setup(seed=1)
    optimal = -_collapsed_bound(X, Y, Z0, 0.8, 1.2, 0.04)

    def run(loop):
        mm, Xd, Yd, _ = _setup(seed=1)
        alg = MAP(model=mm, observed=[mm.X, mm.Y])
        lp = loop(mm)
        infr = GradBasedInference(inference_algorithm=alg,
                                  grad_loop=lp, dtype="float64")
        infr.initialize(X=Xd, Y=Yd)
        _freeze_hypers(infr, mm)
        losses = []
        infr.run(max_iter=40, learning_rate=0.05, X=Xd, Y=Yd,
                 key=jax.random.PRNGKey(0),
                 callback=lambda i, l: losses.append(l))
        return np.asarray(losses)

    ngd = run(lambda mm: NaturalGradientLoop(module=mm.Y.factor,
                                             nat_learning_rate=0.5))
    from mxfusion_tpu.inference import BatchInferenceLoop
    adam = run(lambda mm: BatchInferenceLoop())
    # NGD is essentially at the optimum within a handful of steps
    # (gamma=0.5 contracts the gap ~2x/step); adam is nowhere close
    # after 40
    assert abs(ngd[5] - optimal) < 1e-2
    assert abs(ngd[-1] - optimal) < 1e-6
    assert abs(adam[-1] - optimal) > 100 * abs(ngd[-1] - optimal)


def test_ngd_trains_hyperparameters_too():
    m, X, Y, Z0 = _setup(seed=2)
    alg = MAP(model=m, observed=[m.X, m.Y])
    loop = NaturalGradientLoop(module=m.Y.factor, nat_learning_rate=0.5)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop,
                              dtype="float64")
    losses = []
    infr.run(max_iter=60, learning_rate=0.05, X=X, Y=Y,
             key=jax.random.PRNGKey(0),
             callback=lambda i, l: losses.append(l))
    assert losses[-1] < losses[0]
    # noise hyperparameter moved (trained by the simultaneous adam step)
    noise = np.asarray(infr.params[m.noise_var]).item()
    assert noise != pytest.approx(0.04)
    # prediction through the trained q(U) stays sane
    from mxfusion_tpu.inference import (ModulePredictionAlgorithm,
                                        TransferInference)
    Xt = np.linspace(0, 4, 9)[:, None]
    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, v = p.run(X=Xt)[0]
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.abs(np.asarray(mu)[0, :, 0] - np.sin(Xt[:, 0])).mean() < 0.3


def test_ngd_rejects_whitened():
    m, X, Y, Z0 = _setup(whitened=True)
    with pytest.raises(InferenceError, match="whitened"):
        NaturalGradientLoop(module=m.Y.factor)


def test_ngd_minibatch_device_loop_converges():
    """Stochastic NGD through the device-resident minibatch loop."""
    from mxfusion_tpu.inference import NaturalGradientMinibatchLoop
    N, M, B = 400, 8, 100
    rng = np.random.default_rng(3)
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
    Z0 = np.linspace(0.1, 3.9, M)[:, None]
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.04)
    kernel = RBF(input_dim=1, variance=1.2, lengthscale=0.8,
                 dtype="float64")
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, 1),
        inducing_inputs=Variable(shape=(M, 1), initial_value=Z0),
        dtype="float64", jitter=0.0)
    alg = MAP(model=m, observed=[m.X, m.Y])
    loop = NaturalGradientMinibatchLoop(
        module=m.Y.factor, batch_size=B, rv_scaling={m.Y: N / B},
        nat_learning_rate=0.2)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    losses = []
    infr.run(max_iter=20, learning_rate=0.02, X=X, Y=Y,
             key=jax.random.PRNGKey(0),
             callback=lambda e, l: losses.append(l))
    assert losses[-1] < losses[0]
    # adam-only baseline from the same init: NGD's per-epoch loss must
    # be clearly ahead at the same epoch count
    from mxfusion_tpu.inference import DeviceMinibatchLoop
    m2 = Model()
    m2.N = Variable()
    m2.X = Variable(shape=(m2.N, 1))
    m2.noise_var = Variable(transformation=PositiveTransformation(),
                            initial_value=0.04)
    kernel2 = RBF(input_dim=1, variance=1.2, lengthscale=0.8,
                  dtype="float64")
    m2.Y = SVGPRegression.define_variable(
        X=m2.X, kernel=kernel2, noise_var=m2.noise_var,
        shape=(m2.N, 1),
        inducing_inputs=Variable(shape=(M, 1), initial_value=Z0),
        dtype="float64", jitter=0.0)
    alg2 = MAP(model=m2, observed=[m2.X, m2.Y])
    loop2 = DeviceMinibatchLoop(batch_size=B,
                                rv_scaling={m2.Y: N / B})
    infr2 = GradBasedInference(inference_algorithm=alg2,
                               grad_loop=loop2)
    losses2 = []
    infr2.run(max_iter=20, learning_rate=0.02, X=X, Y=Y,
              key=jax.random.PRNGKey(0),
              callback=lambda e, l: losses2.append(l))
    assert losses[-1] < losses2[-1]
    # the trained state predicts through the standard path
    from mxfusion_tpu.inference import (ModulePredictionAlgorithm,
                                        TransferInference)
    Xt = np.linspace(0, 4, 7)[:, None]
    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, _ = p.run(X=Xt)[0]
    assert np.abs(np.asarray(mu)[0, :, 0] - np.sin(Xt[:, 0])).mean() < 0.25


def test_ngd_multioutput_reaches_collapsed_bound():
    """D=2 outputs share S: the 1/D natural-parameter scaling must
    still land on the optimum (= sum of per-column Titsias bounds) at
    gamma=1 with fixed hyperparameters."""
    N, M, D = 50, 6, 2
    rng = np.random.default_rng(4)
    X = rng.random((N, 1)) * 4
    Y = np.concatenate([np.sin(X), np.cos(X)], axis=1) \
        + rng.standard_normal((N, D)) * 0.1
    Z0 = np.linspace(0.1, 3.9, M)[:, None]
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.04)
    kernel = RBF(input_dim=1, variance=1.2, lengthscale=0.8,
                 dtype="float64")
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, D),
        inducing_inputs=Variable(shape=(M, 1), initial_value=Z0),
        dtype="float64", jitter=0.0)
    alg = MAP(model=m, observed=[m.X, m.Y])
    loop = NaturalGradientLoop(module=m.Y.factor, nat_learning_rate=1.0)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop,
                              dtype="float64")
    infr.initialize(X=X, Y=Y)
    _freeze_hypers(infr, m)
    losses = []
    infr.run(max_iter=3, learning_rate=0.0, X=X, Y=Y,
             key=jax.random.PRNGKey(0),
             callback=lambda i, l: losses.append(l))
    optimal = -sum(_collapsed_bound(X, Y[:, d:d + 1], Z0, 0.8, 1.2,
                                    0.04) for d in range(D))
    assert np.isclose(losses[1], optimal, rtol=1e-8), (losses, optimal)
