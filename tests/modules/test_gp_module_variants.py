"""GP module variants: mean functions, sampling predictions, algorithm
re-attachment, multi-output columns, CondGP sampling."""
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import ConditionalGaussianProcess
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression, SVGPRegression
from mxfusion_tpu.modules.gp_modules.gp_regression import (
    GPRegressionSamplingPrediction)
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm, TransferInference)


def _fit_gp(X, Y, mean=None, max_iter=150, **kw):
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, X.shape[1]))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    mean_arg = {}
    if mean is not None:
        m.mean = mean
        mean_arg["mean"] = m.mean
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=X.shape[1]), noise_var=m.noise_var,
        shape=(m.N, Y.shape[1]), **mean_arg, **kw)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    infr.run(max_iter=max_iter, learning_rate=0.05, X=X, Y=Y)
    return m, infr


def test_gp_with_constant_mean_function():
    rng = np.random.default_rng(0)
    X = rng.random((40, 1)) * 4
    Y = 5.0 + np.sin(X) + rng.standard_normal((40, 1)) * 0.1
    mean = Variable(value=np.full((40, 1), 5.0))
    m, infr = _fit_gp(X, Y, mean=mean)
    Xt = X[:40]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, _ = pred.run(X=Xt)[0]
    err = np.abs(np.asarray(mu)[0] - (5.0 + np.sin(Xt))).mean()
    assert err < 0.2


def test_multi_output_gp_columns():
    rng = np.random.default_rng(1)
    X = rng.random((30, 1)) * 4
    Y = np.concatenate([np.sin(X), np.cos(X)], axis=1) + \
        rng.standard_normal((30, 2)) * 0.05
    m, infr = _fit_gp(X, Y)
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, _ = pred.run(X=X)[0]
    assert np.asarray(mu).shape == (1, 30, 2)
    err = np.abs(np.asarray(mu)[0] -
                 np.concatenate([np.sin(X), np.cos(X)], 1)).mean()
    assert err < 0.15


def test_switch_prediction_algorithm_to_sampling():
    rng = np.random.default_rng(2)
    X = rng.random((30, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((30, 1)) * 0.05
    m, infr = _fit_gp(X, Y)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    # re-attach: replace the default mean-variance prediction
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=GPRegressionSamplingPrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            diagonal_variance=True),
        alg_name="gp_predict")
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=40), infr_params=infr.params)
    (samples,) = pred.run(X=X)
    s = np.asarray(samples)
    assert s.shape == (40, 30, 1)
    err = np.abs(s.mean(axis=0) - np.sin(X)).mean()
    assert err < 0.2


def test_attach_dedup_keeps_single_entry():
    rng = np.random.default_rng(3)
    X = rng.random((10, 1))
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1), noise_var=m.noise_var,
        shape=(m.N, 1))
    gp = m.Y.factor
    conditionals = tuple(sorted(gp.input_names))
    n_before = len(gp._prediction_algorithms[conditionals])
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=GPRegressionSamplingPrediction(
            gp._module_graph, gp._extra_graphs[0],
            [v for _, v in gp.inputs]),
        alg_name="gp_predict")
    assert len(gp._prediction_algorithms[conditionals]) == n_before
    assert isinstance(gp.gp_predict, GPRegressionSamplingPrediction)


def test_cond_gp_sampling_moments():
    rng = np.random.default_rng(4)
    M, N = 5, 3
    Z = rng.standard_normal((M, 1))
    U = rng.standard_normal((M, 1))
    X = rng.standard_normal((N, 1))
    kernel = RBF(input_dim=1, dtype="float64")
    Xv, Zv, Uv = Variable(shape=(N, 1)), Variable(shape=(M, 1)), \
        Variable(shape=(M, 1))
    gp_var = ConditionalGaussianProcess.define_variable(
        X=Xv, X_cond=Zv, Y_cond=Uv, kernel=kernel, shape=(N, 1),
        dtype="float64", jitter=1e-10)
    dist = gp_var.factor
    env = {Xv.uuid: jnp.asarray(X)[None], Zv.uuid: jnp.asarray(Z)[None],
           Uv.uuid: jnp.asarray(U)[None]}
    for name, v in dist.inputs:
        if name.endswith("lengthscale") or name.endswith("variance"):
            env[v.uuid] = jnp.ones((1, 1))
    samples = np.asarray(dist.draw_samples(
        env, jax.random.PRNGKey(0), num_samples=30000))[:, :, 0]

    def np_rbf(A, B):
        return np.exp(-0.5 * ((A[:, None, :] - B[None, :, :]) ** 2
                              ).sum(-1))
    Kzz, Kxz, Kxx = np_rbf(Z, Z), np_rbf(X, Z), np_rbf(X, X)
    Kzz_inv = np.linalg.inv(Kzz)
    mean_c = (Kxz @ Kzz_inv @ U)[:, 0]
    cov_c = Kxx - Kxz @ Kzz_inv @ Kxz.T
    assert np.allclose(samples.mean(0), mean_c, atol=0.05)
    assert np.allclose(np.cov(samples.T), cov_c, atol=0.05)
