"""Prediction-algorithm branches: full covariance, predictive noise,
sampling predictions for sparse GP and SVGP."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import (GPRegression, SparseGPRegression,
                                  SVGPRegression)
from mxfusion_tpu.modules.gp_modules.gp_regression import (
    GPRegressionMeanVariancePrediction)
from mxfusion_tpu.modules.gp_modules.sparsegp_regression import (
    SparseGPRegressionSamplingPrediction)
from mxfusion_tpu.modules.gp_modules.svgp_regression import (
    SVGPRegressionSamplingPrediction)
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm, TransferInference)


def _fit(cls, X, Y, Z0=None, max_iter=120):
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, X.shape[1]))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.05)
    kw = {}
    if Z0 is not None:
        kw["inducing_inputs"] = Variable(shape=Z0.shape,
                                         initial_value=Z0)
    m.Y = cls.define_variable(X=m.X, kernel=RBF(input_dim=X.shape[1]),
                              noise_var=m.noise_var, shape=(m.N, 1), **kw)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    infr.run(max_iter=max_iter, learning_rate=0.05, X=X, Y=Y)
    return m, infr


def _predict(m, infr, Xt, num_samples=1):
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=num_samples), infr_params=infr.params)
    return pred.run(X=Xt)[0]


def _data(seed=0, n=40):
    rng = np.random.default_rng(seed)
    X = rng.random((n, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((n, 1)) * 0.05
    return X, Y


def test_gp_full_covariance_and_noisy_prediction():
    X, Y = _data()
    m, infr = _fit(GPRegression, X, Y)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=GPRegressionMeanVariancePrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            noise_free=False, diagonal_variance=False),
        alg_name="gp_predict")
    Xt = np.linspace(0, 4, 10)[:, None]
    mu, cov = _predict(m, infr, Xt)
    cov = np.asarray(cov)[0]
    assert cov.shape == (10, 10)
    # full predictive covariance is symmetric PSD with noise included
    assert np.allclose(cov, cov.T, atol=1e-5)
    noise = float(np.asarray(infr.params[m.noise_var]).ravel()[0])
    assert np.all(np.diagonal(cov) >= noise * 0.5)


def test_sparse_gp_sampling_prediction():
    X, Y = _data(1)
    Z0 = np.linspace(0, 4, 10)[:, None]
    m, infr = _fit(SparseGPRegression, X, Y, Z0=Z0)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=SparseGPRegressionSamplingPrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            diagonal_variance=True),
        alg_name="sgp_predict")
    Xt = np.linspace(0, 4, 12)[:, None]
    (samples,) = (_predict(m, infr, Xt, num_samples=50),)
    s = np.asarray(samples)
    assert s.shape == (50, 12, 1)
    assert np.abs(s.mean(0) - np.sin(Xt)).mean() < 0.3


def test_svgp_sampling_prediction():
    X, Y = _data(2)
    Z0 = np.linspace(0, 4, 10)[:, None]
    m, infr = _fit(SVGPRegression, X, Y, Z0=Z0, max_iter=600)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=SVGPRegressionSamplingPrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            diagonal_variance=True),
        alg_name="svgp_predict")
    Xt = np.linspace(0, 4, 12)[:, None]
    samples = _predict(m, infr, Xt, num_samples=50)
    s = np.asarray(samples)
    assert s.shape == (50, 12, 1)
    assert np.abs(s.mean(0) - np.sin(Xt)).mean() < 0.35
