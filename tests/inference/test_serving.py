"""BatchedPredictor: compile-once chunked prediction for serving."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression, SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm,
    TransferInference, BatchedPredictor)


def _trained_gp(rng, N=40):
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.N, 1))
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    infr.run(max_iter=60, learning_rate=0.05, X=X, Y=Y)
    return m, infr


def test_batched_predictor_matches_full_prediction():
    rng = np.random.default_rng(0)
    m, infr = _trained_gp(rng)
    Xt = np.linspace(0, 4, 50)[:, None]

    full = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu_full, var_full = full.run(X=Xt)[0]

    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    mu_b, var_b = pred.predict(X=Xt)[0]
    # 50 points through chunk 16 => 3 full chunks + padded tail of 2
    assert mu_b.shape == np.asarray(mu_full).shape
    np.testing.assert_allclose(mu_b, np.asarray(mu_full), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(var_b, np.asarray(var_full), rtol=1e-4,
                               atol=1e-7)


def test_batched_predictor_reuses_compiled_executor():
    rng = np.random.default_rng(1)
    m, infr = _trained_gp(rng)
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=8)
    pred.predict(X=np.linspace(0, 4, 24)[:, None])
    jitted = pred._jitted
    out = pred.predict(X=np.linspace(0, 4, 5)[:, None])  # N < chunk
    assert pred._jitted is jitted  # no rebuild
    assert out[0][0].shape[-2] == 5


def test_batched_predictor_svgp():
    rng = np.random.default_rng(2)
    N = 60
    X = rng.random((N, 2)) * 4
    Y = np.sin(X[:, :1]) + rng.standard_normal((N, 1)) * 0.1
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=2, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(8, 2),
                                 initial_value=rng.random((8, 2)) * 4))
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    infr.run(max_iter=40, learning_rate=0.05, X=X, Y=Y)

    full = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu_full, var_full = full.run(X=X)[0]
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=25)
    mu_b, var_b = pred.predict(X=X)[0]
    np.testing.assert_allclose(mu_b, np.asarray(mu_full), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(var_b, np.asarray(var_full), rtol=1e-4,
                               atol=1e-7)


def test_export_and_load_predictor_roundtrip(tmp_path):
    """AOT artifact: export the compiled predictor, reload WITHOUT the
    model graph, predictions must match exactly."""
    from mxfusion_tpu.inference import load_exported_predictor
    rng = np.random.default_rng(3)
    m, infr = _trained_gp(rng)
    Xt = np.linspace(0, 4, 37)[:, None]

    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    mu_live, var_live = pred.predict(X=Xt)[0]

    path = str(tmp_path / "predictor.zip")
    pred.export(path)
    served = load_exported_predictor(path)
    mu_srv, var_srv = served.predict(X=Xt)[0]
    np.testing.assert_allclose(np.asarray(mu_srv),
                               np.asarray(mu_live), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var_srv),
                               np.asarray(var_live), rtol=1e-6)


def test_export_before_predict_needs_example(tmp_path):
    import pytest as _pytest
    rng = np.random.default_rng(4)
    m, infr = _trained_gp(rng)
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=8)
    path = str(tmp_path / "p.zip")
    with _pytest.raises(ValueError):
        pred.export(path)
    # with example data it compiles then exports
    Xt = np.linspace(0, 4, 20)[:, None]
    pred.export(path, X=Xt)
    from mxfusion_tpu.inference import load_exported_predictor
    served = load_exported_predictor(path)
    mu, var = served.predict(X=Xt)[0]
    assert np.asarray(mu).shape[-2] == 20


def test_batched_predictor_multioutput_lmc():
    # multi-output (C=3) module through the chunked server: (s, N, C)
    # means and diagonal variances concatenate on the right axis and
    # match the direct predictor (f32 reassociation tolerance)
    from mxfusion_tpu.modules import LMCSVGPRegression
    rng = np.random.default_rng(0)
    N, C, Q = 60, 3, 2
    X = np.sort(rng.random((N, 1)) * 6, 0)
    G = np.stack([np.sin(X[:, 0]), np.cos(1.3 * X[:, 0])], -1)
    Y = G @ np.array([[1.0, 0.5, -1.0], [0.2, -0.8, 0.4]]) \
        + rng.standard_normal((N, C)) * 0.05
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.Y = LMCSVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1), num_outputs=C, num_latents=Q,
        shape=(m.n, C),
        inducing_inputs=Variable(
            shape=(10, 1),
            initial_value=np.linspace(0.1, 5.9, 10)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    infr.run(X=X, Y=Y, max_iter=60, learning_rate=0.05, verbose=False)
    Xt = np.linspace(0.0, 6.0, 37)[:, None]   # not a chunk multiple
    direct = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu_d, var_d = direct.run(X=Xt)[0]
    bp = BatchedPredictor(model=m, infr_params=infr.params,
                          observed=[m.X], target_variables=[m.Y.uuid],
                          chunk_size=16)
    mu_b, var_b = bp.predict(X=Xt)[0]
    assert np.asarray(mu_b).shape == (1, 37, C)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_d),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_d),
                               rtol=1e-4, atol=1e-7)
