"""BatchedPredictor: compile-once chunked prediction for serving."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import (DeepGPRegression, GPRegression,
                                  SVGPRegression)
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


def test_batched_predictor_full_covariance_block_diagonal():
    """Full-covariance GP prediction through the chunked server: the
    (s, C, C) leaves are recognized as two-data-axis covariances and
    merged block-diagonally — within-chunk blocks equal the direct
    prediction, cross-chunk entries are zero (documented semantics)."""
    from mxfusion_tpu.modules.gp_modules.gp_regression import \
        GPRegressionMeanVariancePrediction
    rng = np.random.default_rng(2)
    m, infr = _trained_gp(rng)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=GPRegressionMeanVariancePrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            noise_free=False, diagonal_variance=False),
        alg_name="gp_predict")
    C = 16
    Xt = np.linspace(0, 4, 38)[:, None]   # 2 full chunks + pad 10
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=C)
    mu_b, cov_b = pred.predict(X=Xt)[0]
    cov_b = np.asarray(cov_b)
    assert cov_b.shape == (1, 38, 38)

    direct = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    for lo in (0, 16, 32):
        hi = min(lo + C, 38)
        mu_d, cov_d = direct.run(X=Xt[lo:hi])[0]
        np.testing.assert_allclose(cov_b[0, lo:hi, lo:hi],
                                   np.asarray(cov_d)[0], rtol=1e-5,
                                   atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(mu_b)[0, lo:hi], np.asarray(mu_d)[0],
            rtol=1e-5, atol=1e-9)
    # cross-chunk covariance is zero by construction
    assert np.all(cov_b[0, :16, 16:32] == 0.0)


def test_lmc_full_output_cov_serving_and_export(tmp_path):
    """LMC per-point cross-output covariance (s, N, C, C) serves
    chunked (the trailing square axes are OUTPUT axes, not data axes)
    and round-trips through export/load including recorded input
    dtypes (a float64 request against the compiled dtype must cast,
    not error)."""
    from mxfusion_tpu.modules import LMCSVGPRegression
    from mxfusion_tpu.modules.gp_modules.lmc_svgp import \
        LMCSVGPMeanVariancePrediction
    from mxfusion_tpu.inference import load_exported_predictor
    rng = np.random.default_rng(3)
    N, C, Q = 50, 3, 2
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
            shape=(8, 1), initial_value=np.linspace(0.1, 5.9, 8)[:, None]))
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    infr.run(X=X, Y=Y, max_iter=40, learning_rate=0.05, verbose=False)
    lmc = m.Y.factor
    observed = [v for _, v in lmc.inputs]
    lmc.attach_prediction_algorithms(
        targets=lmc.output_names, conditionals=lmc.input_names,
        algorithm=LMCSVGPMeanVariancePrediction(
            lmc._module_graph, lmc._extra_graphs[0], observed,
            noise_free=False, full_output_cov=True),
        alg_name="lmc_svgp_predict")
    Xt = np.linspace(0.0, 6.0, 37)[:, None]
    direct = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu_d, cov_d = direct.run(X=Xt)[0]
    assert np.asarray(cov_d).shape == (1, 37, C, C)

    bp = BatchedPredictor(model=m, infr_params=infr.params,
                          observed=[m.X], target_variables=[m.Y.uuid],
                          chunk_size=16)
    mu_b, cov_b = bp.predict(X=Xt)[0]
    assert np.asarray(cov_b).shape == (1, 37, C, C)
    np.testing.assert_allclose(np.asarray(cov_b), np.asarray(cov_d),
                               rtol=1e-5, atol=1e-9)

    path = str(tmp_path / "lmc_predictor.zip")
    bp.export(path)
    served = load_exported_predictor(path)
    mu_s, cov_s = served.predict(X=Xt)[0]
    np.testing.assert_allclose(np.asarray(cov_s), np.asarray(cov_b),
                               rtol=1e-6)
    # recorded-dtype cast: float32 request against the f64-compiled
    # artifact must be cast (no dtype-mismatch error, close results)
    mu_32, cov_32 = served.predict(X=Xt.astype(np.float32))[0]
    np.testing.assert_allclose(np.asarray(mu_32), np.asarray(mu_s),
                               rtol=1e-5, atol=1e-6)


def test_ambiguous_trailing_square_leaf_raises():
    """A trailing (C, C) leaf with no declared spec is AMBIGUOUS
    (full covariance vs features == chunk_size) and must raise rather
    than guess (r4 advisor finding)."""
    from mxfusion_tpu.inference.serving import _leaf_data_axes
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ambiguous"):
        _leaf_data_axes((1, 16, 16), 16)
    # an unambiguous single data axis still infers fine
    assert _leaf_data_axes((1, 16, 3), 16) == (1,)
    # a declared spec overrides
    assert _leaf_data_axes((1, 16, 16), 16, spec=(1, 2)) == (1, 2)


def test_legacy_artifact_assumes_covariance_with_warning():
    """Pre-0.5 exported artifacts carry no output_spec and cannot be
    retrofitted — for them the trailing-(C, C) ambiguity must keep the
    old warn-and-assume-covariance behavior instead of the hard error
    (crash regression on persisted deployments, r5 review)."""
    import warnings
    from mxfusion_tpu.inference.serving import _leaf_data_axes
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        axes = _leaf_data_axes((1, 16, 16), 16, legacy_assume_cov=True)
    assert axes == (1, 2)
    assert any("legacy artifact" in str(x.message) for x in w)


def test_derived_spec_validated_per_leaf():
    """A module-DERIVED output_spec is a structural guess: a leaf whose
    shape is inconsistent with its declared axes must fall back to
    per-leaf inference (not silently merge a (rows, features) leaf as
    a covariance; r5 review finding)."""
    import jax as _jax
    from mxfusion_tpu.inference.serving import (_chunked_predict,
                                                _DerivedSpec)
    C, N = 8, 16

    def call(chunk, k):
        x = np.asarray(chunk[0])
        # leaf 0: (1, C, C) true covariance; leaf 1: (1, C, 3) rows x
        # features — the derived spec wrongly declares it (1, 2)
        return (np.ones((1, C, C)) * x[0, 0],
                np.ones((1, C, 3)) * x[0, 0])

    spec = _DerivedSpec([(1, 2), (1, 2)])
    data = [np.arange(N, dtype=np.float64)[:, None]]
    cov, feat = _chunked_predict(call, C, data,
                                 _jax.random.PRNGKey(0),
                                 output_spec=spec)
    assert cov.shape == (1, N, N)        # merged block-diagonally
    assert feat.shape == (1, N, 3)       # inferred: concat on axis 1


def test_gp_module_derives_output_spec():
    """GP module prediction algorithms declare serving_data_axes, so a
    full-covariance single-module predictor derives its output_spec
    instead of shape-guessing."""
    from mxfusion_tpu.modules.gp_modules.gp_regression import \
        GPRegressionMeanVariancePrediction
    rng = np.random.default_rng(7)
    m, infr = _trained_gp(rng)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=GPRegressionMeanVariancePrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            noise_free=False, diagonal_variance=False),
        alg_name="gp_predict")
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    Xt = np.linspace(0, 4, 20)[:, None]
    mu, cov = pred.predict(X=Xt)[0]
    assert list(pred.output_spec) == [(1,), (1, 2)]
    assert np.asarray(cov).shape == (1, 20, 20)


def test_new_artifact_without_spec_raises_on_ambiguity():
    """legacy warn-and-assume is keyed on the artifact FORMAT (1.0),
    not on output_spec-is-None: a new export that happens to carry no
    derivable spec must hard-error on an ambiguous (C, C) leaf exactly
    like the live BatchedPredictor (r5 second review: keying legacy
    mode on spec-is-None silently regressed new exports to guessing)."""
    import warnings
    import jax as _jax
    import pytest as _pytest
    from mxfusion_tpu.inference.serving import ExportedPredictor

    C = 8

    class _Stub:
        @staticmethod
        def call(trainable, fixed, chunk, key):
            return (chunk[0][:, :1] * 0 + np.ones((1, C, C)),)

    Xt = np.arange(2 * C, dtype=np.float32)[:, None]
    new = ExportedPredictor(_Stub, {}, {}, ["X"], C,
                            legacy_assume_cov=False)
    with _pytest.raises(ValueError, match="ambiguous"):
        new.predict(X=Xt)
    legacy = ExportedPredictor(_Stub, {}, {}, ["X"], C,
                               legacy_assume_cov=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        (cov,) = legacy.predict(X=Xt)
    assert cov.shape == (1, 2 * C, 2 * C)
    assert any("legacy artifact" in str(x.message) for x in w)


def test_loader_keys_legacy_mode_on_format_version(tmp_path):
    """Zip surgery on a real artifact: version 1.0 + no spec loads in
    legacy assume-covariance mode; current version + no spec does NOT
    (it gets the live hard-error semantics)."""
    import io as _io
    import json as _json
    import zipfile as _zipfile
    from mxfusion_tpu.inference import load_exported_predictor

    rng = np.random.default_rng(11)
    m, infr = _trained_gp(rng)
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    path = str(tmp_path / "p.zip")
    pred.export(path, X=np.linspace(0, 4, 16)[:, None])

    def rewrite(version):
        with _zipfile.ZipFile(path) as zf:
            items = {n: zf.read(n) for n in zf.namelist()}
        meta = _json.loads(items["meta.json"])
        meta["format_version"] = version
        meta["output_spec"] = None
        meta["output_spec_derived"] = False
        items["meta.json"] = _json.dumps(meta)
        out = str(tmp_path / ("p_" + version + ".zip"))
        with _zipfile.ZipFile(out, "w") as zf:
            for n, b in items.items():
                zf.writestr(n, b)
        return out

    old = load_exported_predictor(rewrite("1.0"))
    assert old._legacy_assume_cov is True
    new = load_exported_predictor(rewrite("1.2"))
    assert new._legacy_assume_cov is False


def test_exported_derived_spec_stays_soft(tmp_path):
    """An output_spec DERIVED from serving_data_axes keeps its soft
    per-leaf-validated semantics through export/load (r5 second
    review: it was serialized as an authoritative user spec)."""
    from mxfusion_tpu.inference import load_exported_predictor
    from mxfusion_tpu.inference.serving import _DerivedSpec
    from mxfusion_tpu.modules.gp_modules.gp_regression import \
        GPRegressionMeanVariancePrediction

    rng = np.random.default_rng(13)
    m, infr = _trained_gp(rng)
    gp = m.Y.factor
    observed = [v for _, v in gp.inputs]
    gp.attach_prediction_algorithms(
        targets=gp.output_names, conditionals=gp.input_names,
        algorithm=GPRegressionMeanVariancePrediction(
            gp._module_graph, gp._extra_graphs[0], observed,
            noise_free=False, diagonal_variance=False),
        alg_name="gp_predict")
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    Xt = np.linspace(0, 4, 20)[:, None]
    mu_live, cov_live = pred.predict(X=Xt)[0]
    assert isinstance(pred.output_spec, _DerivedSpec)

    path = str(tmp_path / "gp_cov.zip")
    pred.export(path)
    served = load_exported_predictor(path)
    assert isinstance(served._output_spec, _DerivedSpec)
    assert served._legacy_assume_cov is False
    mu_srv, cov_srv = served.predict(X=Xt)[0]
    assert np.asarray(cov_srv).shape == (1, 20, 20)
    np.testing.assert_allclose(np.asarray(mu_srv),
                               np.asarray(mu_live), rtol=1e-6)


def test_zero_row_predict_raises():
    """Zero-row input must fail loudly (was IndexError deep in the
    chunk merge)."""
    import pytest as _pytest
    rng = np.random.default_rng(17)
    m, infr = _trained_gp(rng)
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    with _pytest.raises(ValueError, match="zero .*rows"):
        pred.predict(X=np.zeros((0, 1)))


def test_sharded_serving_matches_unsharded():
    """Mesh-sharded BatchedPredictor (params replicated, chunk rows
    split over the data axis via GSPMD) must produce the same
    predictions as the single-device path, including the padded tail
    chunk and an N < chunk_size input."""
    from mxfusion_tpu.parallel import make_mesh
    import pytest as _pytest

    rng = np.random.default_rng(23)
    m, infr = _trained_gp(rng)
    Xt = np.linspace(0, 4, 37)[:, None]   # 2 full chunks + tail pad

    plain = BatchedPredictor(model=m, infr_params=infr.params,
                             observed=[m.X],
                             target_variables=[m.Y.uuid],
                             chunk_size=16)
    mu_p, var_p = plain.predict(X=Xt)[0]

    mesh = make_mesh(8)
    with _pytest.raises(ValueError, match="divisible"):
        BatchedPredictor(model=m, infr_params=infr.params,
                         observed=[m.X], target_variables=[m.Y.uuid],
                         chunk_size=12, mesh=mesh)
    sharded = BatchedPredictor(model=m, infr_params=infr.params,
                               observed=[m.X],
                               target_variables=[m.Y.uuid],
                               chunk_size=16, mesh=mesh)
    mu_s, var_s = sharded.predict(X=Xt)[0]
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_p),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_p),
                               rtol=1e-6, atol=1e-9)

    # N smaller than the chunk: sharded chunks stay full-size (pad +
    # strip), so this exercises the mesh-mode compile-example padding
    short = sharded.predict(X=Xt[:5])[0]
    np.testing.assert_allclose(np.asarray(short[0]),
                               np.asarray(mu_p)[:, :5], rtol=1e-6,
                               atol=1e-9)

    with _pytest.raises(ValueError, match="mesh-sharded"):
        sharded.export("/tmp/should_not_exist.zip")

    # a FRESH sharded predictor whose first call is short compiles
    # from a padded example (mesh chunks are always full-size)
    fresh = BatchedPredictor(model=m, infr_params=infr.params,
                             observed=[m.X],
                             target_variables=[m.Y.uuid],
                             chunk_size=16, mesh=mesh)
    mu_f, _ = fresh.predict(X=Xt[:5])[0]
    np.testing.assert_allclose(np.asarray(mu_f),
                               np.asarray(mu_p)[:, :5], rtol=1e-6,
                               atol=1e-9)


def test_exported_artifact_served_sharded(tmp_path):
    """Artifacts export single-device; load_exported_predictor(mesh=)
    serves them data-parallel — GSPMD partitions the inlined exported
    computation. Predictions must equal the single-device serve."""
    from mxfusion_tpu.inference import load_exported_predictor
    from mxfusion_tpu.parallel import make_mesh
    import pytest as _pytest

    rng = np.random.default_rng(29)
    m, infr = _trained_gp(rng)
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    Xt = np.linspace(0, 4, 37)[:, None]
    mu_live, var_live = pred.predict(X=Xt)[0]
    path = str(tmp_path / "p.zip")
    pred.export(path)

    mesh = make_mesh(8)
    served = load_exported_predictor(path, mesh=mesh)
    mu_s, var_s = served.predict(X=Xt)[0]
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_live),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_live),
                               rtol=1e-6, atol=1e-9)

    # chunk (16) not divisible by a 3-wide axis: loud error
    from jax.sharding import Mesh
    import jax as _jax
    mesh3 = Mesh(np.array(_jax.devices()[:3]), ("d",))
    with _pytest.raises(ValueError, match="divisible"):
        load_exported_predictor(path, mesh=mesh3)


def test_mesh_serving_validation_errors():
    """Curated errors for the sharded-serving misuse cases: wrong axis
    name (was a bare KeyError) and zero-row export example (was an
    opaque chunk=0 compile)."""
    from mxfusion_tpu.parallel import make_mesh
    import pytest as _pytest

    rng = np.random.default_rng(31)
    m, infr = _trained_gp(rng)
    mesh = make_mesh(8)
    with _pytest.raises(ValueError, match="not an axis"):
        BatchedPredictor(model=m, infr_params=infr.params,
                         observed=[m.X], target_variables=[m.Y.uuid],
                         chunk_size=16, mesh=mesh, data_axis="batch")
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    with _pytest.raises(ValueError, match="zero input rows"):
        pred.export("/tmp/never_written.zip", X=np.zeros((0, 1)))


def _trained_deep_gp(num_layers, rng, N=40, num_pred_samples=64):
    X = np.sort(rng.random((N, 1)) * 4, axis=0)
    Y = np.sin(2 * X) + rng.standard_normal((N, 1)) * 0.1
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    Zs = [np.linspace(0.2, 3.8, 6)[:, None]] + \
        [np.linspace(-1.2, 1.2, 6)[:, None]] * (num_layers - 1)
    m.Y = DeepGPRegression.define_variable(
        X=m.X, kernels=[RBF(input_dim=1) for _ in range(num_layers)],
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=[Variable(shape=z.shape, initial_value=z)
                         for z in Zs],
        jitter=1e-5, num_samples=2)
    # prediction cost scales with the MC propagation count: pin it for
    # serving via the attached algorithm's default
    m.Y.factor.deep_gp_predict.default_samples = num_pred_samples
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    infr.run(max_iter=60, learning_rate=0.02, X=X, Y=Y)
    return m, infr, X


def test_batched_predictor_deep_gp_one_layer_exact():
    """1-layer deep GP prediction is analytic (no MC propagation), so
    chunked serving must match the full prediction bit-for-bit-ish."""
    rng = np.random.default_rng(7)
    m, infr, X = _trained_deep_gp(1, rng)
    full = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu_full, var_full = full.run(X=X)[0]
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    mu_b, var_b = pred.predict(X=X)[0]
    np.testing.assert_allclose(mu_b, np.asarray(mu_full), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(var_b, np.asarray(var_full), rtol=1e-4,
                               atol=1e-7)


def test_batched_predictor_deep_gp_two_layer():
    """2-layer serving: per-chunk MC keys differ from the full run's,
    so only statistical agreement of the mixture moments is expected."""
    rng = np.random.default_rng(8)
    m, infr, X = _trained_deep_gp(2, rng, num_pred_samples=128)
    full = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid],
        num_samples=128), infr_params=infr.params)
    mu_full, var_full = full.run(X=X)[0]
    pred = BatchedPredictor(model=m, infr_params=infr.params,
                            observed=[m.X],
                            target_variables=[m.Y.uuid], chunk_size=16)
    mu_b, var_b = pred.predict(X=X)[0]
    assert mu_b.shape == np.asarray(mu_full).shape
    assert np.all(np.isfinite(mu_b)) and np.all(np.isfinite(var_b))
    assert np.all(var_b > 0)
    # per-point statistical bound: the 128-draw mixture-mean MC standard
    # error is at most sqrt(var)/sqrt(128) ≈ sqrt(var)/11, so half a
    # predictive std (~5 se) plus a small absolute floor is generous
    # without being vacuous
    tol = 0.5 * np.sqrt(np.asarray(var_full)).ravel() + 0.05
    diff = np.abs(np.asarray(mu_b).ravel() -
                  np.asarray(mu_full).ravel())
    assert np.all(diff <= tol), (diff.max(), tol[diff.argmax()])
