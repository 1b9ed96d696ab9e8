"""Module replication (clone) and SVGP serialization round trip."""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression, SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, create_executor)


def _gp_model(cls=GPRegression, **kw):
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = cls.define_variable(
        X=m.X, kernel=RBF(input_dim=1, dtype="float64"),
        noise_var=m.noise_var, shape=(m.N, 1), dtype="float64", **kw)
    return m


def test_clone_model_with_module_evaluates_identically():
    rng = np.random.default_rng(0)
    X = rng.random((15, 1)) * 4
    Y = np.sin(X)
    m = _gp_model()
    m2 = m.clone()
    # same UUIDs for module and its internals
    gp1, gp2 = m.Y.factor, m2.Y.factor
    assert gp1.uuid == gp2.uuid
    assert gp1 is not gp2
    k1 = gp1._module_graph.kernel
    k2 = gp2._module_graph.kernel
    assert k1.lengthscale.uuid == k2.lengthscale.uuid

    def value(model):
        alg = MAP(model=model, observed=[model.X, model.Y])
        infr = GradBasedInference(inference_algorithm=alg,
                                  dtype="float64")
        infr.initialize(X=X, Y=Y)
        ex = create_executor(alg, infr.params)
        loss, _, _ = ex(infr.params.trainable_params(),
                        infr.params.fixed_params(), [X, Y],
                        jax.random.PRNGKey(0))
        return float(loss)

    assert np.isclose(value(m), value(m2), rtol=1e-10)


def test_svgp_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    X = rng.random((40, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((40, 1)) * 0.1
    Z0 = np.linspace(0, 4, 6)[:, None]

    def build():
        return _gp_model(SVGPRegression,
                         inducing_inputs=Variable(shape=(6, 1),
                                                  initial_value=Z0))

    m1 = build()
    infr1 = GradBasedInference(
        inference_algorithm=MAP(model=m1, observed=[m1.X, m1.Y]),
        dtype="float64")
    infr1.run(max_iter=60, learning_rate=0.05, X=X, Y=Y)
    path = str(tmp_path / "svgp.zip")
    infr1.save(path)

    m2 = build()
    infr2 = GradBasedInference(
        inference_algorithm=MAP(model=m2, observed=[m2.X, m2.Y]),
        dtype="float64")
    infr2.initialize(X=X, Y=Y)
    infr2.load(path)
    # variational parameters inside the module posterior reconciled over
    q1 = m1.Y.factor._extra_graphs[0]
    q2 = m2.Y.factor._extra_graphs[0]
    assert np.allclose(np.asarray(infr1.params[q1.qU_mean]),
                       np.asarray(infr2.params[q2.qU_mean]))
    assert np.allclose(np.asarray(infr1.params[q1.qU_cov_diag]),
                       np.asarray(infr2.params[q2.qU_cov_diag]))
