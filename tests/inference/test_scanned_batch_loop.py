"""Scanned (steps_per_call) full-batch loop tests.

The scanned path must produce the same optimization trajectory as the
per-step path for a deterministic objective, including the SET_ module
cache carried through the scan (ADVICE r1: the carried aux must be
seeded from CURRENT state each call, not a stale closure constant).
"""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression
from mxfusion_tpu.inference import (GradBasedInference, MAP,
                                    BatchInferenceLoop)


def _make_gp():
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


def _train(steps_per_call, max_iter=20):
    rng = np.random.default_rng(0)
    X = rng.random((25, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((25, 1)) * 0.1
    m = _make_gp()
    loop = BatchInferenceLoop(steps_per_call=steps_per_call)
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)
    infr.run(max_iter=max_iter, learning_rate=0.05, X=X, Y=Y)
    k = m.Y.factor._module_graph.kernel
    return infr, m, np.asarray(infr.params[k.lengthscale]).item()


def test_scanned_batch_loop_matches_per_step():
    _, _, ls1 = _train(steps_per_call=1)
    infr5, m5, ls5 = _train(steps_per_call=5)
    assert np.isclose(ls1, ls5, rtol=1e-5), (ls1, ls5)
    # module caches rode through the scan and landed in fixed storage
    assert len(infr5.params.fixed) > 0
    for u in infr5.params.fixed:
        assert u in infr5.params.param_dict


def test_scanned_batch_loop_uneven_chunks():
    # max_iter not a multiple of steps_per_call still runs
    _, _, ls = _train(steps_per_call=7, max_iter=20)
    assert np.isfinite(ls)


def test_metrics_callback_reports_structured_dict():
    """metrics_callback receives {"loss","grad_norm","step_time_s"}
    computed inside the jitted step (SURVEY §5 metrics row)."""
    rng = np.random.default_rng(1)
    X = rng.random((20, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((20, 1)) * 0.1
    for spc in (1, 5):
        records = []
        m = _make_gp()
        loop = BatchInferenceLoop(
            steps_per_call=spc,
            metrics_callback=lambda i, mtr: records.append((i, mtr)))
        infr = GradBasedInference(
            inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
            grad_loop=loop)
        infr.run(max_iter=10, learning_rate=0.05, X=X, Y=Y)
        assert len(records) == (10 if spc == 1 else 2)
        for i, mtr in records:
            assert set(mtr) == {"loss", "grad_norm", "step_time_s"}
            assert np.isfinite(mtr["loss"])
            assert mtr["grad_norm"] >= 0
            assert mtr["step_time_s"] > 0
        # gradients shrink as MAP converges
        assert records[-1][1]["loss"] < records[0][1]["loss"]
