"""Fault-injection: crash mid-training, resume from the checkpoint.

The reference has no failure-recovery mechanism (SURVEY §5); this is
the deterministic-resume capability the TPU-native design adds.
"""
import numpy as np
import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)
from mxfusion_tpu.util.checkpoint import CheckpointCallback, load_params


class SimulatedCrash(RuntimeError):
    pass


def test_crash_and_resume(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((60, 1)) * 2.0 + 3.0
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (60, 1)),
                                 variance=broadcast_to(m.s, (60, 1)),
                                 shape=(60, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=8, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    path = str(tmp_path / "ckpt.npz")
    ckpt = CheckpointCallback(infr.params, path, every=10)
    losses = []

    at_ckpt = {}

    def crashing_callback(i, loss):
        ckpt(i, loss)
        losses.append(float(loss))
        if i == 19:  # remember the live state the checkpoint captured
            at_ckpt["mu"] = np.asarray(
                infr.params[q.mu.factor.mean]).item()
        if i == 24:  # crash after the step-20 checkpoint was written
            raise SimulatedCrash()

    with pytest.raises(SimulatedCrash):
        infr.run(max_iter=200, learning_rate=0.1, y=y,
                 callback=crashing_callback)
    crash_loss = losses[-1]

    # resume: restore the snapshot into the (live) parameter store and
    # continue training
    step = load_params(infr.params, path)
    assert step == 20
    # the checkpoint must hold the TRAINED step-20 state, not the values
    # from loop entry (regression: loops used to write back only at the
    # end of run(), so mid-training checkpoints froze the initial state)
    restored_mu = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert np.isclose(restored_mu, at_ckpt["mu"], rtol=1e-6)
    assert abs(restored_mu) > 1e-3  # moved away from the zero init
    infr.run(max_iter=200, learning_rate=0.1, y=y,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < crash_loss
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.4
