"""Fault-injection: crash mid-training, resume from the checkpoint.

The reference has no failure-recovery mechanism (SURVEY §5; its
save/load covers finished runs only,
/root/reference/mxfusion/inference/inference.py:255-310). This is the
deterministic-resume capability the TPU-native design adds: a
checkpoint captures params + optimizer moments + PRNG key + step, and
a resumed run reproduces the uninterrupted run's loss trajectory
EXACTLY (bitwise on the same machine; asserted to 1e-12 here).
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


def _build(y_len=60):
    """Identically-constructed model+SVI driver (fresh UUIDs, identical
    numerics: inits derive from construction order + fixed keys)."""
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (y_len, 1)),
                                 variance=broadcast_to(m.s, (y_len, 1)),
                                 shape=(y_len, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=8, model=m,
                                         posterior=q, observed=[m.y])
    return m, q, GradBasedInference(inference_algorithm=alg)


def test_crash_and_resume_deterministic(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((60, 1)) * 2.0 + 3.0
    total = 40

    # ---- reference: one uninterrupted run
    _, q_ref, infr_ref = _build()
    ref_losses = {}
    infr_ref.run(max_iter=total, learning_rate=0.1, y=y,
                 callback=lambda i, l: ref_losses.__setitem__(
                     i, float(l)))
    ref_mu = np.asarray(infr_ref.params[q_ref.mu.factor.mean]).item()

    # ---- crashing run: checkpoint every 10, crash after step 25
    m, q, infr = _build()
    path = str(tmp_path / "ckpt.npz")
    ckpt = CheckpointCallback(infr.params, path, every=10)
    losses = {}

    at_ckpt = {}

    def crashing_callback(i, loss):
        ckpt(i, loss)
        losses[i] = float(loss)
        if i == 19:  # remember the live state the checkpoint captured
            at_ckpt["mu"] = np.asarray(
                infr.params[q.mu.factor.mean]).item()
        if i == 24:  # crash after the step-20 checkpoint was written
            raise SimulatedCrash()

    with pytest.raises(SimulatedCrash):
        infr.run(max_iter=total, learning_rate=0.1, y=y,
                 callback=crashing_callback)
    # identically-built models follow identical pre-crash trajectories
    for i in range(25):
        assert losses[i] == ref_losses[i], i

    # ---- resume: restore the snapshot (params + optimizer moments +
    # PRNG key + step) and continue in the same process
    state = load_params(infr.params, path)
    assert state.step == 20
    assert state.key is not None and state.opt_leaves
    # the checkpoint must hold the TRAINED step-20 state, not the values
    # from loop entry (regression: loops used to write back only at the
    # end of run(), so mid-training checkpoints froze the initial state)
    restored_mu = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert np.isclose(restored_mu, at_ckpt["mu"], rtol=1e-6)
    assert abs(restored_mu) > 1e-3  # moved away from the zero init

    resumed_losses = {}
    infr.run(max_iter=total, learning_rate=0.1, y=y,
             resume_state=state,
             callback=lambda i, l: resumed_losses.__setitem__(
                 i, float(l)))
    # resumed run covers exactly the remaining iterations...
    assert sorted(resumed_losses) == list(range(20, total))
    # ...and reproduces the uninterrupted trajectory (moments + key
    # restored => identical update sequence)
    for i in range(20, total):
        np.testing.assert_allclose(resumed_losses[i], ref_losses[i],
                                   rtol=0, atol=1e-12)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    np.testing.assert_allclose(mu_post, ref_mu, rtol=0, atol=1e-12)


def test_resume_requires_matching_optimizer(tmp_path):
    """Resuming with a different optimizer (different state leaf count)
    fails loudly instead of silently reinitializing moments."""
    rng = np.random.default_rng(1)
    y = rng.standard_normal((60, 1)) + 1.0
    _, _, infr = _build()
    path = str(tmp_path / "ckpt.npz")
    infr.run(max_iter=10, learning_rate=0.1, y=y,
             callback=CheckpointCallback(infr.params, path, every=10))
    state = load_params(infr.params, path)
    with pytest.raises(ValueError, match="optimizer"):
        infr.run(max_iter=20, learning_rate=0.1, y=y, optimizer="sgd",
                 resume_state=state)


def test_final_train_state_published_without_callback(tmp_path):
    """Loops publish the FINAL TrainState even in callback-less runs
    (r4 review finding): a snapshot taken after a second, callback-less
    run must carry that run's optimizer state, not the first run's."""
    from mxfusion_tpu.util.checkpoint import save_params
    rng = np.random.default_rng(2)
    y = rng.standard_normal((60, 1)) + 1.0
    _, _, infr = _build()
    infr.run(max_iter=10, learning_rate=0.1, y=y,
             callback=lambda i, l: None)       # publishes step 10
    infr.run(max_iter=30, learning_rate=0.1, y=y)  # NO callback
    state = infr.params.train_state
    assert state is not None and state.step == 30
    path = str(tmp_path / "post.npz")
    save_params(infr.params, path)
    st2 = load_params(infr.params, path)
    assert st2.step == 30 and st2.opt_leaves


def test_resume_rejects_mismatched_leaf_shapes(tmp_path):
    """A checkpoint whose optimizer-state leaf shapes do not match the
    loop's optimizer raises instead of silently broadcasting wrong
    moments."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    y = rng.standard_normal((60, 1)) + 1.0
    _, _, infr = _build()
    path = str(tmp_path / "ckpt.npz")
    infr.run(max_iter=10, learning_rate=0.1, y=y,
             callback=CheckpointCallback(infr.params, path, every=10))
    state = load_params(infr.params, path)
    state.opt_leaves = [jnp.zeros(np.asarray(l).shape + (1,))
                        for l in state.opt_leaves]
    with pytest.raises(ValueError, match="shape"):
        infr.run(max_iter=20, learning_rate=0.1, y=y,
                 resume_state=state)


def test_train_state_legacy_int_comparison_warns():
    """Pre-0.4 callers did `step = load_params(...); step == n` — the
    TrainState return must fail LOUDLY (deprecation warning + correct
    value), not silently compare unequal (r4 advisor finding)."""
    import warnings
    from mxfusion_tpu.inference.grad_loop import TrainState
    st = TrainState(step=500)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert int(st) == 500
        assert st == 500
        assert not (st == 499)
        assert len([x for x in w
                    if issubclass(x.category, DeprecationWarning)]) >= 2
    assert not (st == "500")
