"""Mid-training checkpoint/resume.

The reference can only save a *finished* Inference
(/root/reference/mxfusion/inference/inference.py:255-310; SURVEY §5:
checkpoint/resume "absent" as a mid-training capability). Here a loop
callback periodically snapshots the FULL training state to npz — the
parameter pytree plus the loop's optimizer moments, carried PRNG key,
and step — and training resumes DETERMINISTICALLY: a run restored from
a snapshot reproduces the uninterrupted run's loss trajectory exactly
(asserted to ~1e-12 in tests/inference/test_crash_resume.py).

Usage::

    ckpt = CheckpointCallback(infr.params, "run.npz", every=100)
    infr.run(max_iter=2000, callback=ckpt, ...)        # crashes at 512
    # --- new attempt ---
    state = load_params(infr.params, "run.npz")        # state.step == 500
    infr.run(max_iter=2000, callback=ckpt, resume_state=state, ...)

The optimizer state is stored as flattened leaves; resuming rebuilds
the optimizer from the loop's ``optimizer=``/``learning_rate=``
arguments (they must match the checkpointed run — a leaf-count
mismatch raises).
"""
import os

import numpy as np
import jax.numpy as jnp

from .serialization import make_numpy_zip_bytes, read_numpy_zip_bytes


class CheckpointCallback:
    """Pass as ``callback=`` to a gradient loop.

    NOTE: loops invoke callbacks as ``callback(iteration, loss)``; the
    parameter store is captured by reference and snapshot-synced from
    device at save time (an async-dispatch-friendly host copy). Loops
    also publish their live optimizer state on ``params.train_state``
    right before the callback fires, so snapshots carry the full
    deterministic-resume state.
    """

    def __init__(self, params, path, every=100):
        self.params = params
        self.path = path
        self.every = every

    def __call__(self, iteration, loss):
        if (iteration + 1) % self.every != 0:
            return
        save_params(self.params, self.path, step=iteration + 1)


def save_params(params, path, step=None):
    """Snapshot InferenceParameters (params + fixed markers) and, when
    the loop has published one, the live TrainState (optimizer moments
    + PRNG key + step) to disk atomically."""
    payload = {"param:" + k: np.asarray(v)
               for k, v in params.param_dict.items()}
    payload["__fixed__"] = np.asarray(sorted(params.fixed), dtype="U64")
    state = getattr(params, "train_state", None)
    if state is not None:
        if step is None:
            step = state.step
        if state.key is not None:
            payload["__key__"] = np.asarray(state.key)
        for i, leaf in enumerate(state.opt_leaves or []):
            payload["opt:{:05d}".format(i)] = np.asarray(leaf)
    if step is not None:
        payload["__step__"] = np.asarray(step)
    data = make_numpy_zip_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_params(params, path):
    """Load a snapshot into an InferenceParameters (UUIDs must match —
    i.e. the same in-process graphs; cross-process restore goes through
    Inference.save/load reconciliation instead).

    Returns a :class:`~..inference.grad_loop.TrainState` — pass it as
    ``resume_state=`` to ``infr.run`` / a loop's ``run`` to resume the
    optimizer trajectory deterministically (``state.step`` holds the
    saved step; snapshots written before the full-state capture load
    with ``key=None, opt_leaves=None`` and resume params-only, as
    before).
    """
    from ..inference.grad_loop import TrainState  # avoid import cycle
    with open(path, "rb") as f:
        payload = read_numpy_zip_bytes(f.read())
    step = 0
    key = None
    opt = {}
    for k, v in payload.items():
        if k == "__step__":
            step = int(v)
        elif k == "__key__":
            key = jnp.asarray(v)
        elif k == "__fixed__":
            params.fixed.update(str(u) for u in v.tolist())
        elif k.startswith("opt:"):
            opt[int(k[len("opt:"):])] = v
        elif k.startswith("param:"):
            params.param_dict[k[len("param:"):]] = jnp.asarray(v)
    leaves = [opt[i] for i in sorted(opt)] if opt else None
    state = TrainState(step=step, key=key, opt_leaves=leaves)
    params.train_state = state
    return state
