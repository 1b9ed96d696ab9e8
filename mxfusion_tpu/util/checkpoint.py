"""Mid-training checkpoint/resume.

The reference can only save a *finished* Inference (SURVEY §5:
checkpoint/resume "absent" as a mid-training capability). Here a loop
callback periodically snapshots the parameter pytree to npz; training
resumes deterministically by loading the snapshot into the
InferenceParameters before re-running the loop.
"""
import os

import numpy as np
import jax.numpy as jnp

from .serialization import make_numpy_zip_bytes, read_numpy_zip_bytes


class CheckpointCallback:
    """Pass as ``callback=`` to a gradient loop.

    NOTE: loops invoke callbacks as ``callback(iteration, loss)``; the
    parameter store is captured by reference and snapshot-synced from
    device at save time (an async-dispatch-friendly host copy).
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
    """Snapshot InferenceParameters (params + fixed markers) to disk."""
    payload = {"param:" + k: np.asarray(v)
               for k, v in params.param_dict.items()}
    payload["__fixed__"] = np.asarray(sorted(params.fixed), dtype="U64")
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
    Inference.save/load reconciliation instead). Returns the saved step
    (or None)."""
    with open(path, "rb") as f:
        payload = read_numpy_zip_bytes(f.read())
    step = None
    for k, v in payload.items():
        if k == "__step__":
            step = int(v)
        elif k == "__fixed__":
            params.fixed.update(str(u) for u in v.tolist())
        elif k.startswith("param:"):
            params.param_dict[k[len("param:"):]] = jnp.asarray(v)
    return step
