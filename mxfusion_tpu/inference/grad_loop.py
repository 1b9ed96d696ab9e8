"""Abstract gradient loop.

Reference: /root/reference/mxfusion/inference/grad_loop.py:19-45.
"""
from abc import ABC, abstractmethod


class GradLoop(ABC):
    @staticmethod
    def _sync_live_state(params, trainable, fixed):
        """Write the loop's current trainable/fixed state back into the
        parameter store so callbacks (e.g. CheckpointCallback) observe
        live values rather than the values from loop entry."""
        params.update_params(trainable)
        params.update_params(fixed)

    @abstractmethod
    def run(self, executor, params, data, optimizer="adam",
            learning_rate=1e-3, max_iter=1000, key=None, verbose=False,
            callback=None, mesh=None):
        """Run the optimization loop; returns the final loss."""
