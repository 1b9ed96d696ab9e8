"""Gradient-based inference drivers.

Reference: /root/reference/mxfusion/inference/grad_based_inference.py:22-140.
"""
from .inference import Inference, TransferInference
from .inference_alg import create_executor
from .batch_loop import BatchInferenceLoop
from .minibatch_loop import MinibatchInferenceLoop
from ..util.inference import discover_shape_constants

import numpy as np


class GradBasedInference(Inference):
    """Inference driven by a gradient loop (reference :22-105)."""

    def __init__(self, inference_algorithm, grad_loop=None, constants=None,
                 dtype=None):
        if grad_loop is None:
            grad_loop = BatchInferenceLoop()
        super().__init__(inference_algorithm=inference_algorithm,
                         constants=constants, dtype=dtype)
        self._grad_loop = grad_loop

    @property
    def grad_loop(self):
        return self._grad_loop

    def _bind_minibatch_shapes(self, data):
        """For minibatch loops, symbolic data dims bind to the batch size
        (all batches are identical thanks to rollover → one XLA compile)."""
        B = self._grad_loop.batch_size
        data_shapes = {uuid: (min(B, np.shape(d)[0]),) +
                       tuple(np.shape(d)[1:])
                       for uuid, d in zip(self.observed_variable_UUIDs, data)}
        shape_constants = discover_shape_constants(data_shapes, self.graphs)
        self.params.constants.update(shape_constants)

    def run(self, optimizer="adam", learning_rate=1e-3, max_iter=2000,
            verbose=False, key=None, callback=None, data_sharding=None,
            remat=False, rv_scaling=None, resume_state=None, **kwargs):
        """``rv_scaling``: {variable or uuid: scalar or array} factors
        multiplying a RANDVAR's elementwise log-density. A scalar is
        the reference's minibatch correction; an ARRAY broadcasting
        against the variable's event shape is an observation mask /
        per-point weight (0 = missing entry; set the placeholder value
        to anything finite). Array scaling applies to distribution
        likelihoods — module bounds scale their already-summed data
        term, so they accept scalars only."""
        data = [np.asarray(d) for d in self._fetch_observed(kwargs)]
        is_minibatch = isinstance(self._grad_loop, MinibatchInferenceLoop)
        if is_minibatch:
            if rv_scaling is not None:
                raise ValueError(
                    "pass rv_scaling to MinibatchInferenceLoop for "
                    "minibatch runs (it composes with the N/B "
                    "correction there).")
            self._bind_minibatch_shapes(data)
            # allocate parameters against batch-sized shapes
            self.params.initialize_params(
                self.graphs, self.observed_variable_UUIDs, key=key)
            self._initialized = True
            rv_scaling = self._grad_loop.rv_scaling
        else:
            self.initialize(key=key, **kwargs)
            if rv_scaling is not None:
                rv_scaling = {
                    (k.uuid if hasattr(k, "uuid") else k): v
                    for k, v in rv_scaling.items()}
        executor = create_executor(self._algorithm, self.params,
                                   rv_scaling=rv_scaling, remat=remat)
        return self._grad_loop.run(
            executor=executor, params=self.params, data=data,
            optimizer=optimizer, learning_rate=learning_rate,
            max_iter=max_iter, key=key, verbose=verbose, callback=callback,
            data_sharding=data_sharding, resume_state=resume_state)


class GradTransferInference(GradBasedInference, TransferInference):
    """Gradient-based inference warm-started (and frozen) from a previous
    run's parameters (reference :106-140)."""

    def __init__(self, inference_algorithm, infr_params, grad_loop=None,
                 train_params=None, constants=None, dtype=None):
        if grad_loop is None:
            grad_loop = BatchInferenceLoop()
        TransferInference.__init__(
            self, inference_algorithm=inference_algorithm,
            infr_params=infr_params, constants=constants, dtype=dtype,
            fix_carryover=True)
        self._grad_loop = grad_loop
        self._train_params = train_params

    def run(self, optimizer="adam", learning_rate=1e-3, max_iter=2000,
            verbose=False, key=None, callback=None, **kwargs):
        data = [np.asarray(d) for d in self._fetch_observed(kwargs)]
        self.initialize(key=key, **kwargs)
        if self._train_params:
            # explicitly re-enable training for selected carried-over
            # variables (reference grad_based_inference.py:106-140)
            for v in self._train_params:
                self.params.fixed.discard(
                    v.uuid if hasattr(v, "uuid") else v)
        executor = create_executor(self._algorithm, self.params)
        return self._grad_loop.run(
            executor=executor, params=self.params, data=data,
            optimizer=optimizer, learning_rate=learning_rate,
            max_iter=max_iter, key=key, verbose=verbose, callback=callback)
