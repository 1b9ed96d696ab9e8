"""Inference algorithms and the pure-functional executor.

The reference adapts algorithms into a Gluon ``HybridBlock``
(``ObjectiveBlock``, /root/reference/mxfusion/inference/
inference_alg.py:25-90) whose ``hybrid_forward`` applies variable ties,
sample dims, and transformations, then calls ``algorithm.compute`` and
writes back ``SET_``-prefixed parameter updates under
``autograd.pause()``.

TPU-native redesign: the executor is a *pure function*

    executor(trainable, fixed, data_list, key)
        -> (loss, loss_for_gradient, aux)

built once and ``jax.jit``-compiled by the training loop. The SET_
side-channel becomes the explicit ``aux`` dict (stop-gradient values
returned from the jitted step and merged into the parameter store by
the host loop) — same semantics, no mutation inside the trace.
"""
from abc import ABC, abstractmethod

import numpy as np
import jax
import jax.numpy as jnp

from ..common.exceptions import InferenceError
from ..components.variables.variable import VariableType
from ..util.inference import variables_to_UUID


def _scaling_env_key(uuid):
    """Env key carrying a RANDVAR's array rv_scaling (mask/weights)."""
    return uuid + ":rv_scale"


def _check_array_scaling(v, arr):
    """Validate an array rv_scaling against the variable's declaration.

    Broadcasting is right-aligned, so a rank-mismatched mask (e.g.
    (N,) against an (N, 1) event) would silently blow the density up to
    (s, N, N) and sum it — require the mask's rank to equal the event
    rank and every statically declared dim to match (or be 1)."""
    from ..modules.module import Module
    if isinstance(v.factor, Module):
        raise InferenceError(
            "array rv_scaling is not supported for module-generated "
            "variable '{}': module bounds scale their already-summed "
            "data term, so only scalars compose correctly."
            .format(v.name or v.uuid))
    shape = np.shape(arr)
    declared = tuple(v.shape)
    if len(shape) != len(declared):
        raise InferenceError(
            "rv_scaling array for '{}' has rank {} but the variable's "
            "event shape {} has rank {}; masks must match the event "
            "rank exactly (add the trailing singleton dims)."
            .format(v.name or v.uuid, len(shape), declared,
                    len(declared)))
    for d_arr, d_var in zip(shape, declared):
        if isinstance(d_var, int) and d_arr not in (1, d_var):
            raise InferenceError(
                "rv_scaling array for '{}' has shape {} which does not "
                "broadcast against the declared event shape {}."
                .format(v.name or v.uuid, shape, declared))


class VariableEnv(dict):
    """UUID-keyed runtime env that also accepts Variable keys."""

    @staticmethod
    def _k(key):
        return key.uuid if hasattr(key, "uuid") else key

    def __getitem__(self, key):
        return dict.__getitem__(self, self._k(key))

    def __setitem__(self, key, value):
        dict.__setitem__(self, self._k(key), value)

    def __contains__(self, key):
        return dict.__contains__(self, self._k(key))

    def get(self, key, default=None):
        return dict.get(self, self._k(key), default)


class RuntimeContext:
    """Per-execution state threaded through ``compute``: the PRNG key
    stream and the aux (SET_ parameter) writeback dict."""

    def __init__(self, key):
        self.key = key
        self.aux = {}

    def next_key(self):
        if self.key is None:
            raise InferenceError(
                "This computation draws random samples but no PRNG key "
                "was provided: pass ctx=RuntimeContext(key) (or a key "
                "to the calling API) instead of relying on a default.")
        self.key, sub = jax.random.split(self.key)
        return sub


class InferenceAlgorithm(ABC):
    """Base class (reference inference_alg.py:111-251)."""

    def __init__(self, model, observed, extra_graphs=None):
        self._model = model
        self._extra_graphs = extra_graphs if extra_graphs is not None else []
        self._observed = observed
        self._observed_uuid = variables_to_UUID(observed)
        self._observed_names = [v.name for v in observed]

    @property
    def model(self):
        return self._model

    @property
    def graphs(self):
        return [self._model] + self._extra_graphs

    @property
    def observed_variables(self):
        return self._observed

    @property
    def observed_variable_UUIDs(self):
        return self._observed_uuid

    @property
    def observed_variable_names(self):
        return self._observed_names

    def replicate_self(self, model, extra_graphs=None):
        replica = type(self).__new__(type(self))
        replica.__dict__.update(self.__dict__)
        replica._model = model
        replica._extra_graphs = extra_graphs if extra_graphs is not None \
            else []
        return replica

    # ------------------------------------------------------------------
    def prepare_executor(self, rv_scaling=None):
        """Collect bijectors and set minibatch log_pdf scalings.

        Reference: inference_alg.py:165-190. Returns {uuid: transformation}
        for every parameter with a bijector; sets ``log_pdf_scaling`` on
        the generating factors of scaled RANDVARs. Array-valued scalings
        (observation masks) are validated here and routed through the
        env (``log_pdf_scaling_key``) so they arrive as jit ARGS rather
        than baked literals — see :func:`_make_env_builder`.
        """
        rv_scaling = rv_scaling if rv_scaling is not None else {}
        excluded = set(self._observed_uuid)
        var_trans = {}
        for g in self.graphs:
            for v in g.variables.values():
                if v.type == VariableType.PARAMETER and \
                        v.transformation is not None and \
                        v.uuid not in excluded:
                    var_trans[v.uuid] = v.transformation
                if v.type == VariableType.RANDVAR:
                    if v.uuid in rv_scaling:
                        s = rv_scaling[v.uuid]
                        if np.ndim(s) > 0:
                            _check_array_scaling(v, s)
                            v.factor.log_pdf_scaling = 1.0
                            v.factor.log_pdf_scaling_key = \
                                _scaling_env_key(v.uuid)
                        else:
                            v.factor.log_pdf_scaling = s
                            v.factor.log_pdf_scaling_key = None
                    else:
                        v.factor.log_pdf_scaling = 1.0
                        v.factor.log_pdf_scaling_key = None
        return var_trans

    def set_parameter(self, ctx, variable, value):
        """Record a training-time state update (e.g. cached Cholesky) to be
        written back into the parameter store after the step (the
        reference's SET_ prefix side-channel, inference_alg.py:236-251)."""
        ctx.aux[variable.uuid] = jax.lax.stop_gradient(value)

    @abstractmethod
    def compute(self, env, ctx):
        """Return ``(loss, loss_for_gradient)`` given a runtime env."""


class SamplingAlgorithm(InferenceAlgorithm):
    """Base for algorithms returning samples instead of a loss.

    Reference: inference_alg.py:254-293. ``compute`` returns a dict
    {uuid: samples} or a tuple in target order.
    """

    #: Per-output-leaf data-axis declaration for chunked serving
    #: (``inference.serving``): a tuple with one tuple of data-axis
    #: indices per flattened output leaf of ONE target — e.g.
    #: ``((1,), (1,))`` for (s, N, D) moments, ``((1,), (1, 2))`` when
    #: the variance is a full (s, N, N) covariance. ``None`` = unknown;
    #: the server then infers axes per leaf (and raises on ambiguity).
    serving_data_axes = None

    def __init__(self, model, observed, num_samples=None,
                 target_variables=None, extra_graphs=None):
        # num_samples=None means "caller never chose a count": it reads
        # as 1 through the normalized property but stays observable via
        # ``num_samples_requested`` for default-promoting algorithms
        super().__init__(model=model, observed=observed,
                         extra_graphs=extra_graphs)
        self.num_samples = num_samples
        self.target_variables = variables_to_UUID(target_variables) \
            if target_variables is not None else None

    @property
    def num_samples(self):
        """Sample count, normalized: an UNSET request (None) reads as 1."""
        return 1 if self._num_samples is None else self._num_samples

    @num_samples.setter
    def num_samples(self, value):
        self._num_samples = value

    @property
    def num_samples_requested(self):
        """The raw requested count — ``None`` when the caller never set
        one. Lets algorithms with their own default (e.g. the deep GP's
        mixture prediction) distinguish "unset" from an EXPLICIT 1,
        which must be honored, not promoted."""
        return self._num_samples


def _make_env_builder(algorithm, params, rv_scaling=None):
    """Shared env-construction closure for all executors.

    Applies, in order: constants (python scalars stay static), fixed and
    trainable parameters (bijector-transformed, sample dim added),
    observed data (sample dim added), variable ties.
    """
    var_trans = algorithm.prepare_executor(rv_scaling=rv_scaling)
    # array rv_scalings (observation masks) ride the fixed-params path:
    # they become executor ARGUMENTS, not closure constants baked into
    # the jitted program (the relay compile endpoint rejects >100 MB
    # literals — CLAUDE.md), and reach the factor via its
    # log_pdf_scaling_key env lookup
    if rv_scaling:
        for uuid, s in rv_scaling.items():
            if np.ndim(s) > 0:
                key = _scaling_env_key(uuid)
                params.param_dict[key] = jnp.asarray(s)
                params.fixed.add(key)
    # merge module-internal transformations (reference inference_alg.py:192-219)
    for g in algorithm.graphs:
        for m in g.modules.values():
            var_trans.update(m.collect_internal_transformations())
    constants = dict(params.constants)
    observed_uuid = list(algorithm.observed_variable_UUIDs)
    var_ties = {}
    for g in algorithm.graphs:
        var_ties.update(g.var_ties)

    def build_env(trainable, fixed, data_list):
        env = VariableEnv()
        for uuid, v in constants.items():
            if hasattr(v, "shape") or isinstance(v, float):
                arr = jnp.asarray(v)
                if arr.ndim == 0:
                    # scalar constants get an event dim so the sample
                    # axis stays unambiguous: (1, 1), not (1,)
                    arr = arr.reshape(1)
                env[uuid] = jnp.expand_dims(arr, axis=0)
            else:
                # python ints are shape constants: stay static under jit
                env[uuid] = v
        for source in (fixed, trainable):
            for uuid, v in source.items():
                t = var_trans.get(uuid)
                tv = t.transform(v) if t is not None else v
                env[uuid] = jnp.expand_dims(tv, axis=0)
        for uuid, arr in zip(observed_uuid, data_list):
            env[uuid] = jnp.expand_dims(jnp.asarray(arr), axis=0)
        for tied, to in var_ties.items():
            env[tied] = env[to]
        return env

    return build_env


def create_executor(algorithm, params, rv_scaling=None, remat=False):
    """Build the pure objective function for an inference algorithm.

    Returns ``executor(trainable, fixed, data_list, key) -> (loss,
    loss_for_gradient, aux)`` where ``trainable``/``fixed`` are
    {uuid: unconstrained array} dicts and ``data_list`` is the observed
    data in ``algorithm.observed_variable_UUIDs`` order.

    ``remat=True`` wraps the objective in ``jax.checkpoint``:
    activations are rematerialized in the backward pass, trading FLOPs
    for HBM — the standard TPU lever for objectives whose intermediates
    (kernel matrices, per-sample activations) exceed memory.
    """
    build_env = _make_env_builder(algorithm, params, rv_scaling=rv_scaling)

    def objective(trainable, fixed, data_list, key):
        env = build_env(trainable, fixed, data_list)
        ctx = RuntimeContext(key)
        result = algorithm.compute(env, ctx)
        if isinstance(result, tuple) and len(result) == 2:
            loss, loss_for_grad = result
        else:
            loss = loss_for_grad = result
        return loss, loss_for_grad, ctx.aux

    wrapped = jax.checkpoint(objective) if remat else objective

    def executor(trainable, fixed, data_list, key):
        return wrapped(trainable, fixed, data_list, key)

    executor.build_env = build_env
    return executor


def create_sampling_executor(algorithm, params, rv_scaling=None):
    """Executor variant for SamplingAlgorithms: returns compute's output.

    ``rv_scaling`` rescales the generating factors' log-pdfs exactly as
    in :func:`create_executor` — used by minibatch samplers (SGLD) whose
    stochastic gradients need the N/B likelihood correction."""
    build_env = _make_env_builder(algorithm, params, rv_scaling=rv_scaling)

    def executor(trainable, fixed, data_list, key):
        env = build_env(trainable, fixed, data_list)
        ctx = RuntimeContext(key)
        return algorithm.compute(env, ctx)

    executor.build_env = build_env
    return executor
