"""InferenceParameters: the UUID-keyed parameter store.

Reference: /root/reference/mxfusion/inference/inference_parameters.py:26-252
(a Gluon ParameterDict + constants dict). Here it is a flat pytree:
``{uuid: jnp array}`` of *unconstrained* parameter values (bijectors are
applied inside the jitted objective), a constants dict (python ints for
symbolic shape dims — kept static under jit — plus numpy/jnp arrays),
and a ``fixed`` set marking non-trainable entries (module caches,
carried-over parameters).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..common.config import as_jnp_dtype
from ..common.exceptions import InferenceError
from ..components.variables.variable import Variable
from ..util.inference import realize_shape


class InferenceParameters:
    def __init__(self, constants=None, dtype=None):
        self._params = {}
        self._constants = dict(constants) if constants else {}
        self._fixed = set()
        self.dtype = dtype
        # live loop state (optimizer moments / PRNG key / step),
        # published by gradient loops at callback time so checkpoints
        # can capture the full deterministic-resume state
        self.train_state = None

    # ------------------------------------------------------------------
    @property
    def param_dict(self):
        """{uuid: unconstrained jnp array} — the optax-trainable pytree."""
        return self._params

    @property
    def constants(self):
        return self._constants

    @property
    def fixed(self):
        return self._fixed

    def trainable_params(self):
        return {k: v for k, v in self._params.items()
                if k not in self._fixed}

    def fixed_params(self):
        return {k: v for k, v in self._params.items() if k in self._fixed}

    def update_params(self, new_values):
        self._params.update(new_values)

    def fix_all(self):
        """Disable gradients for every parameter (reference :139-141)."""
        self._fixed.update(self._params.keys())

    # ------------------------------------------------------------------
    def initialize_params(self, graphs, observed_uuids, key=None):
        """Walk graphs, realize shapes, and allocate parameter arrays.

        Reference: inference_parameters.py:63-90. Constants get their
        values; parameters get their (inverse-transformed) initial value
        or a uniform(-0.07, 0.07) init matching the reference's engine
        default initializer.
        """
        dtype = as_jnp_dtype(self.dtype)
        if key is None:
            key = jax.random.PRNGKey(0)
        excluded = set(observed_uuids)
        for g in graphs:
            excluded.update(g.var_ties.keys())
        for g in graphs:
            for v in g.get_constants():
                if v.uuid not in self._constants:
                    self._constants[v.uuid] = v.constant
            for m in g.modules.values():
                key, subkey = jax.random.split(key)
                m.initialize_hidden_parameters(self, excluded, subkey)
            for v in g.get_parameters(excluded=excluded):
                # symbolic shape dims bound from data live in constants
                if v.uuid in self._params or v.uuid in self._constants:
                    continue
                key, subkey = jax.random.split(key)
                self._params[v.uuid] = self._init_value(v, subkey, dtype)

    def allocate(self, v, key, zero_init=False):
        """Allocate storage for one Variable if not already present."""
        dtype = as_jnp_dtype(self.dtype)
        if v.uuid in self._params:
            return
        if zero_init:
            shape = realize_shape(v.shape, self._constants)
            self._params[v.uuid] = jnp.zeros(shape, dtype=dtype)
        else:
            self._params[v.uuid] = self._init_value(v, key, dtype)

    def _init_value(self, v, key, dtype):
        shape = realize_shape(v.shape, self._constants)
        init = v.initial_value_before_transformation
        if init is not None:
            arr = jnp.broadcast_to(jnp.asarray(init, dtype=dtype), shape)
            return jnp.asarray(arr, dtype=dtype)
        return jax.random.uniform(key, shape, dtype=dtype, minval=-0.07,
                                  maxval=0.07)

    # ------------------------------------------------------------------
    def initialize_with_carryover_params(self, graphs, observed_uuids,
                                         carryover_params, key=None,
                                         fix_carryover=True):
        """Initialize, then overwrite with values carried from a previous
        inference run (reference :92-137). ``carryover_params`` is a
        {uuid: unconstrained array} dict; matching is by UUID (model and
        posterior share variable identity via replication)."""
        self.initialize_params(graphs, observed_uuids, key=key)
        all_uuids = set()
        for g in graphs:
            all_uuids.update(g.components.keys())
            for m in g.modules.values():
                for ig in m.internal_graphs:
                    all_uuids.update(ig.components.keys())
        for uuid, value in carryover_params.items():
            if uuid in all_uuids:
                self._params[uuid] = jnp.asarray(value)
                if fix_carryover:
                    self._fixed.add(uuid)

    # ------------------------------------------------------------------
    # transformed access by Variable (reference :155-172)
    # ------------------------------------------------------------------
    def __getitem__(self, variable):
        if not isinstance(variable, Variable):
            raise KeyError("Index InferenceParameters with a Variable.")
        if variable.uuid in self._params:
            raw = self._params[variable.uuid]
            if variable.transformation is not None:
                return variable.transformation.transform(raw)
            return raw
        if variable.uuid in self._constants:
            return self._constants[variable.uuid]
        raise KeyError(variable)

    def __setitem__(self, variable, value):
        if not isinstance(variable, Variable):
            raise KeyError("Index InferenceParameters with a Variable.")
        if variable.transformation is not None:
            value = variable.transformation.inverse_transform(value)
        self._params[variable.uuid] = jnp.asarray(value)

    def __contains__(self, variable):
        uuid = variable.uuid if isinstance(variable, Variable) else variable
        return uuid in self._params or uuid in self._constants

    # ------------------------------------------------------------------
    # serialization (reference :232-252)
    # ------------------------------------------------------------------
    def get_serializable(self):
        params = {k: np.asarray(v) for k, v in self._params.items()}
        array_constants = {k: np.asarray(v)
                           for k, v in self._constants.items()
                           if hasattr(v, "shape") or isinstance(v, np.ndarray)}
        prim_constants = {k: v for k, v in self._constants.items()
                          if not (hasattr(v, "shape")
                                  or isinstance(v, np.ndarray))}
        return params, array_constants, prim_constants

    @staticmethod
    def load_parameters(uuid_map, params, array_constants, prim_constants,
                        current_params=None, dtype=None):
        """Remap loaded UUIDs through the reconciliation map.

        Reference: inference_parameters.py:178-230.
        """
        ip = current_params if current_params is not None \
            else InferenceParameters(dtype=dtype)
        for prev_uuid, arr in params.items():
            cur = uuid_map.get(prev_uuid)
            if cur is None:
                raise InferenceError(
                    "Loaded parameter {} has no reconciled match.".format(
                        prev_uuid))
            ip._params[cur] = jnp.asarray(arr)
        for prev_uuid, arr in array_constants.items():
            cur = uuid_map.get(prev_uuid, prev_uuid)
            ip._constants[cur] = np.asarray(arr)
        for prev_uuid, v in prim_constants.items():
            cur = uuid_map.get(prev_uuid, prev_uuid)
            ip._constants[cur] = v
        return ip
