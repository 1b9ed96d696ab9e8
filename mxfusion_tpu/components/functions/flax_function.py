"""Wrap flax.linen modules as model factors.

TPU-native equivalent of the reference's ``MXFusionGluonFunction``
(/root/reference/mxfusion/components/functions/mxfusion_gluon_function.py:25-212):
every parameter of the wrapped network is lifted into an ``isInherited``
Variable so priors can be placed over NN weights (BNNs); at eval time
the parameter values flow in from the runtime env and gradients flow
back through them. Where the reference mutates Gluon parameters in
place (``_override_block_parameters``, :166-194), here the parameter
pytree is rebuilt functionally from the env — no mutation, fully
jit/vmap-compatible.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .function import Function
from ..variables.variable import Variable
from ...common.config import as_jnp_dtype


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "_".join(parts)


class FlaxFunction(Function):
    """A flax.linen Module lifted into the model IR.

    Parameters
    ----------
    module : flax.linen.Module
    name : str
        Prefix for auto-generated input/output/parameter names.
    input_shapes : list of tuple
        Example shapes (without sample axis) used to initialize the
        module and discover its parameters.
    rng_key : jax.random key, optional
    num_outputs : int
    broadcastable : bool
        If True the module is applied once with the sample axis riding
        along the batch dim; forced off when any parameter is a random
        variable (per-sample weights need vmap), mirroring the
        reference's rule (mxfusion_gluon_function.py:129-135).
    """

    def __init__(self, module, name, input_shapes, rng_key=None,
                 num_outputs=1, broadcastable=False, dtype=None):
        self.module = module
        dtype = as_jnp_dtype(dtype)
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        examples = [jnp.zeros(s, dtype=dtype) for s in input_shapes]
        variables = dict(module.init(rng_key, *examples))
        params_tree = variables.pop("params", {})
        # non-"params" collections (batch_stats, constants, ...) ride
        # along READ-ONLY: they are baked into the function at their
        # initialized values, not lifted into graph Variables. Modules
        # that MUTATE a collection in apply (e.g. BatchNorm in training
        # mode) are rejected up front with a clear error — thread such
        # state explicitly outside the model function instead. The
        # reference's Gluon wrapper has no analogue (Gluon blocks carry
        # no auxiliary collections; mxfusion_gluon_function.py:150-194).
        self._extra_collections = variables
        if self._extra_collections:
            # validate (abstractly, no FLOPs) that apply works with the
            # collections held immutable; module.init already proved the
            # module applies cleanly, so a failure here is a mutation
            try:
                jax.eval_shape(module.apply,
                               {"params": params_tree,
                                **self._extra_collections}, *examples)
            except Exception as e:
                from ...common.exceptions import ModelSpecificationError
                raise ModelSpecificationError(
                    "FlaxFunction('{}') cannot wrap this module: "
                    "applying it with immutable collections {} failed "
                    "({}). Modules that mutate a variable collection "
                    "during apply (e.g. BatchNorm with "
                    "use_running_average=False) are not supported "
                    "inside the model graph — configure the module for "
                    "inference mode or manage that state outside the "
                    "model.".format(name, sorted(self._extra_collections),
                                    e)) from e
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(params_tree)[0]
        self._treedef = jax.tree_util.tree_structure(params_tree)
        parameters = {}
        self._param_order = []
        for path, leaf in leaves_with_paths:
            pname = name + "_" + _path_str(path)
            v = Variable(shape=tuple(leaf.shape),
                         initial_value=np.asarray(leaf))
            v.isInherited = True
            parameters[pname] = v
            self._param_order.append(pname)
        input_names = [name + "_input_" + str(i)
                       for i in range(len(input_shapes))]
        output_names = [name + "_output_" + str(i)
                        for i in range(num_outputs)]
        super().__init__(
            func=None, input_names=input_names, output_names=output_names,
            parameters=parameters, broadcastable=broadcastable, name=name)

    def eval(self, params, **data):
        leaves = [params[n] for n in self._param_order]
        tree = jax.tree_util.tree_unflatten(self._treedef, leaves)
        args = [data[n] for n in self.input_names]
        out = self.module.apply({"params": tree,
                                 **self._extra_collections}, *args)
        n_out = len(out) if isinstance(out, (list, tuple)) else 1
        if n_out != len(self.output_names):
            from ...common.exceptions import ModelSpecificationError
            raise ModelSpecificationError(
                "FlaxFunction('{}') returned {} output(s) but was "
                "declared with num_outputs={} — outputs would be "
                "silently dropped/missing.".format(
                    self.name, n_out, len(self.output_names)))
        return out

