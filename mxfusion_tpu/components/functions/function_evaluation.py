"""Deterministic function-application factors.

Reference: /root/reference/mxfusion/components/functions/function_evaluation.py:23-169.
The TPU-native difference is in ``eval``: where the reference loops over
the sample axis in Python for non-broadcastable functions
(function_evaluation.py:80-96) — the worst host-side inefficiency in its
hot path — we ``jax.vmap`` over the sample axis, which XLA compiles to a
single batched kernel.
"""
import jax

from ..factor import Factor
from ..variables.runtime_variable import arrays_as_samples


class FunctionEvaluation(Factor):
    """Factor recording one application of a deterministic function."""

    def __init__(self, inputs, outputs, input_names, output_names,
                 broadcastable=False):
        super().__init__(inputs=inputs, outputs=outputs,
                         input_names=input_names, output_names=output_names)
        self.broadcastable = broadcastable

    def eval(self, env):
        """Evaluate into ``{output_name: array-with-sample-axis}``.

        Broadcastable functions are evaluated once on arrays that still
        carry the sample axis; non-broadcastable functions are vmapped
        over a materialized common sample count.
        """
        inputs = self.fetch_runtime_inputs(env)
        names = list(inputs.keys())
        arrays = arrays_as_samples([inputs[n] for n in names])
        if self.broadcastable:
            results = self.eval_impl(**dict(zip(names, arrays)))
        else:
            def per_sample(*args):
                return self.eval_impl(**dict(zip(names, args)))
            results = jax.vmap(per_sample)(*arrays)
        if not isinstance(results, (list, tuple)):
            results = (results,)
        return dict(zip(self.output_names, results))

    def eval_impl(self, **input_kws):
        raise NotImplementedError

    def replicate_self(self, attribute_map=None):
        replica = super().replicate_self(attribute_map)
        replica.broadcastable = self.broadcastable
        return replica


class FunctionEvaluationWithParameters(FunctionEvaluation):
    """Function application whose wrapped function carries parameter Variables.

    The function object's parameter Variables are merged into the factor's
    inputs so that priors over function parameters (e.g. BNN weights)
    connect into the graph (reference function_evaluation.py:117-169).
    """

    def __init__(self, func, input_variables, output_variables,
                 broadcastable=False):
        data_names = [n for n, _ in input_variables]
        param_pairs = [(n, v) for n, v in func.parameters.items()]
        inputs = list(input_variables) + param_pairs
        input_names = data_names + [n for n, _ in param_pairs]
        output_names = [n for n, _ in output_variables]
        self._func = func
        self._data_input_names = data_names
        super().__init__(
            inputs=inputs, outputs=output_variables,
            input_names=input_names, output_names=output_names,
            broadcastable=broadcastable and not func.has_random_parameters)

    @property
    def function(self):
        return self._func

    def eval_impl(self, **input_kws):
        data = {n: input_kws[n] for n in self._data_input_names}
        params = {n: v for n, v in input_kws.items()
                  if n not in self._data_input_names}
        return self._func.eval(params=params, **data)

    def replicate_self(self, attribute_map=None):
        replica = super().replicate_self(attribute_map)
        replica._func = self._func.replicate_self(attribute_map)
        replica._data_input_names = list(self._data_input_names)
        return replica
