"""PILCO: model-based policy evaluation by rolling GP dynamics forward.

Reference: /root/reference/mxfusion/inference/pilco_alg.py:21-92. The
rollout is a Python loop over ``n_time_steps`` at trace time, so the
whole trajectory unrolls into one XLA program; the GP module's
prediction algorithm runs per step on cached posterior state.
"""
import inspect

import jax.numpy as jnp

from .inference_alg import SamplingAlgorithm
from ..common.config import get_default_dtype


def _call_flex(fn, *args, env=None):
    """Call ``fn(*args)`` or ``fn(*args, env)`` depending on its arity, so
    policies/costs may optionally read trainable variables from the env."""
    try:
        n = len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        n = len(args)
    if env is not None and n > len(args):
        return fn(*args, env)
    return fn(*args)


class PILCOAlgorithm(SamplingAlgorithm):
    def __init__(self, model, observed, cost_function, policy, n_time_steps,
                 initial_state_generator, extra_graphs=None, num_samples=3,
                 dtype=None):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples, extra_graphs=extra_graphs)
        self.cost_function = cost_function
        self.policy = policy
        self.initial_state_generator = initial_state_generator
        self.n_time_steps = n_time_steps
        self.dtype = dtype if dtype is not None else get_default_dtype()

    def compute(self, env, ctx):
        """Roll the dynamics model forward under the policy, accumulating
        cost over the horizon (reference pilco_alg.py:47-92)."""
        s_0 = self.initial_state_generator(self.num_samples)
        a_0 = _call_flex(self.policy, s_0, env=env)
        a_t_plus_1 = a_0
        x_t = jnp.expand_dims(jnp.concatenate([s_0, a_0], axis=-1), axis=1)
        cost = 0.0
        for _ in range(self.n_time_steps):
            env[self.model.X.uuid] = x_t
            res = self.model.Y.factor.predict(
                env, ctx.next_key(), targets=[self.model.Y.uuid],
                num_samples=self.num_samples)[0]
            s_t_plus_1 = res[0]
            cost = cost + _call_flex(self.cost_function, s_t_plus_1,
                                     a_t_plus_1, env=env)
            a_t_plus_1 = _call_flex(self.policy, s_t_plus_1, env=env)
            x_t = jnp.concatenate(
                [s_t_plus_1, jnp.expand_dims(a_t_plus_1, axis=-1)
                 if a_t_plus_1.ndim < s_t_plus_1.ndim else a_t_plus_1],
                axis=-1)
        total_cost = jnp.sum(cost)
        return total_cost, total_cost
