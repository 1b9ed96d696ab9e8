"""PILCO model-based RL on a mock 1-D environment.

Mirrors /root/reference/testing/inference/pilco_test.py:1-183: learn GP
dynamics from random rollouts, then optimize a linear policy by
differentiating the expected trajectory cost through the GP predictions.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, PILCOAlgorithm, GradTransferInference)


def _mock_dynamics(s, a):
    # simple stable linear system: s' = 0.8 s + 0.5 a
    return 0.8 * s + 0.5 * a


def test_pilco_policy_improves():
    rng = np.random.default_rng(0)
    # collect transitions under random actions
    n = 60
    S = rng.standard_normal((n, 1))
    A = rng.uniform(-1, 1, (n, 1))
    S_next = _mock_dynamics(S, A) + rng.standard_normal((n, 1)) * 0.01
    X = np.concatenate([S, A], axis=-1)

    # GP dynamics model
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 2))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.01)
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=2, variance=1., lengthscale=1.),
        noise_var=m.noise_var, shape=(m.N, 1))
    dyn_infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    dyn_infr.run(max_iter=150, learning_rate=0.05, X=X, Y=S_next)

    # linear policy a = w * s with trainable w, shared via the env
    policy_w = Variable(shape=(1, 1), initial_value=np.asarray([[0.0]]))
    m.policy_w = policy_w

    def policy(s, env):
        w = env[policy_w.uuid][0]
        return jnp.einsum("...i,ij->...j", s, w)

    def cost(s, a, env):
        return jnp.sum(jnp.square(s))

    def initial_states(num_samples):
        return jnp.ones((num_samples, 1))

    alg = PILCOAlgorithm(
        model=m, observed=[], cost_function=cost, policy=policy,
        n_time_steps=8, initial_state_generator=initial_states,
        num_samples=4)
    pilco_infr = GradTransferInference(
        inference_algorithm=alg, infr_params=dyn_infr.params)
    losses = []
    pilco_infr.run(max_iter=60, learning_rate=0.1,
                   callback=lambda i, l: losses.append(float(l)))
    # cost decreases and the learned gain is negative (damping)
    assert losses[-1] < losses[0]
    w = float(np.asarray(pilco_infr.params[policy_w]).ravel()[0])
    assert w < 0.0
