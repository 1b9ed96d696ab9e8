"""Monte-Carlo expectation algorithms.

Reference: /root/reference/mxfusion/inference/expectation.py:25-111.
"""
import jax
import jax.numpy as jnp

from .inference_alg import SamplingAlgorithm
from ..components.variables.runtime_variable import expectation
from ..components.variables.variable import VariableType


class ExpectationAlgorithm(SamplingAlgorithm):
    """Expectation of model variables under forward sampling."""

    def compute(self, env, ctx):
        samples = self.model.draw_samples(
            env, ctx.next_key(), num_samples=self.num_samples)
        samples = {k: expectation(v) for k, v in samples.items()}
        if self.target_variables:
            return tuple(samples[v] for v in self.target_variables)
        return samples


class ExpectationScoreFunctionAlgorithm(SamplingAlgorithm):
    """Score-function gradient of an arbitrary loss variable in the model.

    The target variable is a deterministic function of sampled latents;
    its expectation is differentiated via the likelihood-ratio trick.
    Shares the reference's known caveat (expectation.py:99-103): any
    reparameterized sampling path contributes its pathwise gradient as
    well, double-counting those latents.
    """

    def compute(self, env, ctx):
        samples = self.model.draw_samples(
            env, ctx.next_key(), num_samples=self.num_samples)
        env.update(samples)
        targets = [v for v in self.model.get_latent_variables(
            self.observed_variable_UUIDs)
            if v.type == VariableType.RANDVAR]
        q_z = self.model.log_pdf_per_sample(env, targets=targets)
        p_xz = env[self.target_variables[0]]
        p_xz = jnp.sum(p_xz, axis=tuple(range(1, p_xz.ndim)))
        gradient_lambda = jnp.mean(
            q_z * jax.lax.stop_gradient(p_xz), axis=0)
        gradient_theta = jnp.mean(p_xz, axis=0)
        gradient_log_L = gradient_lambda + gradient_theta
        return gradient_theta, gradient_log_L
