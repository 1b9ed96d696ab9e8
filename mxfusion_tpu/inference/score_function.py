"""Score-function (BBVI) gradient estimators.

Reference: /root/reference/mxfusion/inference/score_function.py:24-194
(Ranganath et al., Black Box Variational Inference). The loss returned
for reporting is the plain negative ELBO estimate; the loss returned for
*differentiation* is a surrogate whose gradient equals the score-function
estimator:

    ∇λ ELBO ≈ E_s[ log q_s · stop_grad(log p_s − log q_s) ]
    ∇θ ELBO ≈ E_s[ log p_s − stop_grad(log q_s) ]

Unlike the reference (which multiplies already-averaged scalars,
score_function.py:73-78), the products here are taken per Monte-Carlo
sample before averaging — the textbook estimator — using
``FactorGraph.log_pdf_per_sample``. Sampling goes through
``stop_gradient`` so no pathwise term leaks in.
"""
import jax
import jax.numpy as jnp

from .variational import StochasticVariationalInference
from ..components.variables.variable import VariableType
from ..common.exceptions import InferenceError


class ScoreFunctionInference(StochasticVariationalInference):
    """BBVI without control variates; works for non-meanfield posteriors."""

    def compute(self, env, ctx):
        samples = self.posterior.draw_samples(
            env, ctx.next_key(), num_samples=self.num_samples)
        samples = {k: jax.lax.stop_gradient(v) for k, v in samples.items()}
        env.update(samples)

        q_z = self.posterior.log_pdf_per_sample(env)   # (s,)
        p_xz = self.model.log_pdf_per_sample(env)      # (s,)

        diff_nograd = jax.lax.stop_gradient(p_xz - q_z)
        gradient_lambda = jnp.mean(q_z * diff_nograd, axis=0)
        gradient_theta = jnp.mean(p_xz - jax.lax.stop_gradient(q_z), axis=0)
        gradient_log_L = gradient_lambda + gradient_theta

        return -gradient_theta, -gradient_log_L


class ScoreFunctionRBInference(ScoreFunctionInference):
    """Rao-Blackwellized BBVI: per-latent score terms use only the
    Markov blankets of that latent's descendants, shrinking estimator
    variance (reference score_function.py:84-194; requires a meanfield
    posterior)."""

    def compute(self, env, ctx):
        samples = self.posterior.draw_samples(
            env, ctx.next_key(), num_samples=self.num_samples)
        samples = {k: jax.lax.stop_gradient(v) for k, v in samples.items()}
        env.update(samples)

        q_z = self.posterior.log_pdf_per_sample(env)
        p_xz = self.model.log_pdf_per_sample(env)
        gradient_theta = jnp.mean(p_xz - jax.lax.stop_gradient(q_z), axis=0)

        posterior_rvs = [v for v in self.posterior.variables.values()
                         if v.type is VariableType.RANDVAR]
        gradient_lambda = 0.0
        for v in posterior_rvs:
            model_v = self.model[v.uuid]
            q_i_varset = self._descendant_blanket(self.posterior, v)
            q_i = self.posterior.log_pdf_per_sample(
                env, targets=q_i_varset)
            p_i_varset = self._descendant_blanket(self.model, model_v)
            p_i = self.model.log_pdf_per_sample(env, targets=p_i_varset)
            f_i = q_i * jax.lax.stop_gradient(p_i - q_i)
            gradient_lambda = gradient_lambda + jnp.mean(f_i, axis=0)

        gradient_log_L = gradient_lambda + gradient_theta
        return -gradient_theta, -gradient_log_L

    @staticmethod
    def _descendant_blanket(graph, node):
        """UUIDs of the Markov blankets of all descendants of ``node``."""
        if node.graph is not graph.components_graph:
            raise InferenceError(
                "Node {} does not belong to graph {}.".format(node, graph))
        descendants = graph.get_descendants(node)
        out = set()
        for d in descendants:
            out.update(m.uuid for m in graph.get_markov_blanket(d))
            out.add(d.uuid)
        return out
