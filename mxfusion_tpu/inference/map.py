"""MAP estimation.

Reference: /root/reference/mxfusion/inference/map.py:23-84. An automatic
posterior places a :class:`PointMass` over every latent variable; the
objective substitutes the point-mass locations into the env and
minimizes ``-log p``.
"""
from .variational import VariationalInference
from ..models.posterior import Posterior
from ..components.variables.variable import Variable, VariableType
from ..components.variables.var_trans import (PositiveTransformation,
                                              Logistic,
                                              SimplexTransformation)
from ..components.distributions.pointmass import PointMass
from ..util.inference import variables_to_UUID


class MAP(VariationalInference):
    def __init__(self, model, observed, num_samples=1):
        posterior = MAP.create_posterior(model, observed)
        super().__init__(num_samples=num_samples, model=model,
                         posterior=posterior, observed=observed)

    @staticmethod
    def create_posterior(model, observed):
        """PointMass posterior per latent (reference map.py:42-57)."""
        observed_uuid = set(variables_to_UUID(observed))
        q = Posterior(model)
        for v in model.variables.values():
            if v.type == VariableType.RANDVAR and \
                    v.uuid not in observed_uuid:
                # constrain the point-mass location to the latent's
                # declared support so the optimizer can never leave it
                # (a free location over a Gamma latent NaNs the prior)
                sup = getattr(v.factor, "support", "real")
                if sup == "positive":
                    trans = PositiveTransformation()
                elif sup == "unit_interval":
                    trans = Logistic(0.0, 1.0)
                elif sup == "simplex":
                    # softmax surjection onto the simplex (last axis):
                    # the optimizer can never leave the support
                    trans = SimplexTransformation()
                else:
                    trans = None
                location = Variable(shape=v.shape, transformation=trans)
                q[v].set_prior(PointMass(location=location))
        return q

    def compute(self, env, ctx):
        """Substitute locations, return -log p (reference map.py:61-83)."""
        for v in self.posterior.variables.values():
            if v.type == VariableType.RANDVAR:
                location = v.factor.location
                env[v.uuid] = env[location.uuid]
        loss = -self.model.log_pdf(env, ctx=ctx)
        return loss, loss
