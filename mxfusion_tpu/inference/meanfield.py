"""Gaussian mean-field posterior builder.

Reference: /root/reference/mxfusion/inference/meanfield.py:24-44.
"""
from ..models.posterior import Posterior
from ..components.variables.variable import Variable, VariableType
from ..components.variables.var_trans import PositiveTransformation
from ..components.distributions.normal import Normal
from ..util.inference import variables_to_UUID


def create_Gaussian_meanfield(model, observed, dtype=None):
    """Attach an independent Normal posterior factor (with positively
    constrained variance) to every unobserved random variable."""
    observed_uuid = set(variables_to_UUID(observed))
    q = Posterior(model)
    for v in model.variables.values():
        if v.type == VariableType.RANDVAR and v.uuid not in observed_uuid:
            mean = Variable(shape=v.shape)
            variance = Variable(shape=v.shape,
                                transformation=PositiveTransformation(),
                                initial_value=1.0)
            q[v].set_prior(Normal(mean=mean, variance=variance, dtype=dtype))
    return q
