"""Concrete (Gumbel-Softmax) distribution.

Beyond the reference's distribution set. The reference's only path to
discrete latents is the score-function estimator over ``Categorical``
(inference/score_function.py there); the Concrete relaxation (Maddison
et al. 2017 / Jang et al. 2017) gives the REPARAMETERIZED alternative:
samples live on the interior of the simplex, gradients flow through
``softmax((log p + Gumbel)/tau)``, and the density has the closed form

    p(x) = (K-1)! tau^{K-1} (Π_k p_k x_k^{-tau-1})
           / (Σ_k p_k x_k^{-tau})^K

so SVI over relaxed one-hot codes works exactly like any other
reparameterized latent.
"""
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, logsumexp

from .distribution import Distribution


class Concrete(Distribution):
    """Concrete / Gumbel-Softmax on the (K-1)-simplex.

    ``probs`` (normalized internally) and static float ``temperature``;
    the event shape's LAST axis is the K classes.
    """

    # density w.r.t. the (K-1)-simplex (Maddison et al. 2017, eq. 6) —
    # samplers reparameterize via the same stick-breaking bijector as
    # Dirichlet
    support = "simplex"

    def __init__(self, probs, temperature=1.0, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("probs", probs)], outputs=None,
            input_names=["probs"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)
        self.temperature = float(temperature)

    def replicate_self(self, attribute_map=None):
        rep = super().replicate_self(attribute_map)
        rep.temperature = self.temperature
        return rep

    def log_pdf_impl(self, random_variable, probs):
        x = random_variable
        K = x.shape[-1]
        tau = self.temperature
        logp = jnp.log(probs / jnp.sum(probs, axis=-1, keepdims=True))
        logx = jnp.log(x)
        return (gammaln(jnp.asarray(float(K)))
                + (K - 1) * jnp.log(tau)
                + jnp.sum(logp - (tau + 1.0) * logx, axis=-1)
                - K * logsumexp(logp - tau * logx, axis=-1))

    def draw_samples_impl(self, rv_shape, num_samples, key, probs):
        logp = jnp.log(probs / jnp.sum(probs, axis=-1, keepdims=True))
        u = self._rand_gen.sample_uniform(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        gumbel = -jnp.log(-jnp.log(jnp.clip(u, 1e-20, 1.0 - 1e-7)))
        return jax.nn.softmax((logp + gumbel) / self.temperature,
                              axis=-1)

    def _generate_outputs(self, shape=None):
        from ..variables.variable import Variable
        if shape is None:
            raise ValueError("Concrete needs an explicit shape "
                             "(..., num_classes).")
        self.set_outputs([Variable(shape=shape)])

    @classmethod
    def define_variable(cls, probs, shape, temperature=1.0,
                        rand_gen=None, dtype=None):
        dist = cls(probs=probs, temperature=temperature,
                   rand_gen=rand_gen, dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
