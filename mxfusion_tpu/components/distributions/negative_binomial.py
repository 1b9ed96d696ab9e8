"""Negative-binomial distribution (overdispersed counts).

Beyond the reference's distribution set. Mean/dispersion
parameterization (the GLM convention): ``mean`` mu > 0 and
``dispersion`` alpha > 0 with

    Var[y] = mu + alpha mu^2

(alpha -> 0 recovers Poisson). Equivalently a Gamma-Poisson mixture:
``rate ~ Gamma(shape=1/alpha, scale=alpha*mu)``, ``y ~ Poisson(rate)``
— which is also how sampling is implemented (two vectorized draws, no
rejection loops).

    log p(y) = log Γ(y + r) − log Γ(r) − log Γ(y+1)
             + r log(r/(r+mu)) + y log(mu/(r+mu)),   r = 1/alpha
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .distribution import UnivariateDistribution


def nb_log_pmf(y, log_mu, alpha):
    """Elementwise log NB(y | exp(log_mu), alpha). Callers that derive
    mu = exp(f) pass f directly as log_mu: the y-weighted term stays
    exact without a log(exp(f)) round trip, and log(r + mu) is computed
    as logaddexp(log r, log_mu) so an exp(f) float32 overflow for
    f > ~88 (Gauss-Hermite tail nodes) cannot turn a finite term into
    -inf/NaN (r4 advisor finding). The single home of the NB algebra
    (the SVGP count module reuses it).
    r = 1/alpha; log p = lgamma(y+r) - lgamma(r) - lgamma(y+1)
    + r log r - (y+r) log(r+mu) + y log_mu."""
    r = 1.0 / alpha
    log_r = jnp.log(r)
    return (gammaln(y + r) - gammaln(r) - gammaln(y + 1.0)
            + r * log_r - (y + r) * jnp.logaddexp(log_r, log_mu)
            + y * log_mu)


class NegativeBinomial(UnivariateDistribution):
    """Counts with ``E[y] = mean``, ``Var[y] = mean + dispersion *
    mean**2``."""

    def __init__(self, mean, dispersion, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("mean", mean), ("dispersion", dispersion)],
            outputs=None, input_names=["mean", "dispersion"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    # NOTE on ``support``: deliberately the 'real' default (same as
    # Poisson) — the domain is discrete counts, which gradient-based
    # samplers/meanfield cannot target anyway; the support machinery
    # exists for continuous constrained latents.

    def log_pdf_impl(self, random_variable, mean, dispersion):
        return nb_log_pmf(random_variable, jnp.log(mean), dispersion)

    def draw_samples_impl(self, rv_shape, num_samples, key, mean,
                          dispersion):
        import jax
        shape = (num_samples,) + rv_shape
        kg, kp = jax.random.split(key)
        r = 1.0 / dispersion
        # Gamma-Poisson mixture: rate ~ Gamma(r, scale = mean/r)
        g = self._rand_gen.sample_gamma(
            kg, alpha=jnp.broadcast_to(r, shape), beta=1.0, shape=shape,
            dtype=self.dtype)
        rate = g * mean / r
        return self._rand_gen.sample_poisson(
            kp, rate=rate, shape=shape, dtype=self.dtype)

    @classmethod
    def define_variable(cls, mean=1., dispersion=1., shape=None,
                        rand_gen=None, dtype=None):
        dist = cls(mean=mean, dispersion=dispersion, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
