"""Random generation facade.

The reference routes all sampling through a static ``RandomGenerator``
facade so tests can inject a deterministic double
(/root/reference/mxfusion/components/distributions/random_gen.py:21-219,
/root/reference/mxfusion/util/testutils.py:58-93). The TPU-native
equivalent threads explicit ``jax.random`` keys: every method takes the
key as its first argument. :class:`FixedRandomGenerator` is the test
double — it returns pre-seeded values reshaped on demand, ignoring the
key, so stochastic code paths can be unit-tested exactly.
"""
import jax
import jax.numpy as jnp

from ...common.config import as_jnp_dtype


class RandomGenerator:
    """Key-threaded sampling facade over ``jax.random``."""

    def sample_normal(self, key, loc=0.0, scale=1.0, shape=None, dtype=None):
        dtype = as_jnp_dtype(dtype)
        eps = jax.random.normal(key, shape, dtype=dtype)
        return loc + scale * eps

    def sample_gamma(self, key, alpha=1.0, beta=1.0, shape=None, dtype=None):
        """Gamma(shape=alpha, rate=beta) samples."""
        dtype = as_jnp_dtype(dtype)
        g = jax.random.gamma(key, jnp.asarray(alpha, dtype=dtype), shape=shape,
                             dtype=dtype)
        return g / beta

    def sample_multinomial(self, key, data, shape=None, get_prob=False,
                           dtype="int32"):
        """Categorical indices from (log-)probabilities on the last axis.

        ``data`` holds probabilities (normalized); sampling uses Gumbel
        argmax over ``log(data)`` which maps onto TPU-friendly reductions.
        """
        logits = jnp.log(data)
        idx = jax.random.categorical(key, logits, axis=-1)
        return idx.astype(dtype)

    def sample_bernoulli(self, key, prob_true=0.5, shape=None, dtype=None):
        return jax.random.bernoulli(key, prob_true, shape=shape)

    def sample_uniform(self, key, low=0.0, high=1.0, shape=None, dtype=None):
        dtype = as_jnp_dtype(dtype)
        u = jax.random.uniform(key, shape, dtype=dtype)
        return low + u * (high - low)

    def sample_laplace(self, key, location=0.0, scale=1.0, shape=None,
                       dtype=None):
        # inverse-CDF from uniform(-0.5, 0.5), as the reference does
        # (random_gen.py:186-219) — but vectorized with no host branching.
        dtype = as_jnp_dtype(dtype)
        u = jax.random.uniform(key, shape, dtype=dtype, minval=-0.5,
                               maxval=0.5)
        return location - scale * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))

    def sample_exponential(self, key, rate=1.0, shape=None, dtype=None):
        dtype = as_jnp_dtype(dtype)
        e = jax.random.exponential(key, shape, dtype=dtype)
        return e / rate

    def sample_poisson(self, key, rate=1.0, shape=None, dtype=None):
        dtype = as_jnp_dtype(dtype)
        lam = jnp.broadcast_to(jnp.asarray(rate), shape)
        return jax.random.poisson(key, lam, shape=shape).astype(dtype)

    def sample_studentt(self, key, degrees_of_freedom, location=0.0,
                        scale=1.0, shape=None, dtype=None):
        dtype = as_jnp_dtype(dtype)
        t = jax.random.t(key, jnp.asarray(degrees_of_freedom, dtype=dtype),
                         shape=shape, dtype=dtype)
        return location + scale * t


class FixedRandomGenerator(RandomGenerator):
    """Deterministic test double returning pre-seeded samples.

    Successive calls consume the sample buffer in order; each call
    reshapes the next ``prod(shape)`` values to the requested shape.
    """

    def __init__(self, samples):
        self._samples = jnp.ravel(jnp.asarray(samples))
        self._cursor = 0

    def reset(self):
        self._cursor = 0

    def _next(self, shape, dtype=None):
        n = 1
        for s in shape:
            n *= int(s)
        out = self._samples[self._cursor:self._cursor + n].reshape(shape)
        self._cursor += n
        if self._cursor >= self._samples.shape[0]:
            self._cursor = 0
        return out.astype(as_jnp_dtype(dtype)) if dtype is not None else out

    def sample_normal(self, key, loc=0.0, scale=1.0, shape=None, dtype=None):
        return loc + scale * self._next(shape, dtype)

    def sample_gamma(self, key, alpha=1.0, beta=1.0, shape=None, dtype=None):
        return self._next(shape, dtype) / beta

    def sample_multinomial(self, key, data, shape=None, get_prob=False,
                           dtype="int32"):
        return self._next(data.shape[:-1]).astype(dtype)

    def sample_bernoulli(self, key, prob_true=0.5, shape=None, dtype=None):
        return self._next(shape)

    def sample_uniform(self, key, low=0.0, high=1.0, shape=None, dtype=None):
        return low + self._next(shape, dtype) * (high - low)

    def sample_laplace(self, key, location=0.0, scale=1.0, shape=None,
                       dtype=None):
        return location + scale * self._next(shape, dtype)

    def sample_exponential(self, key, rate=1.0, shape=None, dtype=None):
        return self._next(shape, dtype) / rate

    def sample_poisson(self, key, rate=1.0, shape=None, dtype=None):
        return self._next(shape, dtype)

    def sample_studentt(self, key, degrees_of_freedom, location=0.0,
                        scale=1.0, shape=None, dtype=None):
        return location + scale * self._next(shape, dtype)


_DEFAULT_RAND_GEN = RandomGenerator()


def default_rand_gen():
    return _DEFAULT_RAND_GEN
