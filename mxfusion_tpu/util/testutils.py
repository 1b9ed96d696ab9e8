"""Test utilities shipped with the package.

Reference: /root/reference/mxfusion/util/testutils.py:25-232. The mock
RNG role is played by :class:`FixedRandomGenerator`
(components.distributions.random_gen); here live array helpers, model
factories and distribution-sample checks used across the test suite.
"""
import numpy as np
import jax.numpy as jnp


def numpy_array_reshape(var, has_samples, n_dim):
    """Prepend axes up to ``n_dim``; axis 0 is the sample axis."""
    var = np.asarray(var)
    if not has_samples:
        var = np.expand_dims(var, axis=0)
    while var.ndim < n_dim:
        var = np.expand_dims(var, axis=1)
    return var


def prepare_runtime_array(array, has_samples, dtype=None):
    """Convert a numpy array to a runtime jnp array with a sample axis."""
    a = jnp.asarray(array, dtype=dtype)
    if not has_samples:
        a = jnp.expand_dims(a, axis=0)
    return a


def make_spd_matrix(dim, rng=None):
    """Random symmetric positive-definite matrix."""
    rng = rng if rng is not None else np.random.default_rng(0)
    A = rng.standard_normal((dim, dim))
    return A @ A.T + dim * np.eye(dim)


def make_basic_model(finalize=True):
    """Toy Gaussian model with unknown mean/variance over N=100 points."""
    from ..models.model import Model
    from ..components.variables.variable import Variable
    from ..components.variables.var_trans import PositiveTransformation
    from ..components.distributions.normal import Normal
    from ..components.functions.operators import broadcast_to
    m = Model()
    N = 100
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.Y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(m.s, (N, 1)),
                                 shape=(N, 1))
    return m


def make_net(input_shape=(100, 2), hidden=8, out=1, seed=0):
    """A small flax MLP wrapped as a FlaxFunction (the reference's
    ``make_net`` Gluon factory, testutils.py:96-108)."""
    import jax
    import flax.linen as nn
    from ..components.functions.flax_function import FlaxFunction

    class _MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(hidden)(x)
            x = jnp.tanh(x)
            return nn.Dense(out)(x)

    return FlaxFunction(_MLP(), name="f", input_shapes=[input_shape],
                        rng_key=jax.random.PRNGKey(seed))


def check_sampling_bivariate(samples, mean, cov, atol=0.1):
    """Moment check for 2-D sampling (the reference's plot_bivariate
    histogram comparison, testutils.py:189-218, made quantitative)."""
    s = np.asarray(samples).reshape(-1, 2)
    return (np.allclose(s.mean(0), mean, atol=atol) and
            np.allclose(np.cov(s.T), cov, atol=3 * atol))


def make_bnn_model(net, data_x_shape, finalize=True):
    """Bayesian NN model: priors over all lifted network weights."""
    from ..models.model import Model
    from ..components.variables.variable import Variable
    from ..components.variables.var_trans import PositiveTransformation
    from ..components.distributions.normal import Normal
    from ..components.functions.operators import broadcast_to
    m = Model()
    m.N = Variable()
    m.f = net
    m.x = Variable(shape=(m.N,) + tuple(data_x_shape[1:]))
    m.r = m.f(m.x)
    for name, v in m.r.factor.function.parameters.items():
        v.set_prior(Normal(mean=broadcast_to(Variable(value=0.), v.shape),
                           variance=broadcast_to(Variable(value=1.),
                                                 v.shape)))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.01)
    m.y = Normal.define_variable(mean=m.r,
                                 variance=broadcast_to(m.noise_var,
                                                       (m.N, 1)),
                                 shape=(m.N, 1))
    return m


def check_sampling_univariate(samples, cdf, min_pvalue=0.01):
    """Distributional sampling check: KS test of samples against a CDF.

    The matplotlib histogram-vs-pdf checks the reference ships
    (testutils.py:163-218) become a quantitative Kolmogorov–Smirnov
    test here (no plotting dependency).
    """
    from scipy import stats
    s = np.asarray(samples).ravel()
    _, pvalue = stats.kstest(s, cdf)
    return pvalue > min_pvalue


def sample_moment_check(samples, mean, variance, rtol=0.1, atol=0.1):
    """Check empirical moments of samples against analytic values."""
    s = np.asarray(samples)
    emp_mean = s.mean(axis=0)
    emp_var = s.var(axis=0)
    return (np.allclose(emp_mean, mean, rtol=rtol, atol=atol) and
            np.allclose(emp_var, variance, rtol=3 * rtol, atol=3 * atol))
