"""GP kernel tests vs naive numpy oracles.

Mirrors the reference's kernel tests
(/root/reference/testing/components/distributions/gp/kernel_test.py),
with hand-rolled numpy oracles instead of GPy (not available here).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mxfusion_tpu.components.distributions.gp.kernels import (
    RBF, Matern12, Matern32, Matern52, Linear, Bias, White)


def np_rbf(X, X2, lengthscale, variance):
    Xs = X / lengthscale
    X2s = X2 / lengthscale
    r2 = ((Xs[:, None, :] - X2s[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * r2)


def _run_K(kern, X, X2=None, **param_arrays):
    env = {}
    params = {}
    for name, var in kern.parameters.items():
        local = name[len(kern.name) + 1:]
        params[name] = jnp.asarray(param_arrays[local])[None]
    K = kern.K(jnp.asarray(X)[None],
               X2=jnp.asarray(X2)[None] if X2 is not None else None,
               **params)
    return np.asarray(K)[0]


def _run_Kdiag(kern, X, **param_arrays):
    params = {}
    for name, var in kern.parameters.items():
        local = name[len(kern.name) + 1:]
        params[name] = jnp.asarray(param_arrays[local])[None]
    return np.asarray(kern.Kdiag(jnp.asarray(X)[None], **params))[0]


@pytest.mark.parametrize("ARD", [False, True])
def test_rbf_kernel(ARD):
    rng = np.random.default_rng(0)
    N, M, D = 6, 4, 3
    X = rng.standard_normal((N, D))
    X2 = rng.standard_normal((M, D))
    ls = rng.random(D if ARD else 1) + 0.5
    var = np.asarray([1.7])
    kern = RBF(input_dim=D, ARD=ARD, dtype="float64")
    K = _run_K(kern, X, X2, lengthscale=ls, variance=var)
    expected = np_rbf(X, X2, ls, var[0])
    assert np.allclose(K, expected, rtol=1e-7, atol=1e-10)
    Kdiag = _run_Kdiag(kern, X, lengthscale=ls, variance=var)
    assert np.allclose(Kdiag, np.full(N, var[0]))
    # symmetric square case
    Ksym = _run_K(kern, X, None, lengthscale=ls, variance=var)
    assert np.allclose(Ksym, np_rbf(X, X, ls, var[0]), rtol=1e-7,
                       atol=1e-10)


@pytest.mark.parametrize("cls,nu", [(Matern12, 0.5), (Matern32, 1.5),
                                    (Matern52, 2.5)])
def test_matern_kernels(cls, nu):
    rng = np.random.default_rng(1)
    N, D = 5, 2
    X = rng.standard_normal((N, D))
    ls = np.asarray([0.9])
    var = np.asarray([1.3])
    kern = cls(input_dim=D, dtype="float64")
    K = _run_K(kern, X, None, lengthscale=ls, variance=var)
    r = np.sqrt((((X / ls)[:, None, :] - (X / ls)[None, :, :]) ** 2
                 ).sum(-1))
    if nu == 0.5:
        expected = var * np.exp(-r)
    elif nu == 1.5:
        expected = var * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    else:
        expected = var * (1 + np.sqrt(5) * r + 5.0 / 3.0 * r ** 2) * \
            np.exp(-np.sqrt(5) * r)
    assert np.allclose(K, expected, rtol=1e-6, atol=1e-8)


def test_linear_kernel():
    rng = np.random.default_rng(2)
    N, M, D = 5, 4, 3
    X = rng.standard_normal((N, D))
    X2 = rng.standard_normal((M, D))
    v = rng.random(D) + 0.2
    kern = Linear(input_dim=D, ARD=True, dtype="float64")
    K = _run_K(kern, X, X2, variances=v)
    expected = (X * v) @ X2.T
    assert np.allclose(K, expected, rtol=1e-7, atol=1e-10)
    Kdiag = _run_Kdiag(kern, X, variances=v)
    assert np.allclose(Kdiag, (X * X * v).sum(-1))


def test_bias_and_white_kernels():
    rng = np.random.default_rng(3)
    N, D = 4, 2
    X = rng.standard_normal((N, D))
    bias = Bias(input_dim=D, dtype="float64")
    K = _run_K(bias, X, None, variance=np.asarray([2.5]))
    assert np.allclose(K, np.full((N, N), 2.5))
    white = White(input_dim=D, dtype="float64")
    K = _run_K(white, X, None, variance=np.asarray([0.7]))
    assert np.allclose(K, 0.7 * np.eye(N))
    Kcross = _run_K(white, X, X[:2], variance=np.asarray([0.7]))
    assert np.allclose(Kcross, 0.0)


def test_add_and_multiply_kernels():
    rng = np.random.default_rng(4)
    N, D = 5, 2
    X = rng.standard_normal((N, D))
    k1 = RBF(input_dim=D, dtype="float64")
    k2 = Linear(input_dim=D, dtype="float64")
    combo = k1 + k2
    # parameter namespace nests: add_rbf_lengthscale etc.
    names = set(combo.parameters.keys())
    assert "add_rbf_lengthscale" in names
    assert "add_linear_variances" in names
    params = {"add_rbf_lengthscale": jnp.asarray([[0.8]]),
              "add_rbf_variance": jnp.asarray([[1.2]]),
              "add_linear_variances": jnp.asarray([[0.5]])}
    K = np.asarray(combo.K(jnp.asarray(X)[None], **params))[0]
    expected = np_rbf(X, X, np.asarray([0.8]), 1.2) + 0.5 * (X @ X.T)
    assert np.allclose(K, expected, rtol=1e-7, atol=1e-10)

    prod = RBF(input_dim=D, dtype="float64") * \
        Linear(input_dim=D, dtype="float64")
    params = {"mul_rbf_lengthscale": jnp.asarray([[0.8]]),
              "mul_rbf_variance": jnp.asarray([[1.2]]),
              "mul_linear_variances": jnp.asarray([[0.5]])}
    K = np.asarray(prod.K(jnp.asarray(X)[None], **params))[0]
    expected = np_rbf(X, X, np.asarray([0.8]), 1.2) * (0.5 * (X @ X.T))
    assert np.allclose(K, expected, rtol=1e-7, atol=1e-10)


def test_duplicate_subkernel_renaming():
    D = 2
    combo = RBF(input_dim=D, dtype="float64") + \
        RBF(input_dim=D, dtype="float64")
    names = set(combo.parameters.keys())
    assert "add_rbf_0_lengthscale" in names
    assert "add_rbf_1_lengthscale" in names


def test_active_dims():
    rng = np.random.default_rng(5)
    N, D = 5, 3
    X = rng.standard_normal((N, D))
    kern = RBF(input_dim=1, active_dims=[1], dtype="float64")
    K = _run_K(kern, X, None, lengthscale=np.asarray([1.0]),
               variance=np.asarray([1.0]))
    expected = np_rbf(X[:, 1:2], X[:, 1:2], np.asarray([1.0]), 1.0)
    assert np.allclose(K, expected, rtol=1e-7, atol=1e-10)


def test_kernel_replication_maps_parameters():
    kern = RBF(input_dim=2, ARD=True, dtype="float64")
    amap = {kern.lengthscale: kern.lengthscale.replicate_self(),
            kern.variance: kern.variance.replicate_self()}
    rep = kern.replicate_self(amap)
    assert rep.lengthscale is amap[kern.lengthscale]
    assert rep.lengthscale.uuid == kern.lengthscale.uuid
    assert rep.parameter_names == kern.parameter_names


def test_rational_quadratic_matches_closed_form():
    from mxfusion_tpu.components.distributions.gp.kernels import \
        RationalQuadratic
    rng = np.random.default_rng(20)
    X = rng.random((7, 2)) * 3
    X2 = rng.random((5, 2)) * 3
    ls, var, alpha = 0.7, 1.3, 2.5
    k = RationalQuadratic(input_dim=2, variance=var, lengthscale=ls,
                          alpha=alpha, dtype="float64")
    env = {}
    for name, v in k.parameters.items():
        env[v.uuid] = jnp.asarray(np.asarray(v.initial_value))[None]
    kp = k.fetch_parameters(env)
    K = np.asarray(k.K(jnp.asarray(X)[None], jnp.asarray(X2)[None], **kp))
    R2 = ((X[:, None, :] - X2[None, :, :]) ** 2).sum(-1) / ls ** 2
    expected = var * (1.0 + R2 / (2 * alpha)) ** (-alpha)
    np.testing.assert_allclose(K[0], expected, rtol=1e-10)
    # Kdiag == variance
    kd = np.asarray(k.Kdiag(jnp.asarray(X)[None], **kp))
    np.testing.assert_allclose(kd[0], var, rtol=1e-12)


def test_periodic_matches_closed_form_and_periodicity():
    from mxfusion_tpu.components.distributions.gp.kernels import Periodic
    rng = np.random.default_rng(21)
    X = rng.random((6, 1)) * 4
    X2 = rng.random((4, 1)) * 4
    ls, var, period = 0.9, 0.8, 1.7
    k = Periodic(input_dim=1, variance=var, lengthscale=ls,
                 period=period, dtype="float64")
    env = {v.uuid: jnp.asarray(np.asarray(v.initial_value))[None]
           for v in k.parameters.values()}
    kp = k.fetch_parameters(env)
    K = np.asarray(k.K(jnp.asarray(X)[None], jnp.asarray(X2)[None], **kp))
    d = X[:, None, 0] - X2[None, :, 0]
    expected = var * np.exp(-2.0 * (np.sin(np.pi * d / period) / ls) ** 2)
    np.testing.assert_allclose(K[0], expected, rtol=1e-10)
    # exact periodicity: shifting X2 by one period leaves K unchanged
    K_shift = np.asarray(k.K(jnp.asarray(X)[None],
                             jnp.asarray(X2 + period)[None], **kp))
    np.testing.assert_allclose(K_shift, K, rtol=1e-8, atol=1e-10)


def test_extra_kernels_compose_and_train_in_gp_module():
    """RationalQuadratic + Periodic compose with Add/active_dims and fit
    a periodic signal through the GPRegression module end-to-end."""
    from mxfusion_tpu.components.distributions.gp.kernels import \
        Periodic, RationalQuadratic
    from mxfusion_tpu.modules import GPRegression
    from mxfusion_tpu.inference import MAP, GradBasedInference
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    rng = np.random.default_rng(22)
    X = np.sort(rng.random((40, 1)) * 6, axis=0)
    Y = np.sin(2 * np.pi * X / 1.5) + \
        rng.standard_normal((40, 1)) * 0.05
    kern = Periodic(input_dim=1, variance=1.0, lengthscale=1.0,
                    period=1.2) + \
        RationalQuadratic(input_dim=1, variance=0.2, lengthscale=2.0)
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.05)
    m.Y = GPRegression.define_variable(X=m.X, kernel=kern,
                                       noise_var=m.noise_var,
                                       shape=(m.N, 1))
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
    losses = []
    infr.run(max_iter=60, learning_rate=0.03, X=X, Y=Y,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0]
