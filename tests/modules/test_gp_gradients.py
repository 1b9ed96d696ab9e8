"""Gradient-level oracle tests for the three GP module bounds.

The reference validates GP-module gradients end-to-end against GPy fits
(/root/reference/testing/modules/gpregression_test.py:82-109). GPy
cannot run here, so the oracle is central finite differences in float64
on the UNCONSTRAINED optimizer parameters (so the transformation chain
— softplus on lengthscale/variance/noise — is checked too). Every
trainable leaf is perturbed elementwise: kernel hyperparameters, noise,
inducing inputs Z, and the q(U) variational parameters (mean, cov
factor, cov diag), in both the standard and whitened SVGP
parameterizations.

A second tier checks that float32 gradients under
``set_data_precision("high")`` (the recommended fast mode on TPU) stay
close to the float64 gradients — the precision-scope branches change
which einsums relax, so this pins that the relaxation never lands on a
gradient-critical term.
"""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import (GPRegression, SparseGPRegression,
                                  SVGPRegression)
from mxfusion_tpu.inference import MAP, GradBasedInference, create_executor
from mxfusion_tpu.ops import precision

import pytest


def _data(n=12, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.random((n, d)) * 4
    Y = np.sin(X[:, :1]) + rng.standard_normal((n, 1)) * 0.1
    return X, Y


def _build(cls, D, dtype="float64", **kw):
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.07)
    kernel = RBF(input_dim=D, ARD=True, variance=1.3,
                 lengthscale=np.array([0.9, 1.4]), dtype=dtype)
    m.Y = cls.define_variable(X=m.X, kernel=kernel,
                              noise_var=m.noise_var, shape=(m.N, 1),
                              dtype=dtype, **kw)
    return m


def _executor_and_params(cls, X, Y, dtype="float64", **kw):
    rng = np.random.default_rng(42)
    M = 4
    kwargs = dict(kw)
    if cls is not GPRegression:
        Z0 = rng.random((M, X.shape[1])) * 4
        kwargs["inducing_inputs"] = Variable(shape=Z0.shape,
                                             initial_value=Z0)
        kwargs.setdefault("jitter", 0.0)
    m = _build(cls, X.shape[1], dtype=dtype, **kwargs)
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype=dtype)
    infr.initialize(X=X, Y=Y)
    # semantic uuid -> name map (pairs leaves across separate builds,
    # whose dict orders/UUIDs differ)
    kernel = m.Y.factor.kernel
    names = {m.noise_var.uuid: "noise",
             kernel.lengthscale.uuid: "lengthscale",
             kernel.variance.uuid: "kern_variance"}
    if cls is not GPRegression:
        names[kwargs["inducing_inputs"].uuid] = "Z"
    if cls is SVGPRegression:
        post = m.Y.factor._extra_graphs[0]
        names[post.qU_mean.uuid] = "qU_mean"
        names[post.qU_cov_W.uuid] = "qU_cov_W"
        names[post.qU_cov_diag.uuid] = "qU_cov_diag"
    # move q(U) / trainables off their symmetric initial point so the
    # finite-difference test doesn't sit on a gradient zero
    tr = dict(infr.params.trainable_params())
    tr = {k: np.asarray(v, dtype=np.float64)
          + 0.05 * np.cos(np.arange(np.asarray(v).size, dtype=np.float64)
                          ).reshape(np.shape(v))
          for k, v in tr.items()}
    ex = create_executor(alg, infr.params)
    fixed = dict(infr.params.fixed_params())
    return ex, tr, fixed, names


def _fd_grad(f, tr, eps=1e-6):
    grads = {}
    for k, v in tr.items():
        v = np.asarray(v, dtype=np.float64)
        g = np.zeros_like(v)
        flat = v.reshape(-1)
        for i in range(flat.size):
            vp = flat.copy(); vp[i] += eps
            vm = flat.copy(); vm[i] -= eps
            g.reshape(-1)[i] = (
                f({**tr, k: vp.reshape(v.shape)}) -
                f({**tr, k: vm.reshape(v.shape)})) / (2 * eps)
        grads[k] = g
    return grads


CASES = [
    ("gpr", GPRegression, {}),
    ("sparsegp", SparseGPRegression, {}),
    ("svgp", SVGPRegression, {}),
    ("svgp_whitened", SVGPRegression, {"whitened": True}),
]


@pytest.mark.parametrize("name,cls,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_bound_gradients_vs_finite_differences(name, cls, kw):
    X, Y = _data()
    ex, tr, fixed, names = _executor_and_params(cls, X, Y, **kw)
    assert set(names) == set(tr), "trainable set changed; update names"
    key = jax.random.PRNGKey(0)

    def loss(t):
        _, loss_for_grad, _ = ex(t, fixed, [X, Y], key)
        return loss_for_grad

    ad = jax.grad(loss)(tr)
    fd = _fd_grad(lambda t: float(loss(t)), tr)
    for k in tr:
        a, b = np.asarray(ad[k]), fd[k]
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-6,
            err_msg="{}: d(bound)/d({}) disagrees with finite "
                    "differences".format(name, names[k]))


@pytest.mark.parametrize("whitened", [False, True],
                         ids=["standard", "whitened"])
@pytest.mark.slow
def test_svgp_f32_high_data_precision_gradients(whitened):
    """f32 + set_data_precision('high') gradients track the f64 ones."""
    X, Y = _data()
    kw = {"whitened": whitened} if whitened else {}
    ex64, tr64, fx64, names64 = _executor_and_params(SVGPRegression,
                                                     X, Y, **kw)
    key = jax.random.PRNGKey(0)
    g64 = jax.grad(lambda t: ex64(t, fx64, [X, Y], key)[1])(tr64)

    precision.set_data_precision("high")
    try:
        ex32, tr32, fx32, names32 = _executor_and_params(
            SVGPRegression, X.astype(np.float32), Y.astype(np.float32),
            dtype="float32", **kw)
        # place the f32 build at the SAME point as the f64 one (random
        # q(U) inits differ between dtypes); pair leaves semantically —
        # UUIDs (and dict orders) are fresh per build
        by_name64 = {n: u for u, n in names64.items()}
        by_name32 = {n: u for u, n in names32.items()}
        tr32 = {by_name32[n]: np.asarray(tr64[by_name64[n]],
                                         dtype=np.float32)
                for n in by_name32}
        X32, Y32 = X.astype(np.float32), Y.astype(np.float32)
        g32 = jax.grad(lambda t: ex32(t, fx32, [X32, Y32], key)[1])(tr32)
    finally:
        precision.set_data_precision(precision.DEFAULT_DATA_PRECISION)

    for n in by_name64:
        a = np.asarray(g64[by_name64[n]], np.float64)
        b = np.asarray(g32[by_name32[n]], np.float64)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, rtol=2e-2, atol=2e-2 * scale,
            err_msg="f32/high-precision gradient diverges from f64 "
                    "for {}".format(n))
