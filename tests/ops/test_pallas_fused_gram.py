"""Fused RBF-gram -> L^-1 product kernel tests (interpreter mode, CPU).

The fused data path (ops/pallas_fused_gram.py) replaces the SVGP
bound's materialized-Kuf pipeline inside its measured-win envelope
(N >= 131072 on TPU). These tests pin its forward values and its
hand-written custom-VJP cotangents against the pure-jnp reference on
shapes that exercise multi-tile grid accumulation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxfusion_tpu.ops import pallas_fused_gram as pfg


@pytest.fixture
def interpret():
    pfg.set_interpret(True)
    yield
    pfg.set_interpret(False)


def _case(seed, M=128, N=2048, D=8):
    rng = np.random.default_rng(seed)
    Zs = jnp.asarray(rng.random((M, D)) * 3.0, jnp.float32)
    Xs = jnp.asarray(rng.random((N, D)) * 3.0, jnp.float32)
    # a well-conditioned lower-triangular "L^-1" stand-in
    A = rng.standard_normal((M, M)).astype(np.float32) * 0.05
    Linv = jnp.asarray(np.tril(A) + np.eye(M, dtype=np.float32))
    var = jnp.asarray(1.4, jnp.float32)
    return Linv, Zs, Xs, var


def test_forward_matches_reference(interpret):
    Linv, Zs, Xs, var = _case(0)
    got = pfg.fused_linv_rbf_gram(Linv, Zs, Xs, var)
    want = pfg.reference_linv_rbf_gram(Linv, Zs, Xs, var)
    # 3-pass hi/lo split keeps ~f32 operand fidelity
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_reference(interpret):
    Linv, Zs, Xs, var = _case(1, N=2048)  # 2 grid tiles: accumulation
    probe = jnp.asarray(
        np.random.default_rng(7).standard_normal((128, 2048)),
        jnp.float32) * 0.01

    def loss_fused(L, Z, X, v):
        return jnp.sum(pfg.fused_linv_rbf_gram(L, Z, X, v) * probe)

    def loss_ref(L, Z, X, v):
        return jnp.sum(pfg.reference_linv_rbf_gram(L, Z, X, v) * probe)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(Linv, Zs, Xs, var)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(Linv, Zs, Xs, var)
    for a, b, name in zip(g1, g2, ("dLinv", "dZs", "dXs", "dvar")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
            err_msg=name)
    assert g1[3].shape == var.shape


def test_supported_envelope():
    f32 = jnp.float32
    # CPU backend: never supported (the win is a TPU HBM-traffic one)
    assert not pfg.supported(512, 1 << 18, 32, f32)
    # shape legs of the envelope, backend-independent rejections
    assert not pfg.supported(512, 65536, 32, f32)       # N below gate
    assert not pfg.supported(500, 1 << 18, 32, f32)     # M not lane-mult
    assert not pfg.supported(512, 1 << 18, 32, jnp.float64)
    assert not pfg.supported(512, (1 << 18) + 100, 32, f32)  # N % 256


@pytest.mark.parametrize("whitened", [False, True])
def test_bound_equivalence_through_module(monkeypatch, whitened):
    """Drive the FULL SVGP bound (both parameterizations) through the
    fused branch on CPU with the envelope monkeypatched down to test
    size AND the kernel swapped for its exact-jnp reference: loss and
    gradients must match the materialized-Kuf path tightly. This pins
    the branch PLUMBING (lengthscale/variance extraction,
    G-association of the mean, whitened narrow factors), which the
    kernel-level tests above cannot see; the kernel's own bf16
    arithmetic is pinned separately (tests above).

    Runs in float64 deliberately: the M=128 random-input Kuu here is
    ill-conditioned, and in f32 the conditioning amplifies last-bit
    gram rounding through L⁻¹ into ~10x scalar-parameter gradient
    noise in BOTH legs (measured) — drowning any plumbing signal. In
    f64 that noise floor drops to ~1e-9 while a genuine wiring bug
    (wrong scaling, wrong association, missed whitened factor) still
    shows as O(1). Hardware-tier arithmetic equivalence is covered by
    benchmarks/fused_gram_convergence.py on the TPU itself."""
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import MAP, GradBasedInference, \
        create_executor

    monkeypatch.setattr(
        pfg, "supported",
        lambda M, N, D, dtype: M % 128 == 0 and N % 256 == 0)
    calls = []

    def _recording_reference(*args, **kwargs):
        calls.append(1)
        return pfg.reference_linv_rbf_gram(*args, **kwargs)

    monkeypatch.setattr(pfg, "fused_linv_rbf_gram",
                        _recording_reference)

    rng = np.random.default_rng(5)
    N, M, D = 512, 128, 2
    X = (rng.random((N, D)) * 4).astype(np.float64)
    Y = (np.sin(2 * X[:, :1]) +
         rng.standard_normal((N, 1)) * 0.1).astype(np.float64)

    # build the model ONCE (shared uuids + initial params); the fused
    # gate is a TRACE-TIME flag, so each leg gets its own executor
    # traced under its flag state, evaluated on the same param dict
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=D, variance=1.0, lengthscale=0.8),
        noise_var=m.noise_var, shape=(m.n, 1), whitened=whitened,
        inducing_inputs=Variable(
            shape=(M, D),
            initial_value=np.random.default_rng(1).random((M, D)) * 4))
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    infr.initialize(X=X, Y=Y)
    trainable = dict(infr.params.trainable_params())
    fixed = dict(infr.params.fixed_params())

    def loss_and_grads(fused):
        pfg.set_enabled(fused)
        try:
            executor = create_executor(alg, infr.params)

            def f(tr):
                loss, loss_for_grad, _ = executor(
                    tr, fixed, [X, Y], jax.random.PRNGKey(0))
                return loss_for_grad

            loss = f(trainable)
            grads = jax.grad(f)(trainable)
            return float(loss), grads
        finally:
            pfg.set_enabled(True)

    loss_ref, g_ref = loss_and_grads(False)
    assert not calls, "fused op ran with the gate disabled"
    loss_fused, g_fused = loss_and_grads(True)
    # guard against vacuity: if any use_fused gate condition silently
    # fails, both legs trace the identical XLA path and the equality
    # below tests nothing
    assert calls, "fused branch never engaged"
    assert abs(loss_fused - loss_ref) / abs(loss_ref) < 1e-9
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_ref[k]),
            rtol=1e-6, atol=1e-8, err_msg=k)


def test_kill_switch_roundtrip():
    assert pfg.enabled()
    pfg.set_enabled(False)
    try:
        assert not pfg.enabled()
    finally:
        pfg.set_enabled(True)
    assert pfg.enabled()
