"""Precision policy tests: pinned-HIGHEST GP contractions and the
opt-in data-side precision flag (ops/precision.py)."""


def test_data_precision_flag_roundtrip_and_equivalence():
    """set_data_precision controls data-side contractions; on CPU every
    precision mode is full f32, so the flag must not change results —
    this pins the plumbing (flag read at trace time, restored safely)."""
    import numpy as np
    import jax
    from mxfusion_tpu.ops import precision

    # "default" (1-pass bf16 data tier behind HIGH-floored guards) has
    # been the library default since r5 (measured 1.98x over HIGHEST on
    # the v5e with convergence equivalent on the 10^6-point probe,
    # benchmarks/precision_convergence.py).
    assert precision.DEFAULT_DATA_PRECISION == jax.lax.Precision.DEFAULT
    assert precision.get_data_precision() == precision.DEFAULT_DATA_PRECISION
    a = np.random.default_rng(0).standard_normal((8, 16))
    b = np.random.default_rng(1).standard_normal((16, 4))
    base = np.asarray(precision.data_einsum("nk,kd->nd", a, b))
    try:
        precision.set_data_precision("high")
        assert precision.get_data_precision() == jax.lax.Precision.HIGH
        out = np.asarray(precision.data_einsum("nk,kd->nd", a, b))
        np.testing.assert_allclose(out, base, rtol=1e-6)
        precision.set_data_precision(jax.lax.Precision.HIGHEST)
        assert precision.get_data_precision() == jax.lax.Precision.HIGHEST
    finally:
        precision.set_data_precision(precision.DEFAULT_DATA_PRECISION)
    assert precision.get_data_precision() == precision.DEFAULT_DATA_PRECISION


def test_guarded_ops_floor_at_high_and_match_plain_matmul():
    """guarded_data_einsum / guarded_forward_matmul floor the forward
    precision at HIGH when the flag is DEFAULT (trace-time _guard), and
    guarded_forward_matmul's custom VJP must produce exactly the plain
    chain-rule cotangents (values are precision-identical on CPU)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mxfusion_tpu.ops import precision

    assert precision._guard(jax.lax.Precision.DEFAULT) == \
        jax.lax.Precision.HIGH
    assert precision._guard(jax.lax.Precision.HIGH) == \
        jax.lax.Precision.HIGH
    assert precision._guard(jax.lax.Precision.HIGHEST) == \
        jax.lax.Precision.HIGHEST

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((3, 5, 7)))
    B = jnp.asarray(rng.standard_normal((3, 7, 4)))
    try:
        precision.set_data_precision("default")
        out = precision.guarded_forward_matmul(A, B)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(A @ B), rtol=1e-12)
        ge = precision.guarded_data_einsum("...ij,...jk->...ik", A, B)
        np.testing.assert_allclose(np.asarray(ge),
                                   np.asarray(A @ B), rtol=1e-12)

        def f(a, b):
            return jnp.sum(jnp.sin(precision.guarded_forward_matmul(a, b)))

        def f_ref(a, b):
            return jnp.sum(jnp.sin(a @ b))

        gA, gB = jax.grad(f, argnums=(0, 1))(A, B)
        rA, rB = jax.grad(f_ref, argnums=(0, 1))(A, B)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(rA),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(gB), np.asarray(rB),
                                   rtol=1e-10)

        # cotangent dtype stays pinned to the primal dtype even when
        # the loss upstream is f64 (the x64 CPU test config)
        A32 = A.astype(jnp.float32)
        B32 = B.astype(jnp.float32)

        def f64_loss(a, b):
            return jnp.sum(
                precision.guarded_forward_matmul(a, b).astype(jnp.float64))

        g32A, g32B = jax.grad(f64_loss, argnums=(0, 1))(A32, B32)
        assert g32A.dtype == jnp.float32 and g32B.dtype == jnp.float32
    finally:
        precision.set_data_precision(precision.DEFAULT_DATA_PRECISION)


def test_data_precision_svgp_elbo_unchanged_on_cpu():
    """With the flag flipped, the SVGP ELBO on CPU must be bit-equal to
    the HIGHEST run (CPU has no bf16 passes) — catches any accidental
    math change riding along with the precision plumbing."""
    import numpy as np
    import jax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import MAP, GradBasedInference, \
        create_executor
    from mxfusion_tpu.ops import precision

    def elbo():
        rng = np.random.default_rng(0)
        X = rng.random((40, 2)) * 4
        Y = np.sin(X[:, :1]) + rng.standard_normal((40, 1)) * 0.1
        m = Model()
        m.n = Variable()
        m.X = Variable(shape=(m.n, 2))
        m.noise_var = Variable(transformation=PositiveTransformation(),
                               initial_value=0.1)
        m.Y = SVGPRegression.define_variable(
            X=m.X, kernel=RBF(input_dim=2, variance=1.0, lengthscale=1.0),
            noise_var=m.noise_var, shape=(m.n, 1),
            inducing_inputs=Variable(shape=(8, 2),
                                     initial_value=rng.random((8, 2)) * 4))
        alg = MAP(model=m, observed=[m.X, m.Y])
        infr = GradBasedInference(inference_algorithm=alg)
        infr.initialize(X=X, Y=Y)
        ex = create_executor(alg, infr.params)
        loss, _, _ = ex(infr.params.trainable_params(),
                        infr.params.fixed_params(),
                        [X, Y], jax.random.PRNGKey(0))
        return float(loss)

    hi = elbo()
    try:
        precision.set_data_precision("default")
        lo = elbo()
    finally:
        precision.set_data_precision(precision.DEFAULT_DATA_PRECISION)
    assert hi == lo, (hi, lo)


def test_data_precision_scope_pins_and_restores():
    import jax
    from mxfusion_tpu.ops import precision
    precision.set_data_precision("default")
    try:
        with precision.data_precision_scope("highest"):
            assert precision.get_data_precision() == \
                jax.lax.Precision.HIGHEST
        assert precision.get_data_precision() == \
            jax.lax.Precision.DEFAULT
    finally:
        precision.set_data_precision(precision.DEFAULT_DATA_PRECISION)


def test_relaxed_precision_cholesky_paths_stay_pinned():
    """Titsias training + full-covariance sampling prediction still work
    with the global flag relaxed (their Cholesky-feeding chains pin
    HIGHEST through data_precision_scope) and restore the flag."""
    import numpy as np
    import jax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SparseGPRegression
    from mxfusion_tpu.inference import (MAP, GradBasedInference,
                                        TransferInference)
    from mxfusion_tpu.inference.prediction import \
        ModulePredictionAlgorithm
    from mxfusion_tpu.ops import precision

    rng = np.random.default_rng(0)
    X = rng.random((30, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((30, 1)) * 0.1
    try:
        precision.set_data_precision("default")
        m = Model()
        m.N = Variable()
        m.X = Variable(shape=(m.N, 1))
        m.noise_var = Variable(
            transformation=PositiveTransformation(), initial_value=0.1)
        m.Y = SparseGPRegression.define_variable(
            X=m.X, kernel=RBF(input_dim=1, variance=1.0,
                              lengthscale=1.0),
            noise_var=m.noise_var, shape=(m.N, 1),
            inducing_inputs=Variable(
                shape=(8, 1),
                initial_value=np.linspace(0, 4, 8)[:, None]))
        infr = GradBasedInference(
            inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
        infr.run(max_iter=30, learning_rate=0.05, X=X, Y=Y)
        p = TransferInference(ModulePredictionAlgorithm(
            model=m, observed=[m.X], target_variables=[m.Y.uuid]),
            infr_params=infr.params)
        mu, var = p.run(X=X[:10])[0]
        assert np.all(np.isfinite(np.asarray(mu)))
        assert precision.get_data_precision() == \
            jax.lax.Precision.DEFAULT  # scopes restored the flag
    finally:
        precision.set_data_precision(precision.DEFAULT_DATA_PRECISION)
