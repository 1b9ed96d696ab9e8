"""Mesh / data-parallel tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY §4): the sharded objective equals the
unsharded objective — GSPMD sharding is a layout, not a math change.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield, MAP, create_executor)
from mxfusion_tpu.parallel import (
    make_mesh, shard_data, DataParallelBatchLoop, make_shard_map_step,
    make_cache_refresh_step)

N = 160


def _meanfield_setup():
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(m.s, (N, 1)),
                                 shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=6, model=m,
                                         posterior=q, observed=[m.y])
    return m, q, alg


def test_eight_virtual_devices_available():
    assert jax.device_count() >= 8


def test_sharded_objective_equals_unsharded():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) + 2.0
    m, q, alg = _meanfield_setup()
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(y=y)
    ex = create_executor(alg, infr.params)
    key = jax.random.PRNGKey(7)
    tr = infr.params.trainable_params()
    fx = infr.params.fixed_params()

    loss_plain, _, _ = jax.jit(ex)(tr, fx, [jnp.asarray(y)], key)

    mesh = make_mesh(8)
    data_sharded = shard_data(mesh, [y])
    loss_sharded, _, _ = jax.jit(ex)(tr, fx, data_sharded, key)
    assert np.allclose(float(loss_plain), float(loss_sharded), rtol=1e-5)


def test_data_parallel_batch_loop_converges():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m, q, alg = _meanfield_setup()
    mesh = make_mesh(8)
    infr = GradBasedInference(inference_algorithm=alg,
                              grad_loop=DataParallelBatchLoop(mesh))
    infr.run(max_iter=200, learning_rate=0.1, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.4


def test_svgp_sharded_training_matches_single_device():
    """One GSPMD-sharded SVGP step == one single-device step."""
    rng = np.random.default_rng(2)
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
    Z0 = np.linspace(0, 4, 8)[:, None]

    def build():
        m = Model()
        m.n = Variable()
        m.X = Variable(shape=(m.n, 1))
        m.noise_var = Variable(transformation=PositiveTransformation(),
                               initial_value=0.1)
        kernel = RBF(input_dim=1, variance=1.0, lengthscale=1.0)
        m.Y = SVGPRegression.define_variable(
            X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.n, 1),
            inducing_inputs=Variable(shape=(8, 1), initial_value=Z0))
        return m

    def one_loss(data):
        m = build()
        alg = MAP(model=m, observed=[m.X, m.Y])
        infr = GradBasedInference(inference_algorithm=alg)
        infr.initialize(X=X, Y=Y)
        ex = create_executor(alg, infr.params)
        tr = infr.params.trainable_params()
        fx = infr.params.fixed_params()
        loss, _, _ = jax.jit(ex)(tr, fx, data, jax.random.PRNGKey(0))
        return float(loss)

    # note: fresh UUIDs each build, but identical initial values
    plain = one_loss([jnp.asarray(X), jnp.asarray(Y)])
    mesh = make_mesh(8)
    sharded = one_loss(shard_data(mesh, [X, Y]))
    assert np.allclose(plain, sharded, rtol=1e-5)


def test_shard_map_step_runs_and_descends():
    rng = np.random.default_rng(3)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    # shard_map executes with per-shard (local) shapes: declare the data
    # dim symbolically and bind it to the local shard size
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(m.s, (m.n, 1)),
                                 shape=(m.n, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=6, model=m,
                                         posterior=q, observed=[m.y])
    mesh = make_mesh(8)
    local_n = N // mesh.devices.size
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(y=y[:local_n])
    # rescale the observed likelihood by the shard count so per-shard
    # losses pmean to prior + full likelihood
    ex = create_executor(alg, infr.params,
                         rv_scaling={m.y.uuid: float(mesh.devices.size)})
    step, opt = make_shard_map_step(ex, mesh, "adam", 0.1)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())
    opt_state = opt.init(tr)
    data = shard_data(mesh, [y])
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(60):
        key, sk = jax.random.split(key)
        tr, opt_state, loss, _aux = step(tr, fx, opt_state, sk, data)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def _build_exact_gp(Z_unused=None):
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    from mxfusion_tpu.modules import GPRegression
    kernel = RBF(input_dim=1, variance=1.0, lengthscale=1.0)
    m.Y = GPRegression.define_variable(X=m.X, kernel=kernel,
                                       noise_var=m.noise_var,
                                       shape=(m.N, 1))
    return m


def test_shard_map_exact_gp_trains_with_cache():
    """Exact GP (non-decomposable N x N Cholesky objective) under the
    explicit shard_map path with gather_data=True: shards hold 1/8 of
    the data, all_gather it over the mesh inside the step, and the
    module's SET_ cache (X, L, LinvY) comes back replicated through the
    step's aux output. Must match the single-device trajectory and the
    cache-based prediction to 1e-5."""
    import optax
    from mxfusion_tpu.inference import (ModulePredictionAlgorithm,
                                        TransferInference)
    rng = np.random.default_rng(5)
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
    n_steps, lr = 25, 0.05

    def train(sharded):
        m = _build_exact_gp()
        alg = MAP(model=m, observed=[m.X, m.Y])
        infr = GradBasedInference(inference_algorithm=alg)
        infr.initialize(X=X, Y=Y)
        ex = create_executor(alg, infr.params)
        tr = dict(infr.params.trainable_params())
        fx = dict(infr.params.fixed_params())
        key = jax.random.PRNGKey(0)
        if sharded:
            mesh = make_mesh(8)
            step, opt = make_shard_map_step(ex, mesh, "adam", lr,
                                            gather_data=True)
            opt_state = opt.init(tr)
            data = shard_data(mesh, [X, Y])
            aux = {}
            for _ in range(n_steps):
                key, sk = jax.random.split(key)
                tr, opt_state, loss, aux = step(tr, fx, opt_state, sk,
                                                data)
                if aux:
                    fx = {**fx, **aux}
        else:
            opt = optax.adam(lr)
            opt_state = opt.init(tr)
            data = [jnp.asarray(X), jnp.asarray(Y)]

            @jax.jit
            def step1(tr, fx, opt_state, key):
                def lf(t):
                    loss, lg, aux = ex(t, fx, data, key)
                    return lg, (loss, aux)
                (_, (loss, aux)), g = jax.value_and_grad(
                    lf, has_aux=True)(tr)
                up, opt_state2 = opt.update(g, opt_state, tr)
                return optax.apply_updates(tr, up), opt_state2, loss, aux
            for _ in range(n_steps):
                key, sk = jax.random.split(key)
                tr, opt_state, loss, aux = step1(tr, fx, opt_state, sk)
                if aux:
                    fx = {**fx, **aux}
        infr.params.update_params(tr)
        infr.params.update_params(fx)
        infr.params.fixed.update(aux.keys())
        k = m.Y.factor._module_graph.kernel
        ls = np.asarray(infr.params[k.lengthscale]).item()
        # prediction from the cache written back by the LAST step
        Xt = np.linspace(0, 4, 12)[:, None]
        p = TransferInference(ModulePredictionAlgorithm(
            model=m, observed=[m.X], target_variables=[m.Y.uuid]),
            infr_params=infr.params)
        mu, _ = p.run(X=Xt)[0]
        return ls, float(loss), np.asarray(mu)

    ls_s, loss_s, mu_s = train(sharded=True)
    ls_1, loss_1, mu_1 = train(sharded=False)
    assert np.isclose(ls_s, ls_1, rtol=1e-5), (ls_s, ls_1)
    assert np.isclose(loss_s, loss_1, rtol=1e-5)
    np.testing.assert_allclose(mu_s, mu_1, rtol=1e-5, atol=1e-6)


def test_cache_refresh_after_ungathered_shard_map_training():
    """gather_data=False training returns no module caches (per-shard
    Cholesky factors are not reducible); ONE make_cache_refresh_step
    call afterwards all-gathers the data, recomputes the exact full-data
    cache replicated, and leaves GPRegression predict-ready — the
    cached-path prediction must equal the closed form at the learned
    hyperparameters (VERDICT r2 item 3)."""
    from mxfusion_tpu.inference import (ModulePredictionAlgorithm,
                                        TransferInference)
    rng = np.random.default_rng(7)
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1

    m = _build_exact_gp()
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=X, Y=Y)
    ex = create_executor(alg, infr.params)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())
    mesh = make_mesh(8)
    step, opt = make_shard_map_step(ex, mesh, "adam", 0.05,
                                    gather_data=False)
    opt_state = opt.init(tr)
    data = shard_data(mesh, [X, Y])
    key = jax.random.PRNGKey(0)
    aux = {}
    for _ in range(15):
        key, sk = jax.random.split(key)
        tr, opt_state, loss, aux = step(tr, fx, opt_state, sk, data)
    assert not aux, "gather_data=False must not return caches"

    # one all-gather forward pass -> exact full-data caches
    refresh = make_cache_refresh_step(ex, mesh)
    key, sk = jax.random.split(key)
    _, aux = refresh(tr, fx, sk, data)
    assert aux, "refresh step must return the module caches"
    infr.params.update_params(tr)
    infr.params.update_params(dict(aux))
    infr.params.fixed.update(aux.keys())

    # cached-path prediction equals the closed form at the LEARNED
    # hyperparameters (proves the cache is the exact full-data cache)
    k = m.Y.factor._module_graph.kernel
    ls = np.asarray(infr.params[k.lengthscale]).item()
    var = np.asarray(infr.params[k.variance]).item()
    noise = np.asarray(infr.params[m.noise_var]).item()
    Xt = np.linspace(0, 4, 9)[:, None]
    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, _ = p.run(X=Xt)[0]

    def np_rbf(A, B):
        r2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1) / ls ** 2
        return var * np.exp(-0.5 * r2)

    K = np_rbf(X, X) + noise * np.eye(N)
    mu_exp = np_rbf(Xt, X) @ np.linalg.solve(K, Y)
    np.testing.assert_allclose(np.asarray(mu)[0], mu_exp,
                               rtol=1e-5, atol=1e-6)


def test_2d_mesh_svgp_data_and_model_sharded():
    """Exercise BOTH axes of make_mesh_2d on a real workload: SVGP with
    the data batch sharded over the 'data' axis and the M-inducing axis
    of Z / q(U) parameters sharded over the 'model' axis. GSPMD inserts
    the collectives; the sharded training step must equal the unsharded
    one (sharding is a layout, not a math change)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mxfusion_tpu.parallel import make_mesh_2d

    rng = np.random.default_rng(6)
    M_ind = 16
    X = rng.random((N, 2)) * 4
    Y = np.sin(X[:, :1]) + rng.standard_normal((N, 1)) * 0.1
    Z0 = rng.random((M_ind, 2)) * 4

    def build():
        m = Model()
        m.n = Variable()
        m.X = Variable(shape=(m.n, 2))
        m.noise_var = Variable(transformation=PositiveTransformation(),
                               initial_value=0.1)
        kernel = RBF(input_dim=2, variance=1.0, lengthscale=1.0)
        m.Y = SVGPRegression.define_variable(
            X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.n, 1),
            inducing_inputs=Variable(shape=(M_ind, 2),
                                     initial_value=Z0))
        return m

    def train(mesh):
        m = build()
        alg = MAP(model=m, observed=[m.X, m.Y])
        infr = GradBasedInference(inference_algorithm=alg)
        infr.initialize(X=X, Y=Y)
        ex = create_executor(alg, infr.params)
        tr = dict(infr.params.trainable_params())
        fx = dict(infr.params.fixed_params())
        data = [jnp.asarray(X), jnp.asarray(Y)]
        if mesh is not None:
            data_sh = NamedSharding(mesh, P("data", None))
            rep = NamedSharding(mesh, P())
            data = [jax.device_put(d, data_sh) for d in data]
            q = m.Y.factor._extra_graphs[0]
            m_graph = m.Y.factor._module_graph
            # shard the M axis of the variational/inducing parameters
            m_axis_uuids = {q.qU_mean.uuid, q.qU_cov_W.uuid,
                            q.qU_cov_diag.uuid,
                            m_graph.inducing_inputs.uuid}

            def model_sharded(a):
                spec = P("model", *([None] * (a.ndim - 1)))
                return jax.device_put(a, NamedSharding(mesh, spec))
            tr = {u: model_sharded(a) if u in m_axis_uuids
                  else jax.device_put(a, rep) for u, a in tr.items()}
            fx = {u: jax.device_put(a, rep) for u, a in fx.items()}
        opt = optax.adam(0.05)
        opt_state = opt.init(tr)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def step1(tr, fx, opt_state, key):
            def lf(t):
                loss, lg, aux = ex(t, fx, data, key)
                return lg, loss
            (_, loss), g = jax.value_and_grad(lf, has_aux=True)(tr)
            up, opt_state2 = opt.update(g, opt_state, tr)
            return optax.apply_updates(tr, up), opt_state2, loss
        losses = []
        for _ in range(10):
            key, sk = jax.random.split(key)
            tr, opt_state, loss = step1(tr, fx, opt_state, sk)
            losses.append(float(loss))
        return losses

    mesh = make_mesh_2d(4, 2)
    sharded = train(mesh)
    plain = train(None)
    # float32 params: partitioned reductions reassociate sums, so a
    # few-ulp drift compounds over the 10 steps
    np.testing.assert_allclose(sharded, plain, rtol=5e-4)


def test_data_parallel_minibatch_scanned_shards_batches():
    """batches_per_call > 1 on DataParallelMinibatchLoop must shard the
    stacked (k, B, ...) batches over the mesh (regression: the scanned
    path used to ignore data_sharding silently)."""
    from mxfusion_tpu.parallel import DataParallelMinibatchLoop
    rng = np.random.default_rng(8)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(m.s, (m.n, 1)),
                                 shape=(m.n, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=6, model=m,
                                         posterior=q, observed=[m.y])
    mesh = make_mesh(8)
    loop = DataParallelMinibatchLoop(mesh, batch_size=40,
                                     rv_scaling={m.y: N / 40},
                                     batches_per_call=2)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=30, learning_rate=0.1, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.6


def test_shard_data_divides_by_named_axis_not_total_devices():
    """On a 2-D mesh, data only needs to divide the DATA axis size: a
    leading dim divisible by 4 (data) but not 8 (total devices) must
    shard, not silently replicate (r5 review fix)."""
    from mxfusion_tpu.parallel import make_mesh_2d
    mesh = make_mesh_2d(4, 2)
    (arr,) = shard_data(mesh, [np.zeros((12, 3), np.float32)])
    # 12 % 4 == 0: sharded over 'data' -> per-device shard has 3 rows
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(3, 3)}, shard_shapes


def test_shard_data_warns_when_large_array_replicates():
    """A big array that cannot shard (leading dim not divisible) is
    replicated for correctness but must WARN — silently losing data
    parallelism was the r5 review finding."""
    import warnings
    mesh = make_mesh(8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        shard_data(mesh, [np.zeros((1001, 2), np.float32),
                          np.float32(3.0)])  # scalar: silent replicate
    msgs = [str(x.message) for x in w
            if issubclass(x.category, RuntimeWarning)]
    assert any("REPLICATING" in s for s in msgs), msgs
    assert len(msgs) == 1  # the scalar side input does not warn


def test_minibatch_loop_validates_divisibility_upfront():
    """min(batch_size, N) not divisible by the mesh axis must raise a
    clear constructor-time-style error, not an opaque device_put
    failure on the first batch (r5 review finding)."""
    from mxfusion_tpu.parallel import DataParallelMinibatchLoop
    rng = np.random.default_rng(2)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(1.0, (m.n, 1)),
                                 shape=(m.n, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=6, model=m,
                                         posterior=q, observed=[m.y])
    mesh = make_mesh(8)
    # B = min(100, 160) = 100, and 100 % 8 != 0
    infr = GradBasedInference(
        inference_algorithm=alg,
        grad_loop=DataParallelMinibatchLoop(mesh, batch_size=100,
                                            rv_scaling={m.y: N / 100}))
    with pytest.raises(ValueError, match="divisible"):
        infr.run(max_iter=2, learning_rate=0.1, y=y)


def test_batch_loop_honors_explicit_data_sharding():
    """A caller-supplied data_sharding overrides the shard_data
    heuristic instead of being silently discarded (r5 review
    finding)."""
    from mxfusion_tpu.parallel.mesh import replicated_sharding
    rng = np.random.default_rng(3)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m, q, alg = _meanfield_setup()
    mesh = make_mesh(8)
    infr = GradBasedInference(inference_algorithm=alg,
                              grad_loop=DataParallelBatchLoop(mesh))
    infr.run(max_iter=60, learning_rate=0.1, y=y,
             data_sharding=[replicated_sharding(mesh)])
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.5
