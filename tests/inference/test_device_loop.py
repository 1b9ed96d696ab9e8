"""Device-resident minibatch loop tests (CPU; same code path as TPU)."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield, MAP, DeviceMinibatchLoop,
    ModulePredictionAlgorithm, TransferInference)

N, B = 240, 40


def _meanfield_model():
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(m.s, (m.n, 1)),
                                 shape=(m.n, 1))
    return m


def test_device_loop_svi_converges():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m = _meanfield_model()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=8, model=m,
                                         posterior=q, observed=[m.y])
    loop = DeviceMinibatchLoop(batch_size=B, rv_scaling={m.y: N / B})
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    losses = []
    infr.run(max_iter=40, learning_rate=0.1, y=y,
             callback=lambda e, l: losses.append(l))
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.5
    assert losses[-1] < losses[0]


def test_device_loop_uneven_batches_rollover():
    # N not a multiple of B: trailing batch wraps the permutation
    rng = np.random.default_rng(1)
    y = rng.standard_normal((N + 7, 1)) + 2.0
    m = _meanfield_model()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=8, model=m,
                                         posterior=q, observed=[m.y])
    loop = DeviceMinibatchLoop(batch_size=B,
                               rv_scaling={m.y: (N + 7) / B})
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=30, learning_rate=0.1, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.6


def test_device_loop_svgp_with_prediction():
    rng = np.random.default_rng(2)
    X = rng.random((N, 2)) * 4
    Y = np.sin(X[:, :1]) + rng.standard_normal((N, 1)) * 0.1
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 2))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    Z0 = rng.random((16, 2)) * 4
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=2, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(16, 2), initial_value=Z0))
    loop = DeviceMinibatchLoop(batch_size=B, rv_scaling={m.Y: N / B})
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)
    infr.run(max_iter=60, learning_rate=0.02, X=X, Y=Y)

    Xt = X[:20]
    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, var = p.run(X=Xt)[0]
    err = float(np.abs(np.asarray(mu)[0, :, 0] -
                       np.sin(Xt[:, 0])).mean())
    assert err < 0.3, err


def test_minibatch_and_device_loops_report_metrics():
    from mxfusion_tpu.inference import MinibatchInferenceLoop
    rng = np.random.default_rng(5)
    y = rng.standard_normal((N, 1)) + 2.0
    for loop_cls, kw in ((DeviceMinibatchLoop, {}),
                         (MinibatchInferenceLoop, {}),
                         (MinibatchInferenceLoop,
                          {"batches_per_call": 3})):
        records = []
        m = _meanfield_model()
        q = create_Gaussian_meanfield(model=m, observed=[m.y])
        alg = StochasticVariationalInference(num_samples=6, model=m,
                                             posterior=q,
                                             observed=[m.y])
        loop = loop_cls(batch_size=B, rv_scaling={m.y: N / B},
                        metrics_callback=lambda e, mtr:
                        records.append(mtr), **kw)
        infr = GradBasedInference(inference_algorithm=alg,
                                  grad_loop=loop)
        infr.run(max_iter=5, learning_rate=0.1, y=y)
        assert len(records) == 5, loop_cls
        for mtr in records:
            assert set(mtr) == {"loss", "grad_norm", "epoch_time_s"}
            assert np.isfinite(mtr["loss"])
            assert mtr["grad_norm"] >= 0
            assert mtr["epoch_time_s"] > 0


def test_device_loop_with_sharded_resident_dataset():
    """data_sharding keeps the HBM-resident dataset sharded over the
    mesh; the global-permutation gather goes through GSPMD collectives
    and must converge identically in spirit to the unsharded run."""
    import jax
    from mxfusion_tpu.parallel import make_mesh, batch_sharding
    rng = np.random.default_rng(7)
    y = rng.standard_normal((N, 1)) + 2.5
    m = _meanfield_model()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=6, model=m,
                                         posterior=q, observed=[m.y])
    mesh = make_mesh(8)
    loop = DeviceMinibatchLoop(batch_size=B, rv_scaling={m.y: N / B})
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=30, learning_rate=0.1, y=y,
             data_sharding=[batch_sharding(mesh, 2)])
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.6


def test_device_loop_carries_module_caches():
    """A module with SET_ caches (exact GP: X/L/LinvY) trained through
    the device loop: the aux pytree must ride the epoch scan and the
    FINAL batch's cache must land in fixed storage usable for
    prediction (mechanics of the aux carry; statistically each batch is
    a subset-GP, which is fine for this purpose)."""
    from mxfusion_tpu.modules import GPRegression
    rng = np.random.default_rng(9)
    n, b = 80, 40
    X = rng.random((n, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((n, 1)) * 0.1
    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.N, 1))
    loop = DeviceMinibatchLoop(batch_size=b, rv_scaling={m.Y: 1.0})
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)
    infr.run(max_iter=20, learning_rate=0.02, X=X, Y=Y)
    # caches exist, are fixed, and are batch-sized (bound to B)
    assert len(infr.params.fixed) > 0
    for u in infr.params.fixed:
        arr = np.asarray(infr.params.param_dict[u])
        assert np.all(np.isfinite(arr))
        assert arr.shape[0] == b or arr.shape[-2] == b or \
            arr.shape[-1] == b, arr.shape
    # the cached state supports prediction
    p = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, var = p.run(X=X[:10])[0]
    assert np.all(np.isfinite(np.asarray(mu)))


def test_device_loop_shard_local_shuffle_converges():
    """shard_local_shuffle=True: per-device permutations, no
    cross-device row movement; same unbiased estimator, so convergence
    matches the global-shuffle mode."""
    from mxfusion_tpu.parallel import make_mesh, batch_sharding
    rng = np.random.default_rng(8)
    y = rng.standard_normal((N, 1)) + 2.5
    m = _meanfield_model()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=6, model=m,
                                         posterior=q, observed=[m.y])
    mesh = make_mesh(8)
    loop = DeviceMinibatchLoop(batch_size=B, rv_scaling={m.y: N / B},
                               shard_local_shuffle=True)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=30, learning_rate=0.1, y=y,
             data_sharding=[batch_sharding(mesh, 2)])
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.6


def test_device_loop_shard_local_full_batch_matches_global():
    """With B=N each epoch's single batch is the whole (permuted)
    dataset, and the data-sum objective is permutation-invariant — the
    shard-local and global-shuffle trajectories must agree to float
    tolerance (proves shard-local assembly loses no rows and changes
    no math)."""
    import jax
    from mxfusion_tpu.parallel import make_mesh, batch_sharding
    rng = np.random.default_rng(9)
    y = rng.standard_normal((N, 1)) + 1.0
    mesh = make_mesh(8)

    def run(shard_local):
        m = _meanfield_model()
        q = create_Gaussian_meanfield(model=m, observed=[m.y])
        alg = StochasticVariationalInference(num_samples=6, model=m,
                                             posterior=q,
                                             observed=[m.y])
        loop = DeviceMinibatchLoop(batch_size=N,
                                   rv_scaling={m.y: 1.0},
                                   shard_local_shuffle=shard_local)
        infr = GradBasedInference(inference_algorithm=alg,
                                  grad_loop=loop)
        losses = []
        infr.run(max_iter=8, learning_rate=0.1, y=y,
                 key=jax.random.PRNGKey(4),
                 data_sharding=[batch_sharding(mesh, 2)],
                 callback=lambda e, l: losses.append(float(l)))
        return np.asarray(losses)

    np.testing.assert_allclose(run(True), run(False),
                               rtol=1e-6, atol=1e-8)


def test_device_loop_shard_local_requires_divisibility():
    import pytest
    from mxfusion_tpu.parallel import make_mesh, batch_sharding
    rng = np.random.default_rng(10)
    y = rng.standard_normal((N, 1))
    m = _meanfield_model()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=4, model=m,
                                         posterior=q, observed=[m.y])
    mesh = make_mesh(8)
    loop = DeviceMinibatchLoop(batch_size=B + 4,  # 44 % 8 != 0
                               rv_scaling={m.y: N / (B + 4)},
                               shard_local_shuffle=True)
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    with pytest.raises(ValueError, match="divisible"):
        infr.run(max_iter=1, learning_rate=0.1, y=y,
                 data_sharding=[batch_sharding(mesh, 2)])
    loop2 = DeviceMinibatchLoop(batch_size=B, rv_scaling={m.y: N / B},
                                shard_local_shuffle=True)
    infr2 = GradBasedInference(inference_algorithm=alg, grad_loop=loop2)
    with pytest.raises(ValueError, match="data_sharding"):
        infr2.run(max_iter=1, learning_rate=0.1, y=y)
