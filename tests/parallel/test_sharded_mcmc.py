"""Data-parallel MCMC: sharding the observed data across the mesh must
not change the chain (GSPMD layout, not math — same invariant as the
SVI tests). The potential's data terms become per-shard partial sums +
collectives; with identical PRNG keys the chains agree to float
reassociation tolerance."""
import numpy as np
import jax
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.inference import (HMCAlgorithm, SGLDAlgorithm,
                                    create_sampling_executor, Inference)
from mxfusion_tpu.parallel import make_mesh, shard_data

N, D = 128, 2


def _model():
    m = Model()
    m.X = Variable(shape=(N, D))
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (D, 1)),
        variance=broadcast_to(Variable(value=1.), (D, 1)),
        shape=(D, 1))
    m.f = dot(m.X, m.w)
    m.y = Normal.define_variable(
        mean=m.f, variance=broadcast_to(Variable(value=0.25), (N, 1)),
        shape=(N, 1))
    return m


def _run(alg_cls, data_builder, **alg_kw):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D))
    y = X @ np.array([[1.0], [-0.5]]) + \
        rng.standard_normal((N, 1)) * 0.5
    m = _model()
    alg = alg_cls(model=m, observed=[m.X, m.y], **alg_kw)
    infr = Inference(inference_algorithm=alg)
    infr.initialize(X=X, y=y)
    ex = create_sampling_executor(alg, infr.params)
    data = data_builder([X, y])
    out = jax.jit(ex)(infr.params.trainable_params(),
                      infr.params.fixed_params(), data,
                      jax.random.PRNGKey(0))
    samples, diag = out
    return np.asarray(samples[m.w.uuid])


def test_hmc_sharded_data_matches_unsharded():
    kw = dict(num_samples=40, num_warmup=30, num_chains=2,
              num_leapfrog=5, adapt_mass=False)
    plain = _run(HMCAlgorithm, lambda d: [jnp.asarray(x) for x in d],
                 **kw)
    mesh = make_mesh(8)
    sharded = _run(HMCAlgorithm, lambda d: shard_data(mesh, d), **kw)
    np.testing.assert_allclose(plain, sharded, rtol=2e-4, atol=1e-5)


def test_sgld_sharded_data_matches_unsharded():
    kw = dict(num_samples=50, num_burnin=20, num_chains=2,
              batch_size=None, step_size=1e-4, step_decay_gamma=0.0)
    plain = _run(SGLDAlgorithm, lambda d: [jnp.asarray(x) for x in d],
                 **kw)
    mesh = make_mesh(8)
    sharded = _run(SGLDAlgorithm, lambda d: shard_data(mesh, d), **kw)
    np.testing.assert_allclose(plain, sharded, rtol=2e-4, atol=1e-5)


def test_pt_sharded_data_matches_unsharded():
    from mxfusion_tpu.inference import ParallelTemperingAlgorithm
    kw = dict(num_samples=40, num_warmup=30, num_chains=2, num_temps=4,
              num_leapfrog=5)
    plain = _run(ParallelTemperingAlgorithm,
                 lambda d: [jnp.asarray(x) for x in d], **kw)
    mesh = make_mesh(8)
    sharded = _run(ParallelTemperingAlgorithm,
                   lambda d: shard_data(mesh, d), **kw)
    np.testing.assert_allclose(plain, sharded, rtol=2e-4, atol=1e-5)
