"""Data-parallel gradient loops over a device mesh.

Primary path (GSPMD): observed data is sharded over the mesh's data
axis, parameters are replicated, and the jitted step keeps *global
view* semantics — the loss/grad program XLA compiles is identical math
to single-device, partitioned across devices with psum/reduce-scatter
collectives inserted automatically over ICI. Minibatch statistics
(``rv_scaling``) therefore need NO adjustment.

An explicit ``shard_map`` step is also provided (used by the multichip
dry-run and available for cases where manual collective placement
beats GSPMD).
"""
import jax
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, batch_sharding, shard_data, \
    replicate_tree
from ..inference.batch_loop import BatchInferenceLoop, make_optimizer
from ..inference.minibatch_loop import MinibatchInferenceLoop


class DataParallelBatchLoop(BatchInferenceLoop):
    """Full-batch loop with data sharded over a mesh."""

    def __init__(self, mesh, axis_name=DATA_AXIS, steps_per_call=1,
                 metrics_callback=None):
        super().__init__(steps_per_call=steps_per_call,
                         metrics_callback=metrics_callback)
        self.mesh = mesh
        self.axis_name = axis_name

    def run(self, executor, params, data, **kwargs):
        custom = kwargs.pop("data_sharding", None)
        if custom is not None:
            # an explicit per-array placement overrides the shard_data
            # heuristic (e.g. replicate one side input, shard the rest)
            data = [jax.device_put(np.asarray(d), s)
                    for d, s in zip(data, custom)]
        else:
            data = shard_data(self.mesh, data, self.axis_name)
        replicated = replicate_tree(self.mesh, dict(params.param_dict))
        params.param_dict.update(replicated)
        return super().run(executor, params, data, **kwargs)


class DataParallelMinibatchLoop(MinibatchInferenceLoop):
    """Minibatch loop whose batches are sharded over the mesh.

    The global batch of size B is split across devices (B must divide
    by the mesh size); ``rv_scaling`` stays N/B exactly as in the
    single-device case because the jitted step sees the global batch.
    """

    def __init__(self, mesh, batch_size=100, rv_scaling=None,
                 axis_name=DATA_AXIS, batches_per_call=1,
                 metrics_callback=None):
        super().__init__(batch_size=batch_size, rv_scaling=rv_scaling,
                         batches_per_call=batches_per_call,
                         metrics_callback=metrics_callback)
        self.mesh = mesh
        self.axis_name = axis_name

    def run(self, executor, params, data, **kwargs):
        # the loop clamps the effective batch to min(batch_size, N) —
        # validate THAT value against the mesh here, where the error
        # can name the fix, instead of an opaque device_put failure on
        # the first batch mid-run
        n_shards = self.mesh.shape[self.axis_name]
        N = int(np.asarray(data[0]).shape[0]) if data else 0
        B = min(self.batch_size, N)
        if B % n_shards:
            raise ValueError(
                "effective batch size min(batch_size={}, N={}) = {} "
                "must be divisible by the '{}' mesh axis size ({}) "
                "for data-parallel minibatching.".format(
                    self.batch_size, N, B, self.axis_name, n_shards))
        shardings = [batch_sharding(self.mesh, np.asarray(d).ndim,
                                    self.axis_name) for d in data]
        replicated = replicate_tree(self.mesh, dict(params.param_dict))
        params.param_dict.update(replicated)
        kwargs["data_sharding"] = shardings
        return super().run(executor, params, data, **kwargs)


def make_shard_map_step(executor, mesh, optimizer, learning_rate,
                        axis_name=DATA_AXIS, gather_data=False):
    """Explicit shard_map training step (manual collective placement).

    Each device runs the objective on its local data shard; gradients
    and losses are ``pmean``-reduced over ICI; the optimizer update runs
    replicated. For objectives whose likelihood is a data sum (SVI,
    SVGP), create the executor with ``rv_scaling`` multiplied by the
    mesh size so per-shard losses average to prior + full likelihood.

    Per-shard Monte-Carlo sampling folds the shard index into the step
    key, so shards draw independent latent samples — a valid (and
    lower-variance) estimator of the same reparameterized objective.

    ``gather_data=True`` is for objectives that do NOT decompose over
    data (exact GP marginal likelihood: one N x N Cholesky over ALL
    points): shards keep only 1/n of the dataset in HBM and
    ``all_gather`` it over ICI inside the step, computing the full
    objective replicated — identical math to single-device, so no
    rv_scaling adjustment and no key folding (shards must stay
    bit-identical).

    Module caches (aux/SET_ writebacks): the step returns
    ``(trainable, opt_state, loss, aux)``. Under ``gather_data=True``
    every shard computes the IDENTICAL cache from the gathered data, so
    the pmean is exact and the returned aux can be written into the
    fixed dict exactly as the single-device loops do. Under
    ``gather_data=False`` per-shard caches are functions of different
    data shards and no element-wise reduction of them is meaningful
    (the mean of Cholesky factors is not a Cholesky factor), so aux is
    returned EMPTY during training — finish with ONE
    :func:`make_cache_refresh_step` call (a single all-gather forward
    pass) to leave the modules predict-ready.
    """
    opt = make_optimizer(optimizer, learning_rate)
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def local_loss(tr, fx, data, key):
        loss, loss_for_grad, aux = executor(tr, fx, list(data), key)
        return loss_for_grad, (loss, aux)

    def step(trainable, fixed, opt_state, key, data):
        def shard_fn(tr, fx, opt_state, key, *data_shards):
            if gather_data:
                data_shards = [
                    jax.lax.all_gather(d, axis_name, axis=0, tiled=True)
                    for d in data_shards]
            else:
                idx = jax.lax.axis_index(axis_name)
                key = jax.random.fold_in(key, idx)
            (_, (loss, aux)), grads = jax.value_and_grad(
                local_loss, has_aux=True)(tr, fx, data_shards, key)
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            if not gather_data:
                # per-shard caches are NOT reducible (see docstring)
                aux = {}
            elif jax.tree_util.tree_leaves(aux):
                aux = jax.lax.pmean(aux, axis_name)
            updates, new_opt_state = opt.update(grads, opt_state, tr)
            new_tr = optax.apply_updates(tr, updates)
            return new_tr, new_opt_state, loss, aux

        in_specs = (
            jax.tree_util.tree_map(lambda _: P(), trainable),
            jax.tree_util.tree_map(lambda _: P(), fixed),
            jax.tree_util.tree_map(lambda _: P(), opt_state),
            P(),
        ) + tuple(P(axis_name) for _ in data)
        out_specs = (
            jax.tree_util.tree_map(lambda _: P(), trainable),
            jax.tree_util.tree_map(lambda _: P(), opt_state),
            P(),
            P(),  # pytree-prefix spec: aux caches come out replicated
        )
        # jax>=0.8 renamed check_rep -> check_vma; pass whichever the
        # installed shard_map accepts
        import inspect
        kw = ("check_vma" if "check_vma" in
              inspect.signature(shard_map).parameters else "check_rep")
        fn = shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, **{kw: False})
        return fn(trainable, fixed, opt_state, key, *data)

    return jax.jit(step), opt


def make_cache_refresh_step(executor, mesh, axis_name=DATA_AXIS):
    """One forward pass over the FULL (all-gathered) data to populate
    module caches (SET_ writebacks) after sharded training.

    ``make_shard_map_step(gather_data=False)`` trains with per-shard
    data and cannot return meaningful module caches (see its
    docstring). This step leaves the modules predict-ready: each shard
    ``all_gather``s the data once over ICI, runs the executor forward
    (no gradient, no update), and the identical per-shard caches come
    back replicated — write them into the inference parameters and
    cached prediction works without retraining::

        step = make_cache_refresh_step(executor, mesh)
        loss, aux = step(trainable, fixed, key, data)   # data sharded
        infr.params.update_params({**aux})
        infr.params.fixed.update(aux.keys())

    Note on the returned loss: if the training executor folded the
    mesh-size factor into ``rv_scaling`` (the gather_data=False
    recipe), its value over the full data is scaled accordingly — use
    it as a diagnostic only, or pass an unscaled executor.
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    import inspect
    kw = ("check_vma" if "check_vma" in
          inspect.signature(shard_map).parameters else "check_rep")

    def step(trainable, fixed, key, data):
        def shard_fn(tr, fx, key, *data_shards):
            full = [jax.lax.all_gather(d, axis_name, axis=0, tiled=True)
                    for d in data_shards]
            loss, _, aux = executor(tr, fx, list(full), key)
            return loss, aux

        in_specs = (
            jax.tree_util.tree_map(lambda _: P(), trainable),
            jax.tree_util.tree_map(lambda _: P(), fixed),
            P(),
        ) + tuple(P(axis_name) for _ in data)
        out_specs = (P(), P())
        fn = shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, **{kw: False})
        return fn(trainable, fixed, key, *data)

    return jax.jit(step)
