"""Device-resident minibatch gradient loop.

The host minibatch loop (minibatch_loop.py) gathers every batch on the
host and ships it to the device — on a relay-attached TPU that transfer
dominates the epoch (benchmarks/NOTES.md r1: ~3.9 s/epoch of transfer
for a 10^6-point SVGP whose compute is far cheaper). This loop parks
the FULL dataset in HBM once and runs the whole epoch as ONE XLA
program: a fori-style ``lax.scan`` over batches whose body draws its
minibatch with an on-device gather from a per-epoch on-device
permutation. Host traffic per epoch = one scalar fetch.

No reference counterpart (the reference's DataLoader is host-side,
/root/reference/mxfusion/inference/minibatch_loop.py:66-71); this is
the TPU-native data path the north-star workload needs.

Rollover semantics match MinibatchInferenceLoop: every batch has the
same size B (the epoch's trailing remainder wraps around the
permutation), so the step compiles exactly once.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .minibatch_loop import MinibatchInferenceLoop
from .batch_loop import make_optimizer, _aux_zeros


class DeviceMinibatchLoop(MinibatchInferenceLoop):
    """Minibatch SVI with the dataset resident in device memory.

    Subclasses :class:`MinibatchInferenceLoop` so the driver binds
    symbolic shapes to the batch size the same way; only the data path
    differs. ``data_sharding``, when given, keeps the RESIDENT dataset
    sharded over the mesh data axis. By default the gather uses a
    GLOBAL random permutation, so GSPMD must move rows across devices
    to assemble each batch (collectives over ICI) — correct, and it
    keeps per-device HBM at 1/n of the dataset, but batch assembly is
    not shard-local. ``shard_local_shuffle=True`` switches to
    per-device permutations over each device's own rows (stratified
    without-replacement sampling): batch assembly becomes a purely
    local gather with zero cross-device row movement.
    """

    def __init__(self, batch_size=100, rv_scaling=None,
                 metrics_callback=None, shard_local_shuffle=False):
        super().__init__(batch_size=batch_size, rv_scaling=rv_scaling,
                         metrics_callback=metrics_callback)
        # shard_local_shuffle=True (requires data_sharding): each device
        # permutes only ITS OWN rows per epoch and every batch is the
        # union of per-shard draws — batch assembly is a purely local
        # gather, no cross-device row movement. Statistically this is
        # stratified (without-replacement per shard) minibatching: the
        # same unbiased data-sum estimator, with each point still seen
        # exactly once per epoch. Requires N and B divisible by the
        # mesh's data-axis size.
        self.shard_local_shuffle = shard_local_shuffle

    def _build_one_step(self, executor, opt, metrics_cb):
        """Single optimizer step ``(trainable, fixed, opt_state, key,
        batch) -> (trainable, opt_state, loss, aux, gnorm)``; override
        point for alternative updates (natural gradients)."""
        def one_step(trainable, fixed, opt_state, key, batch):
            def loss_fn(tr):
                loss, loss_for_grad, aux = executor(tr, fixed, batch, key)
                return loss_for_grad, (loss, aux)
            (_, (loss, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            # static flag: only traced in when a metrics consumer exists
            gnorm = optax.global_norm(grads) if metrics_cb is not None \
                else jnp.zeros((), dtype=loss.dtype)
            updates, opt_state = opt.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, aux, gnorm
        return one_step

    def run(self, executor, params, data, optimizer="adam",
            learning_rate=1e-3, max_iter=1000, key=None, verbose=False,
            callback=None, data_sharding=None, resume_state=None):
        """``max_iter`` counts epochs (as in MinibatchInferenceLoop).

        ``resume_state`` (grad_loop.TrainState, step = epoch) restores
        optimizer moments + PRNG key for deterministic resume (the
        per-epoch permutation keys derive from the carried key)."""
        import time as _time
        if key is None:
            key = jax.random.PRNGKey(0)
        metrics_cb = self.metrics_callback
        opt = make_optimizer(optimizer, learning_rate)
        trainable = dict(params.trainable_params())
        fixed = dict(params.fixed_params())
        opt_state = opt.init(trainable)
        start = 0
        if resume_state is not None:
            opt_state = resume_state.restore_opt_state(opt_state)
            if resume_state.key is not None:
                key = jnp.asarray(resume_state.key)
            start = int(resume_state.step or 0)

        # park the dataset in HBM once
        data = [jnp.asarray(d) for d in data]
        if data_sharding is not None:
            data = [jax.device_put(d, s)
                    for d, s in zip(data, data_sharding)]
        N = data[0].shape[0]
        B = min(self.batch_size, N)
        n_batches = max(1, -(-N // B))
        pad = n_batches * B - N

        shard_local = bool(self.shard_local_shuffle)
        if shard_local:
            if data_sharding is None:
                raise ValueError(
                    "shard_local_shuffle=True requires data_sharding "
                    "(the resident dataset must live sharded on a mesh).")
            from jax.sharding import NamedSharding, PartitionSpec
            sharding0 = data_sharding[0]
            axis = sharding0.spec[0]
            smesh = sharding0.mesh
            n_sh = smesh.shape[axis]
            if N % n_sh or B % n_sh:
                raise ValueError(
                    "shard_local_shuffle needs N ({}) and batch size "
                    "({}) divisible by the data-axis size ({})."
                    .format(N, B, n_sh))
            Nl, Bl = N // n_sh, B // n_sh
            n_batches = max(1, -(-Nl // Bl))
            pad_l = n_batches * Bl - Nl

            def _resharded(d):
                # (N, ...) -> (n_sh, Nl, ...) with the shard axis
                # leading: the reshape is layout-local on the mesh
                return jax.lax.with_sharding_constraint(
                    d.reshape((n_sh, Nl) + d.shape[1:]),
                    NamedSharding(smesh,
                                  PartitionSpec(axis, *([None] * d.ndim))))

            def make_batch_indices(pkey):
                pkeys = jax.random.split(pkey, n_sh)
                perms = jax.vmap(
                    lambda k: jax.random.permutation(k, Nl))(pkeys)
                if pad_l:
                    perms = jnp.concatenate([perms, perms[:, :pad_l]],
                                            axis=1)
                # (n_batches, n_sh, Bl)
                return perms.reshape(
                    (n_sh, n_batches, Bl)).transpose(1, 0, 2)

            def gather_batch(data_parked, bidx):
                batch = []
                for dr in data_parked:
                    b = jax.vmap(
                        lambda dd, ii: jnp.take(dd, ii, axis=0))(dr, bidx)
                    b = b.reshape((B,) + dr.shape[2:])
                    batch.append(jax.lax.with_sharding_constraint(
                        b, NamedSharding(
                            smesh,
                            PartitionSpec(axis, *([None] * (b.ndim - 1))))))
                return batch

            parked = [_resharded(d) for d in data]
        else:
            def make_batch_indices(pkey):
                perm = jax.random.permutation(pkey, N)
                if pad:
                    perm = jnp.concatenate([perm, perm[:pad]])
                return perm.reshape((n_batches, B))

            def gather_batch(data_parked, bidx):
                return [jnp.take(d, bidx, axis=0) for d in data_parked]

            parked = data

        one_step = self._build_one_step(executor, opt, metrics_cb)

        sample_batch = [d[:B] for d in data]
        aux_zeros = _aux_zeros(executor, trainable, fixed, sample_batch,
                               key)
        has_aux = bool(jax.tree_util.tree_leaves(aux_zeros))

        @jax.jit
        def epoch(trainable, fixed, opt_state, key, data, aux0):
            pkey, skey = jax.random.split(key)
            idx = make_batch_indices(pkey)

            def body(carry, xs):
                tr, st, fx_aux = carry
                subkey, bidx = xs
                batch = gather_batch(data, bidx)
                fx = {**fixed, **fx_aux} if has_aux else fixed
                tr, st, loss, aux, gnorm = one_step(tr, fx, st, subkey,
                                                    batch)
                return (tr, st, aux if has_aux else fx_aux), (loss, gnorm)
            keys = jax.random.split(skey, n_batches)
            (tr, st, aux), (losses, gnorms) = jax.lax.scan(
                body, (trainable, opt_state, aux0), (keys, idx))
            return (tr, st, aux, jnp.mean(losses), losses[-1],
                    jnp.mean(gnorms))

        last_loss = None
        for e in range(start, max_iter):
            t0 = _time.perf_counter()
            key, subkey = jax.random.split(key)
            aux0 = {u: jnp.asarray(fixed.get(u, z), dtype=z.dtype)
                    for u, z in aux_zeros.items()}
            trainable, opt_state, aux, epoch_loss, last_loss, gnorm = \
                epoch(trainable, fixed, opt_state, subkey, parked, aux0)
            if has_aux:
                fixed = {**fixed, **aux}
            if verbose:
                print("epoch {} loss: {}".format(e + 1,
                                                 float(epoch_loss)))
            if callback is not None or metrics_cb is not None:
                self._sync_live_state(params, trainable, fixed,
                                      opt_state=opt_state, key=key,
                                      step=e + 1)
            if callback is not None:
                callback(e, float(epoch_loss))
            if metrics_cb is not None:
                metrics_cb(e, {
                    "loss": float(epoch_loss),
                    "grad_norm": float(gnorm),
                    "epoch_time_s": _time.perf_counter() - t0})
        self._sync_live_state(params, trainable, fixed,
                              opt_state=opt_state, key=key,
                              step=max_iter)
        return np.asarray(last_loss) if last_loss is not None else None
