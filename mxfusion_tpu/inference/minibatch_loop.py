"""Minibatch gradient loop.

Reference: /root/reference/mxfusion/inference/minibatch_loop.py:21-95.
Shuffled fixed-size batches with rollover (every batch the same shape,
so exactly ONE XLA compilation); the ``rv_scaling = N/batch`` correction
is folded into ``log_pdf_scaling`` at executor-build time. Batching
happens host-side through the native threaded gather
(mxfusion_tpu.native).

``batches_per_call = k`` stages k batches as one (k, B, ...) device
array and ``lax.scan``s k optimizer steps inside a single XLA program —
per-program dispatch overhead amortizes k-fold (the same protocol as
``BatchInferenceLoop.steps_per_call``, but each scanned step consumes a
fresh batch).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .grad_loop import GradLoop
from .batch_loop import make_optimizer, _aux_zeros


class MinibatchInferenceLoop(GradLoop):
    def __init__(self, batch_size=100, rv_scaling=None,
                 batches_per_call=1, metrics_callback=None):
        super().__init__()
        self.batch_size = batch_size
        self.rv_scaling = {v.uuid: s for v, s in rv_scaling.items()} \
            if rv_scaling is not None else None
        self.batches_per_call = batches_per_call
        # metrics_callback(epoch, metrics): structured per-epoch metrics
        # ({"loss", "grad_norm"} from inside the jitted step, averaged
        # over the epoch, plus host "epoch_time_s"); SURVEY §5 metrics
        self.metrics_callback = metrics_callback

    # ------------------------------------------------------------------
    def _epoch_batches(self, N, epoch):
        """Shuffled index batches (rollover-padded to the batch size).

        The effective batch size is ``min(batch_size, N)`` — the same
        clamp applied when the symbolic batch dim is bound
        (grad_based_inference._bind_minibatch_shapes), so the emitted
        shape always matches the jitted step.
        """
        from ..native import shuffled_indices
        B = min(self.batch_size, N)
        perm = shuffled_indices(N, seed=epoch)
        n_batches = max(1, -(-N // B))
        out = []
        for b in range(n_batches):
            idx = perm[b * B:(b + 1) * B]
            if idx.shape[0] < B:
                # tile the permutation so even B > 2*len(remaining)
                # pads to exactly B
                idx = np.concatenate([idx, np.resize(perm,
                                                     B - idx.shape[0])])
            out.append(idx)
        return out

    def run(self, executor, params, data, optimizer="adam",
            learning_rate=1e-3, max_iter=1000, key=None, verbose=False,
            callback=None, data_sharding=None, resume_state=None):
        """``max_iter`` counts epochs (as in the reference).

        ``resume_state`` (a :class:`~.grad_loop.TrainState`, step =
        EPOCH index here) restores optimizer moments + PRNG key and
        skips the already-completed epochs; per-epoch shuffles are
        seeded by the epoch number, so the resumed trajectory equals
        the uninterrupted one."""
        import time as _time
        from ..native import gather_rows
        if key is None:
            key = jax.random.PRNGKey(0)
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
        data = [np.asarray(d) for d in data]
        N = data[0].shape[0]
        B = min(self.batch_size, N)  # same clamp as the symbolic-dim bind

        metrics_cb = self.metrics_callback

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

        if self.batches_per_call <= 1:
            step = jax.jit(one_step)
            last_loss = None
            for e in range(start, max_iter):
                t0 = _time.perf_counter()
                # device-side loss accumulation: one host sync per epoch
                batch_losses = []
                batch_gnorms = []
                for idx in self._epoch_batches(N, e):
                    batch = [jnp.asarray(gather_rows(d, idx))
                             for d in data]
                    if data_sharding is not None:
                        batch = [jax.device_put(a, s)
                                 for a, s in zip(batch, data_sharding)]
                    key, subkey = jax.random.split(key)
                    trainable, opt_state, loss, aux, gnorm = step(
                        trainable, fixed, opt_state, subkey, batch)
                    if aux:
                        fixed = {**fixed, **aux}
                    batch_losses.append(loss)
                    batch_gnorms.append(gnorm)
                    last_loss = loss
                epoch_loss = float(jnp.mean(jnp.stack(batch_losses)))
                if verbose:
                    print("epoch {} loss: {}".format(e + 1, epoch_loss))
                if callback is not None or metrics_cb is not None:
                    self._sync_live_state(params, trainable, fixed,
                                          opt_state=opt_state, key=key,
                                          step=e + 1)
                if callback is not None:
                    callback(e, epoch_loss)
                if metrics_cb is not None:
                    metrics_cb(e, {
                        "loss": epoch_loss,
                        "grad_norm": float(jnp.mean(
                            jnp.stack(batch_gnorms))),
                        "epoch_time_s": _time.perf_counter() - t0})
            self._sync_live_state(params, trainable, fixed,
                                  opt_state=opt_state, key=key,
                                  step=max_iter)
            return np.asarray(last_loss) if last_loss is not None else None

        # scanned multi-batch path
        k = self.batches_per_call
        sample_batch = [jnp.zeros((B,) + d.shape[1:], dtype=d.dtype)
                        for d in data]
        aux_zeros = _aux_zeros(executor, trainable, fixed, sample_batch,
                               key)
        has_aux = bool(jax.tree_util.tree_leaves(aux_zeros))

        @jax.jit
        def multi_step(trainable, fixed, opt_state, key, stacked, aux0):
            def body(carry, xs):
                tr, st, fx_aux = carry
                subkey, batch = xs[0], list(xs[1:])
                fx = {**fixed, **fx_aux} if has_aux else fixed
                tr, st, loss, aux, gnorm = one_step(tr, fx, st, subkey,
                                                    batch)
                return (tr, st, aux if has_aux else fx_aux), (loss, gnorm)
            keys = jax.random.split(key, k)
            (tr, st, aux), (losses, gnorms) = jax.lax.scan(
                body, (trainable, opt_state, aux0),
                (keys,) + tuple(stacked))
            return tr, st, aux, losses, gnorms

        last_loss = None
        for e in range(start, max_iter):
            t0 = _time.perf_counter()
            idx_batches = self._epoch_batches(N, e)
            # pad to a multiple of k by wrapping (keeps shapes static)
            while len(idx_batches) % k != 0:
                idx_batches.append(idx_batches[len(idx_batches) % k])
            chunk_losses = []
            chunk_gnorms = []
            for c in range(0, len(idx_batches), k):
                idx = np.stack(idx_batches[c:c + k])     # (k, B)
                stacked = tuple(
                    jnp.asarray(gather_rows(d, idx.ravel()).reshape(
                        (k, B) + d.shape[1:])) for d in data)
                if data_sharding is not None:
                    # shard the BATCH axis (now axis 1 of the stacked
                    # (k, B, ...) array) with the caller's batch spec
                    from jax.sharding import NamedSharding, \
                        PartitionSpec as P
                    stacked = tuple(
                        jax.device_put(a, NamedSharding(
                            sh.mesh, P(None, *sh.spec)))
                        for a, sh in zip(stacked, data_sharding))
                key, subkey = jax.random.split(key)
                # seed the carried aux with CURRENT cache values (not a
                # stale closure constant from the first call); cast to
                # the executor's aux dtype for stable scan carry types
                aux0 = {u: jnp.asarray(fixed.get(u, z), dtype=z.dtype)
                        for u, z in aux_zeros.items()}
                trainable, opt_state, aux, losses, gnorms = multi_step(
                    trainable, fixed, opt_state, subkey, stacked, aux0)
                if has_aux:
                    fixed = {**fixed, **aux}
                chunk_losses.append(jnp.mean(losses))
                chunk_gnorms.append(jnp.mean(gnorms))
                last_loss = losses[-1]
            epoch_loss = float(jnp.mean(jnp.stack(chunk_losses)))
            if verbose:
                print("epoch {} loss: {}".format(e + 1, epoch_loss))
            if callback is not None or metrics_cb is not None:
                self._sync_live_state(params, trainable, fixed,
                                      opt_state=opt_state, key=key,
                                      step=e + 1)
            if callback is not None:
                callback(e, epoch_loss)
            if metrics_cb is not None:
                metrics_cb(e, {
                    "loss": epoch_loss,
                    "grad_norm": float(jnp.mean(jnp.stack(chunk_gnorms))),
                    "epoch_time_s": _time.perf_counter() - t0})
        self._sync_live_state(params, trainable, fixed,
                              opt_state=opt_state, key=key,
                              step=max_iter)
        return np.asarray(last_loss) if last_loss is not None else None
