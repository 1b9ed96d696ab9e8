"""Minibatch gradient loop.

Reference: /root/reference/mxfusion/inference/minibatch_loop.py:21-95.
Shuffled fixed-size batches with rollover (every batch the same shape,
so exactly ONE XLA compilation); the ``rv_scaling = N/batch_size``
correction is folded into ``log_pdf_scaling`` at executor-build time.
Batching happens host-side on numpy; device transfer overlaps with the
async dispatch of the previous step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .grad_loop import GradLoop
from .batch_loop import make_optimizer


class MinibatchInferenceLoop(GradLoop):
    def __init__(self, batch_size=100, rv_scaling=None):
        super().__init__()
        self.batch_size = batch_size
        self.rv_scaling = {v.uuid: s for v, s in rv_scaling.items()} \
            if rv_scaling is not None else None

    def run(self, executor, params, data, optimizer="adam",
            learning_rate=1e-3, max_iter=1000, key=None, verbose=False,
            callback=None, data_sharding=None):
        """``max_iter`` counts epochs (as in the reference)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        opt = make_optimizer(optimizer, learning_rate)
        trainable = dict(params.trainable_params())
        fixed = dict(params.fixed_params())
        opt_state = opt.init(trainable)
        data = [np.asarray(d) for d in data]
        N = data[0].shape[0]
        B = self.batch_size
        n_batches = max(1, -(-N // B))

        @jax.jit
        def step(trainable, fixed, opt_state, key, batch):
            def loss_fn(tr):
                loss, loss_for_grad, aux = executor(tr, fixed, batch, key)
                return loss_for_grad, (loss, aux)
            (loss_for_grad, (loss, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            updates, opt_state = opt.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, aux

        from ..native import gather_rows, shuffled_indices
        last_loss = None
        for e in range(max_iter):
            perm = shuffled_indices(N, seed=e)
            epoch_loss = 0.0
            for b in range(n_batches):
                start = b * B
                idx = perm[start:start + B]
                if idx.shape[0] < B:  # rollover: pad from the front
                    idx = np.concatenate([idx, perm[:B - idx.shape[0]]])
                # native threaded row gather (numpy fallback inside)
                batch = [jnp.asarray(gather_rows(d, idx)) for d in data]
                if data_sharding is not None:
                    batch = [jax.device_put(a, s)
                             for a, s in zip(batch, data_sharding)]
                key, subkey = jax.random.split(key)
                trainable, opt_state, loss, aux = step(
                    trainable, fixed, opt_state, subkey, batch)
                if aux:
                    fixed = {**fixed, **aux}
                epoch_loss += float(loss)
                last_loss = loss
            if verbose:
                print("epoch {} loss: {}".format(e + 1,
                                                 epoch_loss / n_batches))
            if callback is not None:
                callback(e, epoch_loss / n_batches)
        params.update_params(trainable)
        params.update_params(fixed)
        return np.asarray(last_loss) if last_loss is not None else None
