"""Full-batch gradient loop with a single jitted optax step.

Reference: /root/reference/mxfusion/inference/batch_loop.py:19-61 (Gluon
Trainer + autograd.record per iteration). TPU-native: the whole
(objective + grad + optimizer update + SET_ writeback) is one
``jax.jit``-compiled function; the Python loop only dispatches steps, so
per-iteration host overhead is a single async dispatch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .grad_loop import GradLoop


def make_optimizer(optimizer, learning_rate):
    opts = {
        "adam": optax.adam,
        "sgd": optax.sgd,
        "adagrad": optax.adagrad,
        "rmsprop": optax.rmsprop,
        "adamw": optax.adamw,
    }
    if callable(optimizer):
        return optimizer(learning_rate)
    if optimizer not in opts:
        raise ValueError("Unknown optimizer {}.".format(optimizer))
    return opts[optimizer](learning_rate)


class BatchInferenceLoop(GradLoop):
    """Optimize the objective on the full data every iteration."""

    def run(self, executor, params, data, optimizer="adam",
            learning_rate=1e-3, max_iter=1000, key=None, verbose=False,
            callback=None, data_sharding=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        opt = make_optimizer(optimizer, learning_rate)
        trainable = dict(params.trainable_params())
        fixed = dict(params.fixed_params())
        opt_state = opt.init(trainable)
        data = [jnp.asarray(d) for d in data]
        if data_sharding is not None:
            data = [jax.device_put(d, s)
                    for d, s in zip(data, data_sharding)]

        @jax.jit
        def step(trainable, fixed, opt_state, key, data):
            def loss_fn(tr):
                loss, loss_for_grad, aux = executor(tr, fixed, data, key)
                return loss_for_grad, (loss, aux)
            (loss_for_grad, (loss, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            updates, opt_state = opt.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, aux

        loss = None
        aux = {}
        print_every = max(1, max_iter // 10)
        for i in range(max_iter):
            key, subkey = jax.random.split(key)
            trainable, opt_state, loss, aux = step(
                trainable, fixed, opt_state, subkey, data)
            if aux:
                fixed = {**fixed, **aux}
            if verbose and ((i + 1) % print_every == 0 or i == 0):
                print("Iteration {} loss: {}".format(i + 1,
                                                     float(loss)))
            if callback is not None:
                callback(i, loss)
        params.update_params(trainable)
        params.update_params(fixed)
        return np.asarray(loss) if loss is not None else None
