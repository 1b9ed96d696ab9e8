"""North-star workload: SVGP regression on 10^6 points (BASELINE.json).

Trains minibatch SVI on one million synthetic points with the scanned
multi-step loop, streaming native-gathered batches to the device, and
reports the ELBO trajectory plus sustained optimizer steps/sec.

Usage: python benchmarks/svgp_1m.py  [epochs]
"""
import sys
import time

import numpy as np


def main(n_total=1_000_000, batch=4096, m_inducing=256, d=8, steps=2000):
    import jax
    import jax.numpy as jnp
    import optax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    from mxfusion_tpu.inference import MAP, GradBasedInference, \
        create_executor
    from mxfusion_tpu.native import gather_rows, shuffled_indices

    rng = np.random.default_rng(0)
    X = rng.random((n_total, d)).astype(np.float32) * 4
    f = np.sin(X[:, :1] * 2.0) + 0.3 * np.cos(X[:, 1:2] * 3.0)
    Y = (f + rng.standard_normal((n_total, 1)).astype(np.float32) * 0.1
         ).astype(np.float32)

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, d))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.5)
    Z0 = rng.random((m_inducing, d)) * 4
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=d, variance=1.0, lengthscale=1.0),
        noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(m_inducing, d),
                                 initial_value=Z0))
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=X[:batch], Y=Y[:batch])
    ex = create_executor(alg, infr.params,
                         rv_scaling={m.Y.uuid: n_total / batch})
    opt = optax.adam(3e-3)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())
    st = opt.init(tr)

    spc = 20  # steps per program; each scanned step consumes one batch

    def one_step(carry, batch_pair):
        tr, st, key = carry
        Xb, Yb = batch_pair
        key, sk = jax.random.split(key)

        def lf(t):
            loss, lg, _ = ex(t, fx, [Xb, Yb], sk)
            return lg, loss
        (_, loss), g = jax.value_and_grad(lf, has_aux=True)(tr)
        up, st2 = opt.update(g, st, tr)
        return (optax.apply_updates(tr, up), st2, key), loss

    @jax.jit
    def multi_step(tr, st, key, Xs, Ys):
        (tr, st, key), losses = jax.lax.scan(one_step, (tr, st, key),
                                             (Xs, Ys))
        return tr, st, key, jnp.mean(losses)

    key = jax.random.PRNGKey(0)
    perm = shuffled_indices(n_total, seed=0)
    cursor = 0

    def next_chunk():
        nonlocal cursor, perm
        idxs = []
        for _ in range(spc):
            if cursor + batch > n_total:
                perm = shuffled_indices(n_total, seed=cursor)
                cursor = 0
            idxs.append(perm[cursor:cursor + batch])
            cursor += batch
        idx = np.stack(idxs)  # (spc, batch)
        Xs = gather_rows(X, idx.ravel()).reshape(spc, batch, d)
        Ys = gather_rows(Y, idx.ravel()).reshape(spc, batch, 1)
        return jnp.asarray(Xs), jnp.asarray(Ys)

    # compile + warmup
    Xs, Ys = next_chunk()
    tr, st, key, mloss = multi_step(tr, st, key, Xs, Ys)
    first_loss = float(mloss)

    n_calls = steps // spc
    t0 = time.perf_counter()
    trajectory = []
    for c in range(n_calls):
        Xs, Ys = next_chunk()
        tr, st, key, mloss = multi_step(tr, st, key, Xs, Ys)
        if (c + 1) % max(1, n_calls // 10) == 0:
            trajectory.append(float(mloss))  # sync point
    elapsed = time.perf_counter() - t0
    print("initial scaled -ELBO: {:.4g}".format(first_loss))
    print("trajectory (every {} steps): {}".format(
        spc * max(1, n_calls // 10),
        ["{:.4g}".format(v) for v in trajectory]))
    print("{} steps over 10^6 points in {:.1f}s -> {:.1f} steps/s "
          "({:.1f} epochs)".format(
              n_calls * spc, elapsed, n_calls * spc / elapsed,
              n_calls * spc * batch / n_total))
    assert trajectory[-1] < first_loss, "ELBO failed to improve"


if __name__ == "__main__":
    main(steps=int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
