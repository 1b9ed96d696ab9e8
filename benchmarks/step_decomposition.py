"""Marginal-cost decomposition of the flagship SVGP step (r5).

Builds a ladder of truncated bounds — each stage adds one block of the
real computation — and measures each as a full value_and_grad + adam
step (parameter-updating carry, so XLA cannot hoist anything:
benchmarks/NOTES.md optimizer-fusion entry). The marginal cost of
stage k is the honest price of its block including its backward.

Usage: python benchmarks/step_decomposition.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

B, M, D = 65536, 512, 32
LOG2PI = float(np.log(2 * np.pi))


def main():
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    import optax
    from roofline import _timed_scan
    from mxfusion_tpu.ops.precision import (einsum as p_einsum,
                                            data_einsum,
                                            guarded_data_einsum,
                                            guarded_forward_matmul)
    from mxfusion_tpu.ops.linalg import triangular_inverse

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((B, D)).astype(np.float32) * 4)
    Y = jnp.asarray((np.sin(rng.random((B, 1))) +
                     rng.standard_normal((B, 1)) * 0.1
                     ).astype(np.float32))

    params0 = {
        "Z": jnp.asarray(rng.random((M, D)).astype(np.float32) * 4),
        "log_ls": jnp.zeros((D,), jnp.float32),
        "log_var": jnp.zeros((), jnp.float32),
        "log_noise": jnp.asarray(-2.0, jnp.float32),
        "mu": jnp.asarray(rng.standard_normal((M, 1)).astype(np.float32)
                          * 0.1),
        "W": jnp.asarray(np.eye(M, dtype=np.float32) * 0.5),
        "log_d": jnp.full((M,), -2.0, jnp.float32),
    }

    def rbf(A_, B_, ls, var):
        As = A_ / ls
        Bs = B_ / ls
        d2 = (jnp.sum(As * As, -1)[:, None]
              + jnp.sum(Bs * Bs, -1)[None, :]
              - 2.0 * p_einsum("md,nd->mn", As, Bs))
        return var * jnp.exp(-0.5 * d2)

    def stage_loss(p, stage):
        ls = jnp.exp(p["log_ls"])
        var = jnp.exp(p["log_var"])
        noise = jnp.exp(p["log_noise"])
        Z = p["Z"]
        Kuu = rbf(Z, Z, ls, var) + 1e-5 * jnp.eye(M)
        Kuf = rbf(Z, X, ls, var)
        out = jnp.sum(Kuu) * 1e-9 + jnp.sum(Kuf) * 1e-9
        if stage == 0:
            return out
        S = p_einsum("ik,jk->ij", p["W"], p["W"]) + \
            jnp.diag(jnp.exp(p["log_d"]))
        LL = jnp.linalg.cholesky(jnp.stack([Kuu, S]))
        L, Ls = LL[0], LL[1]
        out = out + jnp.sum(jnp.log(jnp.diagonal(L))) * 1e-9 \
            + jnp.sum(jnp.log(jnp.diagonal(Ls))) * 1e-9
        if stage == 1:
            return out
        Linv = triangular_inverse(L, lower=True)
        LinvLs = p_einsum("ij,jk->ik", Linv, Ls)
        Linvmu = p_einsum("ij,jk->ik", Linv, p["mu"])
        out = out + jnp.sum(LinvLs) * 1e-9 + jnp.sum(Linvmu) * 1e-9
        if stage == 2:
            return out
        G = guarded_forward_matmul(Linv, Kuf)          # (M, B)
        out = out + jnp.sum(G) * 1e-9
        if stage == 3:
            return out
        qff = jnp.sum(jnp.square(G), axis=0)           # (B,)
        out = out + jnp.sum((var - qff) / noise) * 1e-9
        if stage == 4:
            return out
        V = data_einsum("mn,mk->nk", G, LinvLs)        # (B, M)
        out = out + jnp.sum(jnp.square(V)) / noise * 1e-9
        if stage == 5:
            return out
        w_vec = jsl.solve_triangular(L, Linvmu, lower=True, trans="T")
        mfit = guarded_data_einsum("mn,md->nd", Kuf, w_vec)
        R = Y - mfit
        out = out + jnp.sum(jnp.square(R) / noise + LOG2PI +
                            jnp.log(noise)) * 1e-9
        if stage == 6:
            return out
        # full residual bound incl. KL
        KL = (M / 2.0 + jnp.sum(jnp.log(jnp.diagonal(LinvLs)))
              - jnp.sum(jnp.square(LinvLs)) / 2.0
              - jnp.sum(jnp.square(Linvmu)) / 2.0)
        logL = -jnp.sum(jnp.square(R) / noise + LOG2PI +
                        jnp.log(noise)) / 2.0
        logL = logL - jnp.sum((var - qff) / noise) / 2.0
        logL = logL - jnp.sum(jnp.square(V)) / noise / 2.0
        return -(logL + KL)

    opt = optax.adam(1e-9)  # tiny lr: params move, trajectory stays sane

    names = ["grams", "+chol", "+Linv/Ls/mu", "+G=LinvKuf", "+qff",
             "+V+quad", "+resid fit", "full+KL"]
    prev = 0.0
    for stage in range(8):
        def step(consts, carry, _stage=stage):
            Xc, Yc = consts
            pr, st = carry

            def lf(q):
                return stage_loss(q, _stage)
            loss, g = jax.value_and_grad(lf)(pr)
            up, st2 = opt.update(g, st, pr)
            pr = optax.apply_updates(pr, up)
            # fold the loss back in so the value chain covers it
            pr = dict(pr)
            pr["log_noise"] = pr["log_noise"] + loss * 1e-20
            return pr, st2

        st0 = opt.init(params0)
        sec = _timed_scan(step, (X, Y), (params0, st0), 12, n_calls=2,
                          fetch=lambda c: c[0]["log_noise"])
        print("stage {} {:12s}: {:7.3f} ms  (marginal {:+7.3f})".format(
            stage, names[stage], sec * 1e3, (sec - prev) * 1e3),
            flush=True)
        prev = sec


if __name__ == "__main__":
    main()
