"""Natural-gradient optimization of SVGP variational parameters.

No reference counterpart (amzn/MXFusion optimizes q(U)'s (mean,
cov-factor) by adam like everything else). Natural-gradient descent on
q(U)'s NATURAL parameters — the GPflow-proven recipe (Salimbeni et al.
2018) — takes the exact information-geometry step for the Gaussian
family, which for conjugate-likelihood SVGP regression can reach the
optimal q(U) in O(1) steps per hyperparameter setting instead of
hundreds of adam iterations.

The update (minimizing loss = -ELBO), for q(U) = Π_d N(m_d, S) with a
shared covariance over D output columns:

    θ1 = S⁻¹ m,          θ2 = -½ S⁻¹          (natural params)
    η1 = m,              η2 = D·S + Σ_d m_d m_dᵀ   (expectation params)
    dL/dη1 = g_m - (2/D) g_S m,   dL/dη2 = g_S / D
    θ ← θ - γ dL/dη      →  S' = (S⁻¹ + 2γ g_S/D)⁻¹,  m' = S' θ1'

where (g_m, g_S) are the loss gradients w.r.t. (m, S) with S treated
as a full symmetric matrix — obtained by autodiff through the
executor with ``qU_cov_W = chol(S)`` substituted (and the redundant
diagonal parameterization frozen at ~0). Hyperparameters (kernel,
noise, Z) take a simultaneous optax step on the same loss evaluation.

The whole (NGD + adam) update jits as one step and ``steps_per_call``
scans it, exactly like BatchInferenceLoop.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .grad_loop import GradLoop
from .batch_loop import make_optimizer
from .device_loop import DeviceMinibatchLoop
from ..common.exceptions import InferenceError
from ..ops.precision import einsum as p_einsum


def _check_not_whitened(module):
    if getattr(module, "whitened", False):
        raise InferenceError(
            "Natural-gradient loops require the non-whitened SVGP "
            "parameterization (whitened NGD is not implemented).")


def _qu_uuids(module):
    post = module._extra_graphs[0]
    return (post.qU_mean.uuid, post.qU_cov_W.uuid,
            post.qU_cov_diag.uuid, post.qU_cov_diag.transformation)


def _ngd_update(m, S, g_m, g_S, gamma, jitter, eye, D):
    """One natural-gradient step on q(U)=Π_d N(m_d, S); returns the
    updated (m, S) with a NaN-divergence guard keeping the old state."""
    g_S = 0.5 * (g_S + jnp.swapaxes(g_S, -1, -2))
    LS = jnp.linalg.cholesky(S)
    Sinv = jax.scipy.linalg.cho_solve((LS, True), eye)
    theta1_new = Sinv @ m - gamma * (g_m - (2.0 / D) * (g_S @ m))
    P = Sinv + (2.0 * gamma / D) * g_S
    P = 0.5 * (P + jnp.swapaxes(P, -1, -2)) + jitter * eye
    LP = jnp.linalg.cholesky(P)
    S_new = jax.scipy.linalg.cho_solve((LP, True), eye)
    S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))
    m_new = S_new @ theta1_new
    bad = jnp.any(jnp.isnan(S_new)) | jnp.any(jnp.isnan(m_new))
    return jnp.where(bad, m, m_new), jnp.where(bad, S, S_new)


class NaturalGradientLoop(GradLoop):
    """Full-batch loop: NGD on a SVGP module's q(U), optax on the rest.

    Parameters
    ----------
    module : SVGPRegression factor (``m.Y.factor``)
        Must be non-whitened (NGD is defined on the unwhitened q(U)).
    nat_learning_rate : float
        γ of the natural-gradient step (1.0 = exact coordinate-ascent
        step for conjugate likelihoods; GPflow default 0.1 is robust).
    """

    def __init__(self, module, nat_learning_rate=0.1, steps_per_call=1,
                 jitter=1e-10, metrics_callback=None):
        if getattr(module, "whitened", False):
            raise InferenceError(
                "NaturalGradientLoop requires the non-whitened SVGP "
                "parameterization (whitened NGD is not implemented).")
        self.module = module
        self.nat_learning_rate = nat_learning_rate
        self.steps_per_call = steps_per_call
        self.jitter = jitter
        self.metrics_callback = metrics_callback

    # ------------------------------------------------------------------
    def run(self, executor, params, data, optimizer="adam",
            learning_rate=1e-2, max_iter=1000, key=None, verbose=False,
            callback=None, data_sharding=None, resume_state=None):
        import time as _time
        if resume_state is not None:
            raise InferenceError(
                "Deterministic resume is not implemented for "
                "NaturalGradientLoop: its live state includes the "
                "(m, S) natural parameters, which checkpoints do not "
                "capture mid-run. Re-run from scratch or use a "
                "standard optax loop for resumable training.")
        if key is None:
            key = jax.random.PRNGKey(0)
        post = self.module._extra_graphs[0]
        u_mean, u_w, u_diag = (post.qU_mean.uuid, post.qU_cov_W.uuid,
                               post.qU_cov_diag.uuid)
        diag_trans = post.qU_cov_diag.transformation

        trainable = dict(params.trainable_params())
        fixed = dict(params.fixed_params())
        for u in (u_mean, u_w, u_diag):
            if u not in trainable:
                raise InferenceError(
                    "q(U) parameter {} is not trainable; "
                    "NaturalGradientLoop needs all three q(U) "
                    "parameters free.".format(u))
        m0 = jnp.asarray(trainable.pop(u_mean))
        W0 = jnp.asarray(trainable.pop(u_w))
        d0_uncon = jnp.asarray(trainable.pop(u_diag))
        # absorb the redundant diagonal into the full S, then freeze it
        # at ~0 (the executor applies softplus to this value)
        S0 = p_einsum("ik,jk->ij", W0, W0) + jnp.diag(
            diag_trans.transform(d0_uncon))
        frozen_diag = jnp.full_like(
            d0_uncon, diag_trans.inverse_transform(
                jnp.full((), self.jitter, dtype=d0_uncon.dtype)))
        eye = jnp.eye(S0.shape[-1], dtype=S0.dtype)
        D = float(m0.shape[-1])
        gamma = self.nat_learning_rate
        opt = make_optimizer(optimizer, learning_rate)
        opt_state = opt.init(trainable)
        data = [jnp.asarray(d) for d in data]
        metrics_cb = self.metrics_callback

        def loss_fn(hyper, m, S, key):
            S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
            W = jnp.linalg.cholesky(S)
            tr = {**hyper, u_mean: m, u_w: W, u_diag: frozen_diag}
            loss, loss_for_grad, _ = executor(tr, fixed, data, key)
            return loss_for_grad, loss

        def one_step(hyper, m, S, opt_state, key):
            (_, loss), (g_hyper, g_m, g_S) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True)(hyper, m, S,
                                                          key)
            # ---- natural-gradient step on q(U)
            m_new, S_new = _ngd_update(m, S, g_m, g_S, gamma,
                                       self.jitter, eye, D)
            # ---- simultaneous optax step on the hyperparameters
            updates, opt_state = opt.update(g_hyper, opt_state, hyper)
            hyper = optax.apply_updates(hyper, updates)
            gnorm = optax.global_norm((g_hyper, g_m, g_S)) \
                if metrics_cb is not None else jnp.zeros((), loss.dtype)
            return hyper, m_new, S_new, opt_state, loss, gnorm

        k = self.steps_per_call

        @jax.jit
        def multi_step(hyper, m, S, opt_state, key):
            def body(carry, subkey):
                hyper, m, S, st = carry
                hyper, m, S, st, loss, gnorm = one_step(hyper, m, S, st,
                                                        subkey)
                return (hyper, m, S, st), (loss, gnorm)
            keys = jax.random.split(key, k)
            (hyper, m, S, st), (losses, gnorms) = jax.lax.scan(
                body, (hyper, m, S, opt_state), keys)
            return hyper, m, S, st, losses, gnorms

        hyper, m, S = trainable, m0, S0
        loss = None
        n_calls = -(-max_iter // k)
        for c in range(n_calls):
            t0 = _time.perf_counter()
            key, sk = jax.random.split(key)
            hyper, m, S, opt_state, losses, gnorms = multi_step(
                hyper, m, S, opt_state, sk)
            loss = losses[-1]
            if verbose:
                print("Iteration {} loss: {}".format(
                    min((c + 1) * k, max_iter), float(loss)))
            if callback is not None:
                for i, l in enumerate(np.asarray(losses)):
                    callback(c * k + i, float(l))
            if metrics_cb is not None:
                metrics_cb(c, {"loss": float(jnp.mean(losses)),
                               "grad_norm": float(jnp.mean(gnorms)),
                               "step_time_s": _time.perf_counter() - t0})
        # write the optimized state back in the executor's native
        # parameterization
        S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
        # NGD state (m, S) is not checkpoint-resumable: clear any
        # TrainState a previous optax loop published so a snapshot
        # cannot pair NGD-trained params with stale adam moments
        params.train_state = None
        params.update_params(hyper)
        params.update_params({u_mean: m,
                              u_w: jnp.linalg.cholesky(S),
                              u_diag: frozen_diag})
        return np.asarray(loss) if loss is not None else None


class NaturalGradientMinibatchLoop(DeviceMinibatchLoop):
    """Device-resident minibatch SVI with natural-gradient q(U) updates.

    ``rv_scaling = N/B`` makes each minibatch loss an unbiased estimator
    of the full ELBO, so the per-batch natural-gradient step uses
    unbiased natural-gradient estimates — stochastic NGD (the GPflow
    recipe; use a smaller ``nat_learning_rate`` than full-batch, ~0.1).
    Hyperparameters take the regular optax step on the same evaluation.
    Everything else (HBM-resident dataset, one XLA program per epoch,
    optional ``shard_local_shuffle``) is inherited from
    :class:`DeviceMinibatchLoop`.
    """

    def __init__(self, module, batch_size=100, rv_scaling=None,
                 nat_learning_rate=0.1, jitter=1e-10,
                 metrics_callback=None, shard_local_shuffle=False):
        _check_not_whitened(module)
        super().__init__(batch_size=batch_size, rv_scaling=rv_scaling,
                         metrics_callback=metrics_callback,
                         shard_local_shuffle=shard_local_shuffle)
        self.module = module
        self.nat_learning_rate = nat_learning_rate
        self.jitter = jitter

    def _build_one_step(self, executor, opt, metrics_cb):
        u_mean, u_w, u_diag, diag_trans = _qu_uuids(self.module)
        gamma = self.nat_learning_rate
        jitter = self.jitter

        def one_step(trainable, fixed, opt_state, key, batch):
            m = trainable[u_mean]
            W = trainable[u_w]
            d_un = trainable[u_diag]
            S = p_einsum("ik,jk->ij", W, W) + jnp.diag(
                diag_trans.transform(d_un))
            eye = jnp.eye(S.shape[-1], dtype=S.dtype)
            frozen = jnp.full_like(d_un, diag_trans.inverse_transform(
                jnp.full((), jitter, dtype=d_un.dtype)))
            hyper = {k: v for k, v in trainable.items()
                     if k not in (u_mean, u_w, u_diag)}

            def loss_fn(hyper, m, S):
                Ssym = 0.5 * (S + jnp.swapaxes(S, -1, -2))
                Wc = jnp.linalg.cholesky(Ssym)
                tr = {**hyper, u_mean: m, u_w: Wc, u_diag: frozen}
                loss, loss_for_grad, aux = executor(tr, fixed, batch,
                                                    key)
                return loss_for_grad, (loss, aux)

            (_, (loss, aux)), (g_h, g_m, g_S) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True)(hyper, m, S)
            D = float(m.shape[-1])
            m_new, S_new = _ngd_update(m, S, g_m, g_S, gamma, jitter,
                                       eye, D)
            # optax over the FULL trainable structure (q(U) grads
            # zeroed) so opt_state matches the base loop's init; the
            # q(U) entries are then overwritten by the NGD result
            g_full = {**g_h, u_mean: jnp.zeros_like(m),
                      u_w: jnp.zeros_like(W),
                      u_diag: jnp.zeros_like(d_un)}
            gnorm = optax.global_norm((g_h, g_m, g_S)) \
                if metrics_cb is not None else jnp.zeros((), loss.dtype)
            updates, opt_state = opt.update(g_full, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            trainable = {**trainable, u_mean: m_new,
                         u_w: jnp.linalg.cholesky(
                             S_new + jitter * eye),
                         u_diag: frozen}
            return trainable, opt_state, loss, aux, gnorm

        return one_step
