"""Laplace approximation around a MAP fit.

No reference counterpart (amzn/MXFusion has no Laplace/evidence
machinery; SURVEY §2.8). Given a trained MAP inference, this computes
the Gaussian posterior approximation

    q(θ) = N(θ̂, H⁻¹),   H = ∇²_θ [-log p(y, θ)] at θ = θ̂

over ALL latent variables jointly (cross-variable covariance blocks
included), plus the Laplace estimate of the log model evidence

    log p(y) ≈ log p(y, θ̂) + (d/2) log 2π - ½ log |H|

— the standard model-selection quantity. The Hessian comes from
``jax.hessian`` of the (pure) joint log-density interpreter, so it is
exact to machine precision; for linear-Gaussian models the whole
approximation is exact (the oracle used by the tests).

Intended scale: d (total latent dimension) up to a few thousand — the
d x d Hessian is materialized.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .inference_alg import (create_executor, RuntimeContext,
                            VariableEnv)
from ..common.exceptions import InferenceError
from ..components.variables.variable import VariableType


class LaplaceResult:
    """Joint Gaussian approximation over the latents.

    Attributes
    ----------
    uuids : list of latent variable uuids (block order)
    shapes : {uuid: event shape}
    mean : {uuid: MAP value}
    cov : (d, d) joint covariance, blocks in ``uuids`` order
          (row-major flattened per variable)
    log_evidence : float, Laplace estimate of log p(y)
    """

    def __init__(self, uuids, shapes, mean, cov, log_evidence):
        self.uuids = uuids
        self.shapes = shapes
        self.mean = mean
        self.cov = cov
        self.log_evidence = log_evidence

    def marginal(self, variable):
        """(mean, cov) of one latent's marginal block."""
        u = variable.uuid if hasattr(variable, "uuid") else variable
        i = self.uuids.index(u)
        start = sum(int(np.prod(self.shapes[v], dtype=np.int64))
                    for v in self.uuids[:i])
        d = int(np.prod(self.shapes[u], dtype=np.int64))
        return (self.mean[u],
                self.cov[start:start + d, start:start + d])


def laplace_approximation(map_inference, key=None, **data):
    """Laplace-approximate the posterior of a trained MAP inference.

    Parameters
    ----------
    map_inference : GradBasedInference over a MAP algorithm, already run
    data : the observed data (same kwargs as ``run``)
    """
    alg = map_inference._algorithm
    posterior = getattr(alg, "posterior", None)
    if posterior is None:
        raise InferenceError("laplace_approximation needs a MAP "
                             "inference (PointMass posterior).")
    params = map_inference.params
    if key is None:
        key = jax.random.PRNGKey(0)

    # latent -> PointMass location mapping (posterior shares uuids)
    latent_loc = {}
    for v in posterior.variables.values():
        if v.type == VariableType.RANDVAR and v.factor is not None \
                and type(v.factor).__name__ == "PointMass":
            latent_loc[v.uuid] = v.factor.location
    if not latent_loc:
        raise InferenceError("MAP posterior holds no PointMass latents.")

    executor = create_executor(alg, params)
    build_env = executor.build_env
    trainable = dict(params.trainable_params())
    fixed = dict(params.fixed_params())
    data_list = [np.asarray(data[n])
                 for n in alg.observed_variable_names]
    base_env = build_env(trainable, fixed, data_list)

    uuids = sorted(latent_loc)
    mean = {u: jnp.asarray(params[latent_loc[u]]) for u in uuids}
    shapes = {u: tuple(np.shape(mean[u])) for u in uuids}
    sizes = [int(np.prod(shapes[u], dtype=np.int64)) for u in uuids]
    d = sum(sizes)

    def neg_logp(flat):
        # VariableEnv, not dict: module algorithms resolve Variable
        # keys (plain-dict copies KeyError on module-containing models)
        env = VariableEnv(base_env)
        off = 0
        for u, sz in zip(uuids, sizes):
            # leading sample axis of size 1, as the runtime convention
            env[u] = flat[off:off + sz].reshape((1,) + shapes[u])
            off += sz
        return -alg.model.log_pdf(env, ctx=RuntimeContext(key))

    flat0 = jnp.concatenate([mean[u].reshape(-1) for u in uuids])
    # jax.hessian traces forward-mode; the fused gram op is a
    # custom_vjp and would reject the jvp trace inside its envelope —
    # force the XLA fallback for the whole pass (the one extra forward
    # eval below costs nothing at Laplace-scale models)
    from ..ops import pallas_fused_gram as _pfg
    with _pfg.disabled():
        nlp0 = float(neg_logp(flat0))
        H = jax.hessian(neg_logp)(flat0)
    H = 0.5 * (H + H.T)
    L = jnp.linalg.cholesky(H)
    if bool(jnp.any(jnp.isnan(L))):
        raise InferenceError(
            "Hessian at the MAP point is not positive definite — the "
            "fit has not converged to a mode (or the mode is "
            "degenerate); run MAP longer.")
    cov = jax.scipy.linalg.cho_solve(
        (L, True), jnp.eye(d, dtype=H.dtype))
    logdet_H = 2.0 * float(jnp.sum(jnp.log(jnp.diagonal(L))))
    log_evidence = (-nlp0 + 0.5 * d * float(np.log(2.0 * np.pi))
                    - 0.5 * logdet_H)
    return LaplaceResult(uuids, shapes, mean, np.asarray(cov),
                         log_evidence)
