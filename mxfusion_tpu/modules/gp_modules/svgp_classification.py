"""Stochastic variational GP binary classification.

Beyond the reference's module set (amzn/MXFusion ships GP *regression*
modules only — /root/reference/mxfusion/modules/gp_modules/__init__.py);
this pairs the Hensman-style uncollapsed SVGP machinery
(svgp_regression.py here) with a Bernoulli-logistic likelihood whose
expected log-likelihood is computed by fixed-order Gauss–Hermite
quadrature (Hensman, Matthews & Ghahramani 2015). Everything stays one
jitted program: the quadrature grid is a static (Q,) constant, the
N-point expectation is a single (s, N, Q) broadcast — MXU/VPU friendly,
minibatchable, and shardable over the data axis exactly like the
regression ELBO.

Unlike the regression modules, ``jitter`` here is RELATIVE (scaled by
the mean kernel diagonal): classification training grows the kernel
variance without a noise parameter to balance it, and float32 Cholesky
needs the stabilizer to track Kuu's scale (measured: whitened f32
training NaN'd at step ~314 with absolute 1e-5 once the variance
reached ~5; stable with the relative form).
"""
import numpy as np
import jax.nn
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..module import Module
from ...models.model import Model
from ...models.posterior import Posterior
from ...components.variables.variable import Variable
from ...components.variables.var_trans import PositiveTransformation
from ...components.variables.runtime_variable import arrays_as_samples
from ...components.distributions.bernoulli import Bernoulli
from ...components.distributions.gp.gp import GaussianProcess
from ...components.distributions.gp.cond_gp import \
    ConditionalGaussianProcess
from ...components.functions.operators import sigmoid, probit
from ...inference.variational import VariationalInference
from ...inference.inference_alg import SamplingAlgorithm
from ...inference.forward_sampling import ForwardSamplingAlgorithm
from ...ops.linalg import (make_diagonal, wide_triangular_solve,
                           triangular_inverse)
from ...ops.precision import einsum as p_einsum


# latent-variance floor for the quadrature sqrt (see NaN-gradient note
# in SVGPClassificationLogPdf.compute); well below any statistically
# meaningful q(f) variance at either precision
_VAR_FLOOR = 1e-14


def _gauss_hermite(num_points, dtype):
    """Static (nodes, weights) for E_{f~N(m,v)}[g(f)] ≈ Σ w_i g(m+√(2v)t_i)
    with the 1/√π folded into the weights."""
    t, w = np.polynomial.hermite.hermgauss(num_points)
    return (jnp.asarray(t, dtype=dtype),
            jnp.asarray(w / np.sqrt(np.pi), dtype=dtype))


def _layer_q_moments(X, Z, mu, S_W, S_diag, kern, kern_params, jitter,
                     whitened, relative_jitter=True, mean_f=None):
    """Array-level core of :func:`_q_f_moments`: diagonal moments of
    one SVGP layer's q(F) at inputs ``X``, plus the whitened mean/cov
    factors needed by the KL term. All operands carry the leading
    sample axis already (callers run ``arrays_as_samples`` first) —
    which is what lets the deep-GP bound (deep_gp.py) call this
    per-layer on SAMPLED inputs rather than env lookups.

    Returns (mu_f (s,N,D), var_f (s,N), Linvmu, LinvLs); var_f is
    column-shared (one q(U) covariance for all output columns).
    ``mean_f`` is an additive output-mean array, already broadcast.
    """
    M = Z.shape[-2]
    eye_m = jnp.expand_dims(jnp.eye(M, dtype=Z.dtype), axis=0)
    Kuu = kern.K(Z, **kern_params)
    if jitter > 0.0:
        if relative_jitter:
            # RELATIVE jitter (× mean kernel diagonal): classification
            # training grows the kernel variance freely, and an
            # absolute floor is silently outscaled — float32 Cholesky
            # roundoff is ~eps·‖Kuu‖, so the safety margin must track
            # Kuu's scale
            scale = jnp.mean(jnp.diagonal(Kuu, axis1=-2, axis2=-1),
                             axis=-1)[..., None, None]
            Kuu = Kuu + eye_m * (jitter * scale)
        else:
            Kuu = Kuu + eye_m * jitter
    Kuf = kern.K(Z, X, **kern_params)
    Kff_diag = kern.Kdiag(X, **kern_params)

    S = p_einsum("...ik,...jk->...ij", S_W, S_W) + make_diagonal(S_diag)
    # one batched Cholesky for the two independent M×M factors (same
    # latency fusion as the regression bound)
    LL = jnp.linalg.cholesky(jnp.stack([Kuu, S], axis=-3))
    L = LL[..., 0, :, :]
    Ls = LL[..., 1, :, :]
    wide = Kuf.shape[-1] >= 4 * M
    Linv = triangular_inverse(L, lower=True) \
        if (wide and not whitened) else None
    if whitened:
        LinvLs = Ls
        Linvmu = mu
    elif Linv is not None:
        LinvLs = p_einsum("...ij,...jk->...ik", Linv, Ls)
        Linvmu = p_einsum("...ij,...jk->...ik", Linv, mu)
    else:
        LinvLs = jsl.solve_triangular(L, Ls, lower=True)
        Linvmu = jsl.solve_triangular(L, mu, lower=True)
    if Linv is not None:
        # forward floored at HIGH: LinvKuf feeds the var_f cancellation
        # (Kff − Σ(LinvKuf)²) below, where 1-pass rounding is amplified
        # exactly as in the regression trace pair (ops.precision notes)
        from ...ops.precision import guarded_forward_matmul
        LinvKuf = guarded_forward_matmul(Linv, Kuf)
    else:
        # the deep-GP bound propagates S data samples against
        # sample-size-1 layer parameters (the M×M Cholesky factorizes
        # once); lax triangular_solve requires EQUAL batch dims, so
        # broadcast the factor to the data panel's sample count here
        # (matmul-based paths broadcast on their own)
        L_b = L if L.shape[0] == Kuf.shape[0] else \
            jnp.broadcast_to(L, Kuf.shape[:-2] + L.shape[-2:])
        LinvKuf = wide_triangular_solve(L_b, Kuf, lower=True)

    mu_f = p_einsum("...mn,...md->...nd", LinvKuf, Linvmu)
    if mean_f is not None:
        mu_f = mu_f + mean_f
    LsTLinvKuf = p_einsum("...mk,...mn->...kn", LinvLs, LinvKuf)
    var_f = Kff_diag \
        - jnp.sum(jnp.square(LinvKuf), axis=-2) \
        + jnp.sum(jnp.square(LsTLinvKuf), axis=-2)
    return mu_f, var_f, Linvmu, LinvLs


def _q_f_moments(env, model, posterior, jitter, whitened,
                 keep_columns=False):
    """Diagonal moments of q(F) at the model's X, plus the whitened
    mean/cov factors needed by the KL term.

    Returns (mu_f (s,N), var_f (s,N), Linvmu, LinvLs) — the same
    algebra as SVGPRegressionLogPdf (svgp_regression.py:100-115), with
    the N-axis kept diagonal throughout. ``keep_columns=True`` keeps
    mu_f as (s, N, D) for multi-column latents (multi-class); var_f is
    column-shared either way (one q(U) covariance for all columns)."""
    X = env[model.X]
    Z = env[model.inducing_inputs]
    mu = env[posterior.qU_mean]
    S_W = env[posterior.qU_cov_W]
    S_diag = env[posterior.qU_cov_diag]
    kern = model.kernel
    kern_params = kern.fetch_parameters(env)
    X, Z, mu, S_W, S_diag, kern_params = arrays_as_samples(
        [X, Z, mu, S_W, S_diag, kern_params])

    mean_f = None
    if model.F.factor.has_mean:
        (mean_f,) = arrays_as_samples([env[model.mean]])
    mu_f, var_f, Linvmu, LinvLs = _layer_q_moments(
        X, Z, mu, S_W, S_diag, kern, kern_params, jitter, whitened,
        relative_jitter=True, mean_f=mean_f)
    if not keep_columns:
        mu_f = mu_f[..., 0]
    return mu_f, var_f, Linvmu, LinvLs


def _neg_kl(Linvmu, LinvLs, num_columns):
    """Negative KL(q(U) || p(U)) for ``num_columns`` latent GP columns
    sharing one q(U) covariance: same value as the regression bound's
    KL block (svgp_regression.py:118-129) — the logdet terms collapse
    because diag(L⁻¹Ls) = diag(Ls)/diag(L), so Σlog diag(L⁻¹Ls) =
    Σlog diag(Ls) − Σlog diag(L); in whitened coordinates LinvLs IS Ls
    and the L term is exactly absent. Shared by the binary and
    multi-class classification ELBOs (cancellation-sensitive algebra —
    keep a single copy)."""
    M = Linvmu.shape[-2]
    sumlogdiag = jnp.sum(jnp.log(
        jnp.diagonal(LinvLs, axis1=-2, axis2=-1)), axis=-1)
    return (M / 2.0 + sumlogdiag) * num_columns \
        - jnp.sum(jnp.square(LinvLs), axis=(-2, -1)) / 2.0 * num_columns \
        - jnp.sum(jnp.square(Linvmu), axis=(-2, -1)) / 2.0


def _bernoulli_expected_log_lik(mu, var_f, sign, link,
                                num_quadrature_points):
    """Gauss–Hermite E_{f~N(mu, var_f)}[log Bern(y | link(f))] per
    point: ``sign`` is 2y−1 broadcastable against ``mu`` (s, N).
    Single copy of the stability-sensitive quadrature (the _VAR_FLOOR
    clamp, sqrt(2v) node placement, stable log-link identities) shared
    by the single-layer and deep classification ELBOs."""
    t, w = _gauss_hermite(num_quadrature_points, mu.dtype)
    # positive floor, not 0: sqrt'(0) is infinite, and clamping to
    # exactly 0 yields NaN (0*inf) gradients the moment cancellation
    # drives var_f slightly negative (whitened training gets there)
    var_safe = jnp.maximum(var_f, _VAR_FLOOR)
    f = mu[..., None] + jnp.sqrt(2.0 * var_safe)[..., None] * t
    if link == "probit":
        from jax.scipy.stats import norm as _norm
        log_lik = _norm.logcdf(sign[..., None] * f)
    else:
        log_lik = jax.nn.log_sigmoid(sign[..., None] * f)
    return jnp.sum(log_lik * w, axis=-1)                     # (s, N)


def _class_probability(mu, var_f, link, num_quadrature_points):
    """Predictive p(y=1) = E_{f~N(mu, var_f)}[link(f)] per point:
    quadrature for the logit link, CLOSED FORM Φ(μ/√(1+σ²)) for the
    probit link. Shared by the single-layer and deep predictives."""
    var_safe = jnp.maximum(var_f, _VAR_FLOOR)
    if link == "probit":
        from jax.scipy.special import ndtr
        return ndtr(mu / jnp.sqrt(1.0 + var_safe))           # (s, N)
    t, w = _gauss_hermite(num_quadrature_points, mu.dtype)
    f = mu[..., None] + jnp.sqrt(2.0 * var_safe)[..., None] * t
    return jnp.sum(jax.nn.sigmoid(f) * w, axis=-1)           # (s, N)


class SVGPClassificationLogPdf(VariationalInference):
    """Quadrature ELBO: Σ_n E_{q(f_n)}[log Bern(y_n | link(f_n))] − KL.

    Labels are {0, 1}. ``link="logit"`` uses the stable
    ``log_sigmoid((2y−1) f)`` identity; ``link="probit"`` uses
    ``log Φ((2y−1) f)`` (norm.logcdf)."""

    def __init__(self, model, posterior, observed, jitter=0.0,
                 whitened=False, num_quadrature_points=20,
                 link="logit"):
        super().__init__(num_samples=1, model=model, posterior=posterior,
                         observed=observed)
        self.log_pdf_scaling = 1.0
        self.jitter = jitter
        self.whitened = whitened
        self.num_quadrature_points = num_quadrature_points
        self.link = link

    def compute(self, env, ctx):
        Y = env[self.model.Y]
        mu_f, var_f, Linvmu, LinvLs = _q_f_moments(
            env, self.model, self.posterior, self.jitter, self.whitened)
        if Y.shape[0] != mu_f.shape[0]:
            (Y,) = arrays_as_samples([Y])
            Y = jnp.broadcast_to(Y, (mu_f.shape[0],) + Y.shape[1:])
        D = Linvmu.shape[-1]

        sign = 2.0 * Y[..., 0] - 1.0                        # (s, N)
        quad = _bernoulli_expected_log_lik(
            mu_f, var_f, sign, self.link, self.num_quadrature_points)
        logL = jnp.sum(quad, axis=-1)

        return self.log_pdf_scaling * logL + _neg_kl(Linvmu, LinvLs, D)


class SVGPClassificationProbPrediction(SamplingAlgorithm):
    """Predictive class-1 probability p(y*=1) = E_{q(f*)}[link(f*)]:
    quadrature for the logit link, CLOSED FORM Φ(μ/√(1+σ²)) for the
    probit link. Returns {Y: (p, p(1−p))}."""

    serving_data_axes = ((1,), (1,))  # (s, N, 1) probability moments

    def __init__(self, model, posterior, observed, jitter=0.0,
                 whitened=False, num_quadrature_points=20,
                 link="logit"):
        super().__init__(model=model, observed=observed,
                         extra_graphs=[posterior])
        self.jitter = jitter
        self.whitened = whitened
        self.num_quadrature_points = num_quadrature_points
        self.link = link

    def compute(self, env, ctx):
        posterior = self._extra_graphs[0]
        mu_f, var_f, _, _ = _q_f_moments(
            env, self.model, posterior, self.jitter, self.whitened)
        p = _class_probability(mu_f, var_f, self.link,
                               self.num_quadrature_points)[..., None]
        outcomes = {self.model.Y.uuid: (p, p * (1.0 - p))}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class SVGPClassification(Module):
    """SVGP binary classification module: ``log_pdf`` is the quadrature
    ELBO, ``predict`` the quadrature class probability, sampling walks
    the generative graph U → F → σ(F) → Bernoulli."""

    def __init__(self, X, kernel, inducing_inputs=None, num_inducing=10,
                 mean=None, rand_gen=None, dtype=None, jitter=1e-5,
                 whitened=False, num_quadrature_points=20, link="logit"):
        if link not in ("logit", "probit"):
            raise ValueError("link must be 'logit' or 'probit', got "
                             "{!r}".format(link))
        self.jitter = jitter
        self.whitened = whitened
        self.num_quadrature_points = num_quadrature_points
        self.link = link
        if not isinstance(X, Variable):
            X = Variable(value=X)
        if inducing_inputs is None:
            inducing_inputs = Variable(
                shape=(num_inducing, kernel.input_dim),
                initial_value=np.random.randn(num_inducing,
                                              kernel.input_dim))
        inputs = [("X", X), ("inducing_inputs", inducing_inputs)]
        input_names = [k for k, _ in inputs]
        if mean is not None:
            inputs.append(("mean", mean))
            input_names.append("mean")
            self._has_mean = True
        else:
            self._has_mean = False
        super().__init__(inputs=inputs, outputs=None,
                         input_names=input_names,
                         output_names=["random_variable"],
                         rand_gen=rand_gen, dtype=dtype)
        self.kernel = kernel

    def _generate_outputs(self, output_shapes=None):
        if output_shapes["random_variable"] is None:
            Y_shape = self.X.shape[:-1] + (1,)
        else:
            Y_shape = output_shapes["random_variable"]
        if Y_shape[-1] != 1:
            raise ValueError(
                "SVGPClassification is binary: the output event dim "
                "must be 1, got {}. Use one module per one-vs-rest "
                "class for multi-class.".format(Y_shape[-1]))
        self.set_outputs([Variable(shape=Y_shape)])

    def _build_module_graphs(self):
        Y = self.random_variable
        graph = Model(name="svgp_classification")
        graph.X = self.X.replicate_self()
        graph.inducing_inputs = self.inducing_inputs.replicate_self()
        M = self.inducing_inputs.shape[0]
        graph.U = GaussianProcess.define_variable(
            X=graph.inducing_inputs, kernel=self.kernel,
            shape=(graph.inducing_inputs.shape[0], Y.shape[-1]),
            rand_gen=self._rand_gen, dtype=self.dtype, jitter=self.jitter)
        mean = None
        if self._has_mean:
            graph.mean = self.mean.replicate_self()
            mean = graph.mean
        graph.F = ConditionalGaussianProcess.define_variable(
            X=graph.X, X_cond=graph.inducing_inputs, Y_cond=graph.U,
            kernel=self.kernel, shape=Y.shape, mean=mean,
            rand_gen=self._rand_gen, dtype=self.dtype, jitter=self.jitter)
        graph.p = sigmoid(graph.F) if self.link == "logit" \
            else probit(graph.F)
        graph.Y = Y.replicate_self()
        graph.Y.set_prior(Bernoulli(
            prob_true=graph.p, rand_gen=self._rand_gen, dtype=self.dtype))
        graph.kernel = graph.U.factor.kernel
        post = Posterior(graph)
        post.qU_cov_diag = Variable(
            shape=(M,), transformation=PositiveTransformation(),
            initial_value=np.ones(M) * 1e-6)
        post.qU_cov_W = Variable(shape=(M, M), initial_value=np.eye(M))
        post.qU_mean = Variable(shape=(M, Y.shape[-1]))
        return graph, [post]

    def _attach_default_inference_algorithms(self):
        observed = [v for _, v in self.inputs] + \
            [v for _, v in self.outputs]
        self.attach_log_pdf_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=SVGPClassificationLogPdf(
                self._module_graph, self._extra_graphs[0], observed,
                jitter=self.jitter, whitened=self.whitened,
                num_quadrature_points=self.num_quadrature_points,
                link=self.link),
            alg_name="svgp_class_log_pdf")
        observed = [v for _, v in self.inputs]
        self.attach_draw_samples_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=ForwardSamplingAlgorithm(self._module_graph,
                                               observed),
            alg_name="svgp_class_sampling")
        self.attach_prediction_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=SVGPClassificationProbPrediction(
                self._module_graph, self._extra_graphs[0], observed,
                jitter=self.jitter, whitened=self.whitened,
                num_quadrature_points=self.num_quadrature_points,
                link=self.link),
            alg_name="svgp_class_predict")

    @staticmethod
    def define_variable(X, kernel, shape=None, inducing_inputs=None,
                        num_inducing=10, mean=None, rand_gen=None,
                        dtype=None, jitter=1e-5, whitened=False,
                        num_quadrature_points=20, link="logit"):
        gp = SVGPClassification(
            X=X, kernel=kernel, inducing_inputs=inducing_inputs,
            num_inducing=num_inducing, mean=mean, rand_gen=rand_gen,
            dtype=dtype, jitter=jitter, whitened=whitened,
            num_quadrature_points=num_quadrature_points, link=link)
        gp._generate_outputs({"random_variable": shape})
        return gp.random_variable

    def replicate_self(self, attribute_map=None):
        rep = super().replicate_self(attribute_map)
        rep.kernel = self.kernel.replicate_self(attribute_map)
        if rep._module_graph is not None:
            rep._module_graph.kernel = rep._module_graph.U.factor.kernel
        rep._has_mean = self._has_mean
        rep.jitter = self.jitter
        rep.whitened = self.whitened
        rep.num_quadrature_points = self.num_quadrature_points
        rep.link = self.link
        return rep
