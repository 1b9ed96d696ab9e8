"""Deep Gaussian processes by doubly-stochastic variational inference
(Salimbeni & Deisenroth, NeurIPS 2017): regression
(:class:`DeepGPRegression`) and binary classification
(:class:`DeepGPClassification`) over a shared layer stack
(:class:`_DeepGPModule`).

Beyond the reference's module set (amzn/MXFusion ships single-layer GP
modules only — /root/reference/mxfusion/modules/gp_modules/__init__.py);
this stacks L SVGP layers F_l ~ GP(m_l(F_{l-1}), k_l) with independent
variational posteriors q(U_l) and optimizes the doubly-stochastic bound

    Σ_n E_{q(f_L,n)}[log p(y_n | f_L,n)] − Σ_l KL(q(U_l) ‖ p(U_l))

where the outer expectation is estimated by S reparameterized samples
propagated through the inner layers. The final-layer expected
log-likelihood is analytic for the Gaussian likelihood (residual form)
and Gauss–Hermite quadrature for the Bernoulli one — both single
copies shared with the corresponding single-layer modules.

TPU-first design:

- The S Monte-Carlo propagation samples ride the framework's leading
  sample axis: each layer is ONE batched evaluation (kernel gram +
  batched triangular ops + MXU einsums over an (S, N, D) block), never
  a per-sample loop. Layer parameters stay at sample-size 1 so the M×M
  Cholesky factorizes once and broadcasts against the S-sample data
  panels.
- The per-layer q(f | F_{l-1}) moments reuse the shared SVGP algebra
  (``_layer_q_moments`` in svgp_classification.py — single copy of the
  cancellation-sensitive variance math, precision-guarded for the
  1-pass-bf16 data tier).
- The FINAL layer's expected log-likelihood has no extra sampling
  noise: Gaussian in residual form (same reorganization as
  svgp_regression.py:198-218), Bernoulli by the shared Gauss–Hermite
  quadrature. A 1-layer stack reproduces the corresponding
  single-layer module's ELBO EXACTLY — the test oracles
  (tests/modules/test_deep_gp.py, test_deep_gp_classification.py).
- Inner layers carry fixed identity-like linear mean functions
  (``inner_mean="linear"``, the Salimbeni & Deisenroth trick): a
  zero-mean initialization collapses the latent rank and stalls
  training; the linear mean keeps the identity signal path while the
  GP learns the residual warp. W_l is a CONSTANT, not trained.

The whitened parameterization (q over v = L⁻¹u) is the DEFAULT here —
deep stacks compound the conditioning problem that whitening solves,
and it is the published default for DSVI implementations.
"""
import numpy as np
import jax.numpy as jnp

from ..module import Module
from ...models.model import Model
from ...models.posterior import Posterior
from ...components.variables.variable import Variable
from ...components.variables.var_trans import PositiveTransformation
from ...components.variables.runtime_variable import arrays_as_samples
from ...components.distributions.normal import Normal
from ...components.distributions.random_gen import default_rand_gen
from ...components.distributions.gp.gp import GaussianProcess
from ...components.distributions.gp.cond_gp import \
    ConditionalGaussianProcess
from ...components.functions.operators import (broadcast_to, dot,
                                               sigmoid, probit)
from ...inference.variational import VariationalInference
from ...inference.inference_alg import SamplingAlgorithm
from ...inference.forward_sampling import ForwardSamplingAlgorithm
from ...components.distributions.bernoulli import Bernoulli
from ...ops.precision import guarded_forward_matmul
from .svgp_classification import (_bernoulli_expected_log_lik,
                                  _class_probability, _layer_q_moments,
                                  _neg_kl, _VAR_FLOOR)

LOG2PI = float(np.log(2.0 * np.pi))


def _identity_mean_weights(d_in, d_out):
    """Fixed inner-layer mean map: identity, truncated (d_out < d_in)
    or zero-padded (d_out > d_in) — the standard DSVI skip connection."""
    return np.eye(d_in, d_out)


class _DeepGPLayerStack:
    """Shared layer-propagation plumbing for the bound and predictions.

    Subclasses are inference algorithms over the module graph built by
    :meth:`DeepGPRegression._build_module_graphs`; layer l's components
    are addressed BY NAME (``U_l``, ``inducing_inputs_l``, ``qU_*_l``)
    so the handles survive module cloning (module.py replicates graphs
    and re-binds algorithms by graph position, not object identity).
    """

    def _fetch_layer(self, env, l):
        model = self.model
        post = self._extra_graphs[0]
        Z = env[getattr(model, "inducing_inputs_%d" % l)]
        mu = env[getattr(post, "qU_mean_%d" % l)]
        S_W = env[getattr(post, "qU_cov_W_%d" % l)]
        S_diag = env[getattr(post, "qU_cov_diag_%d" % l)]
        kern = getattr(model, "U_%d" % l).factor.kernel
        kern_params = kern.fetch_parameters(env)
        Z, mu, S_W, S_diag, kern_params = arrays_as_samples(
            [Z, mu, S_W, S_diag, kern_params])
        W = None
        if self.inner_mean == "linear" and l < self.num_layers - 1:
            (W,) = arrays_as_samples([env[getattr(model, "W_%d" % l)]])
        return Z, mu, S_W, S_diag, kern, kern_params, W

    def _layer_moments(self, env, l, A):
        """q(f_l) moments at (sampled) inputs ``A`` (s, N, D_{l-1})."""
        Z, mu, S_W, S_diag, kern, kern_params, W = \
            self._fetch_layer(env, l)
        # the skip-mean product rides the precision policy like every
        # other data-side contraction: forward floored at HIGH (it
        # feeds the cancellation-amplified residual Y − m and every
        # deeper layer's gram), cotangents at the configured data tier
        mean_f = guarded_forward_matmul(A, W) if W is not None else None
        # RELATIVE jitter (× mean kernel diagonal), as in the
        # classification ELBO: deep training walks every layer's
        # variance/lengthscale freely, and an absolute floor is
        # silently outscaled once a layer's Kuu grows (measured: the
        # 2-layer step-function fit NaNs at ~13 adam steps with an
        # absolute 1e-8, trains cleanly with the relative form). With
        # kernel variance 1 the two coincide, which is what keeps the
        # 1-layer ≡ SVGP oracle exact (tests/modules/test_deep_gp.py).
        return _layer_q_moments(
            A, Z, mu, S_W, S_diag, kern, kern_params, self.jitter,
            self.whitened, relative_jitter=True, mean_f=mean_f)

    def _mc_count(self, sample_count, requested):
        """Monte-Carlo propagation count. An env that already carries
        s > 1 samples (sampled hyperparameters, outer SVI draws) pins
        the count to s — one propagation draw per env sample, which is
        what composes with the outer interpreter's per-term sample
        mean; ``requested`` applies only to a sample-size-1 env (the
        arrays could not broadcast against 1 < s ≠ requested anyway)."""
        if self.num_layers == 1 or sample_count > 1:
            return sample_count
        return requested

    def _propagate(self, env, ctx, A, num_mc):
        """Sample through the inner layers; returns (A, neg_kl_sum)
        with A carrying ``num_mc`` Monte-Carlo samples on the sample
        axis after the first sampled layer. A is NOT pre-broadcast:
        layer 0's gram/solve runs ONCE on the deterministic input
        (sample dim 1) and only the eps draw fans out to num_mc — the
        batched solve over num_mc identical panels is pure waste. The
        final layer is NOT consumed here (the bound needs its analytic
        moments; predictions need its mixture moments)."""
        kl_sum = 0.0
        for l in range(self.num_layers - 1):
            mu_f, var_f, Linvmu, LinvLs = self._layer_moments(env, l, A)
            eps = self._rand_gen.sample_normal(
                ctx.next_key(), shape=(num_mc,) + mu_f.shape[1:],
                dtype=mu_f.dtype)
            # positive floor (not 0): sqrt'(0) is infinite and the
            # moment cancellation can land slightly negative — same
            # guard as the quadrature ELBOs (svgp_classification.py)
            A = mu_f + jnp.sqrt(
                jnp.maximum(var_f, _VAR_FLOOR))[..., None] * eps
            kl_sum = kl_sum + _neg_kl(Linvmu, LinvLs, mu_f.shape[-1])
        return A, kl_sum


class DeepGPRegressionLogPdf(VariationalInference, _DeepGPLayerStack):
    """The doubly-stochastic ELBO. ``num_samples`` is the Monte-Carlo
    propagation count S (the returned bound has shape (S,); the outer
    interpreter's per-term sample mean — factor_graph.py:167-174 — IS
    the MC average, so the estimator composes with everything that
    consumes per-sample terms)."""

    def __init__(self, model, posterior, observed, num_layers,
                 jitter=0.0, whitened=True, num_samples=5,
                 inner_mean="linear", rand_gen=None):
        super().__init__(num_samples=num_samples, model=model,
                         posterior=posterior, observed=observed)
        self.log_pdf_scaling = 1.0
        self.num_layers = num_layers
        self.jitter = jitter
        self.whitened = whitened
        self.inner_mean = inner_mean
        self._rand_gen = rand_gen if rand_gen is not None \
            else default_rand_gen()

    def compute(self, env, ctx):
        X = env[self.model.X]
        Y = env[self.model.Y]
        noise_var = env[self.model.noise_var]
        X, Y, noise_var = arrays_as_samples([X, Y, noise_var])
        D = Y.shape[-1]

        num_mc = self._mc_count(X.shape[0], self.num_samples)
        A, kl_sum = self._propagate(env, ctx, X, num_mc)

        # final layer: analytic Gaussian expected log-likelihood in
        # residual form (svgp_regression.py:198-218 — error scales
        # with |Y − m|, not |Y|, which is what keeps the 1-pass-bf16
        # data tier convergent); var_f bundles the Kff − qff trace
        # correction and the S-term in one per-point residual
        mu_f, var_f, Linvmu, LinvLs = self._layer_moments(
            env, self.num_layers - 1, A)
        kl_sum = kl_sum + _neg_kl(Linvmu, LinvLs, D)

        if noise_var.ndim == 2:
            noise_var = jnp.expand_dims(noise_var, axis=-2)
        if noise_var.shape[-1] == 1:
            beta_sum = D * jnp.sum(1.0 / noise_var, axis=-1)
        else:
            beta_sum = jnp.sum(1.0 / noise_var, axis=-1)

        R = Y - mu_f                                        # (S, N, D)
        logL = -jnp.sum(jnp.square(R) / noise_var + LOG2PI +
                        jnp.log(noise_var), axis=(-2, -1)) / 2.0
        logL = logL - jnp.sum(var_f * beta_sum, axis=-1) / 2.0
        return self.log_pdf_scaling * logL + kl_sum


class DeepGPMeanVariancePrediction(SamplingAlgorithm, _DeepGPLayerStack):
    """Predictive mixture moments: S propagation samples through the
    inner layers, analytic q(f_L) moments per sample, then the Gaussian
    mixture's mean/diagonal variance. ``num_samples`` (set by
    ``predict(num_samples=...)``) is the propagation count; when the
    caller never chose one (``num_samples_requested`` is None) a
    multi-layer stack uses ``default_samples`` — an EXPLICIT 1 is
    honored as a deliberate single-propagation point estimate."""

    serving_data_axes = ((1,), (1,))  # (1, N, D) mean + (1, N, D) var

    def __init__(self, model, posterior, observed, num_layers,
                 noise_free=True, jitter=0.0, whitened=True,
                 inner_mean="linear", default_samples=20, rand_gen=None):
        super().__init__(model=model, observed=observed,
                         extra_graphs=[posterior])
        self.num_layers = num_layers
        self.noise_free = noise_free
        self.jitter = jitter
        self.whitened = whitened
        self.inner_mean = inner_mean
        self.default_samples = default_samples
        self._rand_gen = rand_gen if rand_gen is not None \
            else default_rand_gen()

    def compute(self, env, ctx):
        X = env[self.model.X]
        (X,) = arrays_as_samples([X])
        # honor any EXPLICIT request (including 1 — a deliberate cheap
        # point estimate); promote to default_samples only when the
        # caller never chose a count (num_samples_requested is None)
        requested = self.num_samples_requested
        requested = self.default_samples if requested is None \
            else requested
        num_mc = self._mc_count(X.shape[0], requested)
        A, _ = self._propagate(env, ctx, X, num_mc)
        mu_f, var_f, _, _ = self._layer_moments(
            env, self.num_layers - 1, A)
        # Gaussian-mixture moments over the MC axis (exact for the
        # mixture's mean and per-point diagonal variance)
        mean = jnp.mean(mu_f, axis=0, keepdims=True)        # (1, N, D)
        var = jnp.mean(var_f[..., None] + jnp.square(mu_f), axis=0,
                       keepdims=True) - jnp.square(mean)    # (1, N, D)
        if not self.noise_free:
            noise_var = env[self.model.noise_var]
            (noise_var,) = arrays_as_samples([noise_var])
            if noise_var.ndim == 2:
                noise_var = jnp.expand_dims(noise_var, axis=-2)
            var = var + noise_var
        outcomes = {self.model.Y.uuid: (mean, var)}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class DeepGPSamplingPrediction(DeepGPMeanVariancePrediction):
    """Predictive sampling: propagate AND sample the final layer (plus
    observation noise unless ``noise_free``). Returns
    (num_samples, N, D) draws from the posterior predictive."""

    serving_data_axes = ((1,),)

    def compute(self, env, ctx):
        X = env[self.model.X]
        (X,) = arrays_as_samples([X])
        # number of returned draws: the env's sample count when it
        # carries one (>1), else the requested draw count — regardless
        # of depth (a 1-layer stack still returns num_samples draws,
        # via eps fan-out below rather than input pre-broadcast)
        num_mc = X.shape[0] if X.shape[0] > 1 \
            else max(self.num_samples, 1)
        A, _ = self._propagate(env, ctx, X, num_mc)
        mu_f, var_f, _, _ = self._layer_moments(
            env, self.num_layers - 1, A)
        var = jnp.maximum(var_f, _VAR_FLOOR)[..., None]
        if not self.noise_free:
            noise_var = env[self.model.noise_var]
            (noise_var,) = arrays_as_samples([noise_var])
            if noise_var.ndim == 2:
                noise_var = jnp.expand_dims(noise_var, axis=-2)
            var = var + noise_var
        eps = self._rand_gen.sample_normal(
            ctx.next_key(), shape=(num_mc,) + mu_f.shape[1:],
            dtype=mu_f.dtype)
        samples = mu_f + jnp.sqrt(var) * eps
        outcomes = {self.model.Y.uuid: samples}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class _DeepGPModule(Module):
    """Shared deep-GP module plumbing: layer-stack construction,
    per-layer posterior allocation, replication. Subclasses supply the
    likelihood tail (``_replicate_extra_inputs`` + ``_set_output_prior``)
    and the attached inference algorithms.

    Parameters (shared by the concrete modules)
    ----------
    kernels : list of kernels, one per layer (depth L = len(kernels)).
        Layer widths are derived from the NEXT kernel's ``input_dim``:
        layer l outputs ``kernels[l+1].input_dim`` features; the final
        layer outputs the observed Y's event width.
    inducing_inputs : optional list of L Variables, layer l's of shape
        (M_l, D_{l-1}); defaults to ``num_inducing`` standard-normal
        rows each (inner layers live in latent space, so the standard
        normal is the right default there).
    num_samples : Monte-Carlo propagation count S for the training
        bound (1 is unbiased; more reduces gradient variance).
    inner_mean : "linear" (fixed identity-like skip, default) | "zero".
    whitened : default True (see module docstring).
    jitter : RELATIVE Cholesky stabilizer (scaled by the mean
        kernel diagonal, as svgp_classification.py) — deep
        training grows per-layer kernel scales freely.
    """

    _graph_name = "deep_gp"

    def __init__(self, X, kernels, inducing_inputs=None,
                 num_inducing=10, extra_inputs=(), rand_gen=None,
                 dtype=None, jitter=1e-5, whitened=True, num_samples=5,
                 inner_mean="linear"):
        if not isinstance(kernels, (list, tuple)) or len(kernels) == 0:
            raise ValueError(
                "{} needs a non-empty list of kernels (one per layer);"
                " got {!r}.".format(type(self).__name__, kernels))
        if inner_mean not in ("linear", "zero"):
            raise ValueError("inner_mean must be 'linear' or 'zero', "
                             "got {!r}".format(inner_mean))
        self.kernels = list(kernels)
        self.num_layers = len(self.kernels)
        self.jitter = jitter
        self.whitened = whitened
        self.num_samples = num_samples
        self.inner_mean = inner_mean
        if not isinstance(X, Variable):
            X = Variable(value=X)
        if inducing_inputs is None:
            inducing_inputs = [
                Variable(shape=(num_inducing, k.input_dim),
                         initial_value=np.random.randn(num_inducing,
                                                       k.input_dim))
                for k in self.kernels]
        if len(inducing_inputs) != self.num_layers:
            raise ValueError(
                "Need one inducing-input Variable per layer: got {} "
                "for {} layers.".format(len(inducing_inputs),
                                        self.num_layers))
        inputs = [("X", X)]
        inputs += [("inducing_inputs_%d" % l, z)
                   for l, z in enumerate(inducing_inputs)]
        inputs.extend(extra_inputs)
        input_names = [k for k, _ in inputs]
        super().__init__(inputs=inputs, outputs=None,
                         input_names=input_names,
                         output_names=["random_variable"],
                         rand_gen=rand_gen, dtype=dtype)

    def _generate_outputs(self, output_shapes=None):
        if output_shapes["random_variable"] is None:
            Y_shape = self.X.shape[:-1] + (1,)
        else:
            Y_shape = output_shapes["random_variable"]
        self.set_outputs([Variable(shape=Y_shape)])

    def _layer_widths(self):
        D_out = self.random_variable.shape[-1]
        return [k.input_dim for k in self.kernels[1:]] + [D_out]

    # ---- subclass hooks ------------------------------------------------
    def _replicate_extra_inputs(self, graph):
        """Replicate likelihood-specific inputs onto ``graph``."""

    def _set_output_prior(self, graph, A):
        """Attach the likelihood tail: graph.Y with a prior driven by
        the final layer's GP output ``A``."""
        raise NotImplementedError

    def _build_module_graphs(self):
        graph = Model(name=self._graph_name)
        graph.X = self.X.replicate_self()
        self._replicate_extra_inputs(graph)
        N = self.X.shape[0]
        widths = self._layer_widths()

        post_specs = []
        A = graph.X
        for l, kern in enumerate(self.kernels):
            Z = getattr(self, "inducing_inputs_%d" % l).replicate_self()
            setattr(graph, "inducing_inputs_%d" % l, Z)
            M_l = Z.shape[0]
            U = GaussianProcess.define_variable(
                X=Z, kernel=kern, shape=(M_l, widths[l]),
                rand_gen=self._rand_gen, dtype=self.dtype,
                jitter=self.jitter)
            setattr(graph, "U_%d" % l, U)
            mean = None
            if self.inner_mean == "linear" and l < self.num_layers - 1:
                W = Variable(value=_identity_mean_weights(
                    kern.input_dim, widths[l]))
                setattr(graph, "W_%d" % l, W)
                mean = dot(A, W)
                setattr(graph, "mean_%d" % l, mean)
            F = ConditionalGaussianProcess.define_variable(
                X=A, X_cond=Z, Y_cond=U,
                kernel=getattr(graph, "U_%d" % l).factor.kernel,
                shape=(N, widths[l]), mean=mean,
                rand_gen=self._rand_gen, dtype=self.dtype,
                jitter=self.jitter)
            setattr(graph, "F_%d" % l, F)
            A = F
            post_specs.append((M_l, widths[l]))

        self._set_output_prior(graph, A)

        post = Posterior(graph)
        for l, (M_l, D_l) in enumerate(post_specs):
            setattr(post, "qU_cov_diag_%d" % l, Variable(
                shape=(M_l,), transformation=PositiveTransformation(),
                initial_value=np.ones(M_l) * 1e-6))
            setattr(post, "qU_cov_W_%d" % l, Variable(
                shape=(M_l, M_l), initial_value=np.eye(M_l)))
            setattr(post, "qU_mean_%d" % l, Variable(
                shape=(M_l, D_l)))
        return graph, [post]

    def replicate_self(self, attribute_map=None):
        rep = super().replicate_self(attribute_map)
        rep.kernels = [k.replicate_self(attribute_map)
                       for k in self.kernels]
        rep.num_layers = self.num_layers
        rep.jitter = self.jitter
        rep.whitened = self.whitened
        rep.num_samples = self.num_samples
        rep.inner_mean = self.inner_mean
        return rep


class DeepGPRegression(_DeepGPModule):
    """Deep GP regression module (see the module docstring and
    :class:`_DeepGPModule` for the shared parameters)."""

    _graph_name = "deep_gp_regression"

    def __init__(self, X, kernels, noise_var, inducing_inputs=None,
                 num_inducing=10, rand_gen=None, dtype=None,
                 jitter=1e-5, whitened=True, num_samples=5,
                 inner_mean="linear"):
        if not isinstance(noise_var, Variable):
            noise_var = Variable(value=noise_var)
        super().__init__(
            X=X, kernels=kernels, inducing_inputs=inducing_inputs,
            num_inducing=num_inducing,
            extra_inputs=[("noise_var", noise_var)], rand_gen=rand_gen,
            dtype=dtype, jitter=jitter, whitened=whitened,
            num_samples=num_samples, inner_mean=inner_mean)

    def _replicate_extra_inputs(self, graph):
        graph.noise_var = self.noise_var.replicate_self()

    def _set_output_prior(self, graph, A):
        graph.Y = self.random_variable.replicate_self()
        graph.Y.set_prior(Normal(
            mean=A,
            variance=broadcast_to(graph.noise_var, graph.Y.shape),
            rand_gen=self._rand_gen, dtype=self.dtype))

    def _attach_default_inference_algorithms(self):
        observed = [v for _, v in self.inputs] + \
            [v for _, v in self.outputs]
        self.attach_log_pdf_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=DeepGPRegressionLogPdf(
                self._module_graph, self._extra_graphs[0], observed,
                num_layers=self.num_layers, jitter=self.jitter,
                whitened=self.whitened, num_samples=self.num_samples,
                inner_mean=self.inner_mean, rand_gen=self._rand_gen),
            alg_name="deep_gp_log_pdf")
        observed = [v for _, v in self.inputs]
        self.attach_draw_samples_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=ForwardSamplingAlgorithm(self._module_graph,
                                               observed),
            alg_name="deep_gp_sampling")
        self.attach_prediction_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=DeepGPMeanVariancePrediction(
                self._module_graph, self._extra_graphs[0], observed,
                num_layers=self.num_layers, jitter=self.jitter,
                whitened=self.whitened, inner_mean=self.inner_mean,
                rand_gen=self._rand_gen),
            alg_name="deep_gp_predict")

    @staticmethod
    def define_variable(X, kernels, noise_var, shape=None,
                        inducing_inputs=None, num_inducing=10,
                        rand_gen=None, dtype=None, jitter=1e-5,
                        whitened=True, num_samples=5,
                        inner_mean="linear"):
        gp = DeepGPRegression(
            X=X, kernels=kernels, noise_var=noise_var,
            inducing_inputs=inducing_inputs, num_inducing=num_inducing,
            rand_gen=rand_gen, dtype=dtype, jitter=jitter,
            whitened=whitened, num_samples=num_samples,
            inner_mean=inner_mean)
        gp._generate_outputs({"random_variable": shape})
        return gp.random_variable


class DeepGPClassificationLogPdf(VariationalInference, _DeepGPLayerStack):
    """Doubly-stochastic ELBO with a Bernoulli likelihood: the final
    layer's expected log-likelihood is a Gauss–Hermite quadrature over
    its analytic Gaussian q(f_L | propagation sample) — the same
    one-batched-(S, N, Q)-broadcast evaluation as the single-layer
    classification ELBO (svgp_classification.py), so a 1-layer stack
    reproduces SVGPClassification's bound exactly (the test oracle)."""

    def __init__(self, model, posterior, observed, num_layers,
                 jitter=0.0, whitened=True, num_samples=5,
                 inner_mean="linear", num_quadrature_points=20,
                 link="logit", rand_gen=None):
        super().__init__(num_samples=num_samples, model=model,
                         posterior=posterior, observed=observed)
        self.log_pdf_scaling = 1.0
        self.num_layers = num_layers
        self.jitter = jitter
        self.whitened = whitened
        self.inner_mean = inner_mean
        self.num_quadrature_points = num_quadrature_points
        self.link = link
        self._rand_gen = rand_gen if rand_gen is not None \
            else default_rand_gen()

    def compute(self, env, ctx):
        X = env[self.model.X]
        Y = env[self.model.Y]
        X, Y = arrays_as_samples([X, Y])

        num_mc = self._mc_count(X.shape[0], self.num_samples)
        A, kl_sum = self._propagate(env, ctx, X, num_mc)
        mu_f, var_f, Linvmu, LinvLs = self._layer_moments(
            env, self.num_layers - 1, A)
        kl_sum = kl_sum + _neg_kl(Linvmu, LinvLs, 1)
        mu = mu_f[..., 0]                                   # (S, N)

        sign = 2.0 * Y[..., 0] - 1.0                        # (s, N)
        quad = _bernoulli_expected_log_lik(
            mu, var_f, sign, self.link, self.num_quadrature_points)
        logL = jnp.sum(quad, axis=-1)
        return self.log_pdf_scaling * logL + kl_sum


class DeepGPClassificationProbPrediction(SamplingAlgorithm,
                                         _DeepGPLayerStack):
    """Predictive class-1 probability, mixture-averaged over the S
    propagation samples: p = (1/S) Σ_s E_{q(f_L | s)}[link(f_L)] —
    quadrature for the logit link, closed-form Φ(μ/√(1+σ²)) per sample
    for the probit link. Returns {Y: (p, p(1−p))}."""

    serving_data_axes = ((1,), (1,))  # (1, N, 1) probability moments

    def __init__(self, model, posterior, observed, num_layers,
                 jitter=0.0, whitened=True, inner_mean="linear",
                 num_quadrature_points=20, link="logit",
                 default_samples=20, rand_gen=None):
        super().__init__(model=model, observed=observed,
                         extra_graphs=[posterior])
        self.num_layers = num_layers
        self.jitter = jitter
        self.whitened = whitened
        self.inner_mean = inner_mean
        self.num_quadrature_points = num_quadrature_points
        self.link = link
        self.default_samples = default_samples
        self._rand_gen = rand_gen if rand_gen is not None \
            else default_rand_gen()

    def compute(self, env, ctx):
        X = env[self.model.X]
        (X,) = arrays_as_samples([X])
        requested = self.num_samples_requested
        requested = self.default_samples if requested is None \
            else requested
        num_mc = self._mc_count(X.shape[0], requested)
        A, _ = self._propagate(env, ctx, X, num_mc)
        mu_f, var_f, _, _ = self._layer_moments(
            env, self.num_layers - 1, A)
        p_s = _class_probability(mu_f[..., 0], var_f, self.link,
                                 self.num_quadrature_points)  # (S, N)
        p = jnp.mean(p_s, axis=0, keepdims=True)[..., None]  # (1, N, 1)
        outcomes = {self.model.Y.uuid: (p, p * (1.0 - p))}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class DeepGPClassification(_DeepGPModule):
    """Deep GP binary classification: stacked SVGP layers, Bernoulli
    likelihood through a logit or probit link on the final layer.
    Labels are {0, 1}; the output event dim must be 1. See
    :class:`_DeepGPModule` for the shared stack parameters."""

    _graph_name = "deep_gp_classification"

    def __init__(self, X, kernels, inducing_inputs=None,
                 num_inducing=10, rand_gen=None, dtype=None,
                 jitter=1e-5, whitened=True, num_samples=5,
                 inner_mean="linear", num_quadrature_points=20,
                 link="logit"):
        if link not in ("logit", "probit"):
            raise ValueError("link must be 'logit' or 'probit', got "
                             "{!r}".format(link))
        self.num_quadrature_points = num_quadrature_points
        self.link = link
        super().__init__(
            X=X, kernels=kernels, inducing_inputs=inducing_inputs,
            num_inducing=num_inducing, rand_gen=rand_gen, dtype=dtype,
            jitter=jitter, whitened=whitened, num_samples=num_samples,
            inner_mean=inner_mean)

    def _generate_outputs(self, output_shapes=None):
        super()._generate_outputs(output_shapes)
        if self.random_variable.shape[-1] != 1:
            raise ValueError(
                "DeepGPClassification is binary: the output event dim "
                "must be 1, got {}.".format(
                    self.random_variable.shape[-1]))

    def _set_output_prior(self, graph, A):
        graph.p = sigmoid(A) if self.link == "logit" else probit(A)
        graph.Y = self.random_variable.replicate_self()
        graph.Y.set_prior(Bernoulli(
            prob_true=graph.p, rand_gen=self._rand_gen,
            dtype=self.dtype))

    def _attach_default_inference_algorithms(self):
        observed = [v for _, v in self.inputs] + \
            [v for _, v in self.outputs]
        self.attach_log_pdf_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=DeepGPClassificationLogPdf(
                self._module_graph, self._extra_graphs[0], observed,
                num_layers=self.num_layers, jitter=self.jitter,
                whitened=self.whitened, num_samples=self.num_samples,
                inner_mean=self.inner_mean,
                num_quadrature_points=self.num_quadrature_points,
                link=self.link, rand_gen=self._rand_gen),
            alg_name="deep_gp_class_log_pdf")
        observed = [v for _, v in self.inputs]
        self.attach_draw_samples_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=ForwardSamplingAlgorithm(self._module_graph,
                                               observed),
            alg_name="deep_gp_class_sampling")
        self.attach_prediction_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=DeepGPClassificationProbPrediction(
                self._module_graph, self._extra_graphs[0], observed,
                num_layers=self.num_layers, jitter=self.jitter,
                whitened=self.whitened, inner_mean=self.inner_mean,
                num_quadrature_points=self.num_quadrature_points,
                link=self.link, rand_gen=self._rand_gen),
            alg_name="deep_gp_class_predict")

    @staticmethod
    def define_variable(X, kernels, shape=None, inducing_inputs=None,
                        num_inducing=10, rand_gen=None, dtype=None,
                        jitter=1e-5, whitened=True, num_samples=5,
                        inner_mean="linear", num_quadrature_points=20,
                        link="logit"):
        gp = DeepGPClassification(
            X=X, kernels=kernels, inducing_inputs=inducing_inputs,
            num_inducing=num_inducing, rand_gen=rand_gen, dtype=dtype,
            jitter=jitter, whitened=whitened, num_samples=num_samples,
            inner_mean=inner_mean,
            num_quadrature_points=num_quadrature_points, link=link)
        gp._generate_outputs({"random_variable": shape})
        return gp.random_variable

    def replicate_self(self, attribute_map=None):
        rep = super().replicate_self(attribute_map)
        rep.num_quadrature_points = self.num_quadrature_points
        rep.link = self.link
        return rep
