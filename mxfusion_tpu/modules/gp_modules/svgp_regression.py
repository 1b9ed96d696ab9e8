"""Uncollapsed stochastic variational GP regression (Hensman-style).

Reference: /root/reference/mxfusion/modules/gp_modules/svgp_regression.py
(bound :43-109, predictions :112-280, module :283-457). The posterior
holds explicit variational parameters ``q(U) = N(qU_mean,
qU_cov_W qU_cov_Wᵀ + diag(qU_cov_diag))``; the ELBO is

    log_pdf_scaling · E_q[log N(Y | KfuKuu⁻¹U, σ²)] − KL(q(U) ‖ p(U))

with the data-dependent terms minibatchable (every term is a sum over
N, which is also what makes the bound shardable over a device mesh —
see ``mxfusion_tpu.parallel``). Heteroscedastic noise is supported.
All linalg is batched Cholesky + triangular solves + einsum on the MXU.
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..module import Module
from ...models.model import Model
from ...models.posterior import Posterior
from ...components.variables.variable import Variable
from ...components.variables.var_trans import PositiveTransformation
from ...components.variables.runtime_variable import arrays_as_samples
from ...components.distributions.normal import Normal
from ...components.distributions.gp.gp import GaussianProcess
from ...components.distributions.gp.cond_gp import \
    ConditionalGaussianProcess
from ...components.functions.operators import broadcast_to
from ...inference.variational import VariationalInference
from ...inference.inference_alg import SamplingAlgorithm
from ...inference.forward_sampling import ForwardSamplingAlgorithm
from ...ops.linalg import (make_diagonal, broadcast_to_w_samples,
                           wide_triangular_solve)
from ...ops.precision import einsum as p_einsum
from ...ops.precision import data_precision_scope
from ...ops.precision import (data_einsum, guarded_data_einsum,
                              guarded_forward_matmul)

LOG2PI = float(np.log(2.0 * np.pi))


class SVGPRegressionLogPdf(VariationalInference):
    """Uncollapsed SVGP ELBO (reference svgp_regression.py:43-109).

    ``whitened=True`` parameterizes q over the whitened inducing values
    v = L^-1 u (u = L v, L = chol(Kuu)) — the GPflow-style
    parameterization whose KL term is against N(0, I), decoupling the
    variational parameters from the kernel hyperparameters for much
    better optimization conditioning. No reference counterpart.
    """

    def __init__(self, model, posterior, observed, jitter=0.0,
                 whitened=False):
        super().__init__(num_samples=1, model=model, posterior=posterior,
                         observed=observed)
        self.log_pdf_scaling = 1.0
        self.jitter = jitter
        self.whitened = whitened

    def compute(self, env, ctx):
        has_mean = self.model.F.factor.has_mean
        X = env[self.model.X]
        Y = env[self.model.Y]
        Z = env[self.model.inducing_inputs]
        noise_var = env[self.model.noise_var]
        mu = env[self.posterior.qU_mean]
        S_W = env[self.posterior.qU_cov_W]
        S_diag = env[self.posterior.qU_cov_diag]
        D = Y.shape[-1]
        M = Z.shape[-2]
        kern = self.model.kernel
        kern_params = kern.fetch_parameters(env)
        X, Y, Z, noise_var, mu, S_W, S_diag, kern_params = arrays_as_samples(
            [X, Y, Z, noise_var, mu, S_W, S_diag, kern_params])

        if noise_var.ndim == 2:
            # homoscedastic (s, 1) -> (s, 1, 1); heteroscedastic stays
            # (s, N, 1) or (s, N, D)
            noise_var = jnp.expand_dims(noise_var, axis=-2)
        if noise_var.shape[-1] == 1:
            beta_sum = D * jnp.sum(1.0 / noise_var, axis=-1)   # (s, N|1)
        else:
            beta_sum = jnp.sum(1.0 / noise_var, axis=-1)

        eye_m = jnp.expand_dims(jnp.eye(M, dtype=Z.dtype), axis=0)
        Kuu = kern.K(Z, **kern_params)
        if self.jitter > 0.0:
            Kuu = Kuu + eye_m * self.jitter
        N = X.shape[-2]
        wide = N >= 4 * M
        # Fused Pallas data path (r5): for the plain-RBF wide case on
        # TPU at LARGE N, Kuf NEVER materializes in HBM — the gram
        # tiles are assembled in VMEM and consumed by the L⁻¹-product
        # directly (forward AND backward). Measured through this full
        # step: tie at N=65536, 1.03x at 131072, 1.07x at 262144
        # (benchmarks/NOTES.md r5 fused-gram entry) — pfg.supported()
        # gates it to the winning envelope (N >= 131072). Works for
        # both parameterizations: whitened only changes the NARROW
        # factors (LinvLs = Ls, Linvmu = mu), not the G-product.
        from ...ops import pallas_fused_gram as pfg
        from ...components.distributions.gp.kernels import RBF as _RBF
        # exact class identity (not isinstance): a subclass may
        # override _compute_K, and the fused kernel hard-codes the
        # plain-RBF gram — engaging it there would silently train
        # against the wrong kernel
        use_fused = (pfg.enabled() and wide
                     and X.shape[0] == 1
                     and type(kern) is _RBF
                     and getattr(kern, "active_dims", None) is None
                     and pfg.supported(M, N, X.shape[-1], X.dtype))
        Kuf = None if use_fused else kern.K(Z, X, **kern_params)
        Kff_diag = kern.Kdiag(X, **kern_params)

        S = p_einsum("...ik,...jk->...ij", S_W, S_W) + \
            make_diagonal(S_diag)

        if has_mean:
            Y = Y - env[self.model.mean]

        # ONE batched Cholesky for the two independent M×M factors:
        # inside a compiled program the two factorizations would run
        # serially (each latency-bound); stacked they share the column
        # recurrence (measured win on the latency-bound bench tier)
        LL = jnp.linalg.cholesky(jnp.stack([Kuu, S], axis=-3))
        L = LL[..., 0, :, :]
        Ls = LL[..., 1, :, :]
        Linv = None
        if use_fused or (wide and not self.whitened):
            # the wide data solve materializes L⁻¹ anyway — reuse it
            # for the narrow solves too (2 serial triangular kernels
            # become MXU matmuls). The fused kernel consumes L⁻¹
            # explicitly, so the whitened fused case materializes it
            # here as well (wide_triangular_solve would have done the
            # same internally).
            from ...ops.linalg import triangular_inverse
            Linv = triangular_inverse(L, lower=True)
        if self.whitened:
            # q parameterizes v = L^-1 u directly: the L-solves and the
            # prior logdet correction drop out of the bound
            LinvLs = Ls
            Linvmu = mu
        elif Linv is not None:
            LinvLs = p_einsum("...ij,...jk->...ik", Linv, Ls)
            Linvmu = p_einsum("...ij,...jk->...ik", Linv, mu)
        else:
            LinvLs = jsl.solve_triangular(L, Ls, lower=True)
            Linvmu = jsl.solve_triangular(L, mu, lower=True)
        if use_fused:
            # Linv is guaranteed above (the use_fused arm materializes
            # it); the kernel consumes it explicitly
            _kp = kern._strip_prefix(kern_params)
            ls = _kp["lengthscale"][0]
            var = _kp["variance"][0].reshape(())
            LinvKuf = pfg.fused_linv_rbf_gram(
                Linv[0], Z[0] / ls, X[0] / ls, var)[None]
        elif Linv is not None:
            LinvKuf = guarded_forward_matmul(Linv, Kuf)
        else:
            LinvKuf = wide_triangular_solve(L, Kuf, lower=True)

        # predictive-mean path m = Kufᵀ (Kuu⁻¹ mu): associated through
        # the NARROW w-vector, never through the big 1-pass-relaxable
        # L⁻¹Kuf product — m's rounding enters the bound as R·δm/σ²
        # with |R| → σ at convergence, so it rides the guarded (≥HIGH)
        # tier. O(M·N·D) — same flops as the Gᵀ·L⁻¹mu association.
        if use_fused:
            # fused path: Kuf does not exist — associate through the
            # ≥HIGH-accurate G instead (m = Gᵀ L⁻¹mu, same quantity,
            # same flops; benchmarks/fused_gram_convergence.py is the
            # trajectory-level A/B for this whole branch)
            KfuKuuInvmu = guarded_data_einsum("...mn,...md->...nd",
                                              LinvKuf, Linvmu)
        else:
            if Linv is not None and not self.whitened:
                w_vec = p_einsum("...ji,...jk->...ik", Linv, Linvmu)
            else:
                w_vec = jsl.solve_triangular(L, Linvmu, lower=True,
                                             trans="T")
            KfuKuuInvmu = guarded_data_einsum("...mn,...md->...nd",
                                              Kuf, w_vec)
        KfuKuuInvLs = data_einsum("...mn,...mk->...nk", LinvKuf,
                                  LinvLs)

        sumlogdiag_Ls = jnp.sum(jnp.log(
            jnp.diagonal(Ls, axis1=-2, axis2=-1)), axis=-1)
        if self.whitened:
            # negative KL(q(V) || N(0, I)), summed over output columns
            sumlogdiag_L_D = 0.0
        else:
            sumlogdiag_L_D = jnp.sum(jnp.log(
                jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1) * D
        # negative KL(q || p), summed over output columns
        KL_u = (M / 2.0 + sumlogdiag_Ls) * D - sumlogdiag_L_D \
            - jnp.sum(jnp.square(LinvLs), axis=(-2, -1)) / 2.0 * D \
            - jnp.sum(jnp.square(Linvmu), axis=(-2, -1)) / 2.0

        # RESIDUAL-FORM data fit (r5 redesign; reference keeps the
        # expanded form, svgp_regression.py:98-107 there). The expanded
        # sum −ΣY²/σ² − Σm²/σ² + 2ΣYm/σ² is three near-cancelling
        # O(|Y|²) terms whose rounding the bound amplifies once the fit
        # is tight (|Y−m| ≪ |Y|); computing the residual R = Y − m
        # elementwise in f32 makes the term's error scale with |R|, not
        # |Y|, which is what lets the 1-pass-bf16 data tier converge
        # (benchmarks/NOTES.md r5). It also deletes the ψ₁Y matmul and
        # its M×M solve outright (−2·M·N·D − M²·D flops). Same
        # reorganization on the trace pair: Kff and qff are grouped
        # into a per-point nonnegative residual BEFORE the β-weighted
        # reduction, instead of two separately-reduced O(Kff) sums.
        R = Y - KfuKuuInvmu                                  # (s, N, D)
        qff_diag = jnp.sum(jnp.square(LinvKuf), axis=-2)     # (s, N)
        logL = -jnp.sum(jnp.square(R) / noise_var + LOG2PI +
                        jnp.log(noise_var), axis=(-2, -1)) / 2.0
        logL = logL - jnp.sum((Kff_diag - qff_diag) * beta_sum,
                              axis=-1) / 2.0
        logL = logL - jnp.sum(
            jnp.square(KfuKuuInvLs) * jnp.expand_dims(beta_sum, axis=-1),
            axis=(-2, -1)) / 2.0
        logL = self.log_pdf_scaling * logL + KL_u
        return logL


class SVGPRegressionMeanVariancePrediction(SamplingAlgorithm):
    """Predictive moments from the explicit q(U) (reference :112-190)."""

    def __init__(self, model, posterior, observed, noise_free=True,
                 diagonal_variance=True, jitter=0.0, whitened=False):
        super().__init__(model=model, observed=observed,
                         extra_graphs=[posterior])
        self.jitter = jitter
        self.noise_free = noise_free
        self.diagonal_variance = diagonal_variance
        self.whitened = whitened

    @property
    def serving_data_axes(self):
        # (s, N, D) mean + (s, N, 1) diag var | (s, N, N) covariance
        return ((1,), (1,)) if self.diagonal_variance \
            else ((1,), (1, 2))

    def _moments(self, env):
        has_mean = self.model.F.factor.has_mean
        X = env[self.model.X]
        N = X.shape[-2]
        Z = env[self.model.inducing_inputs]
        noise_var = env[self.model.noise_var]
        posterior = self._extra_graphs[0]
        qU_mean = env[posterior.qU_mean]
        S_W = env[posterior.qU_cov_W]
        S_diag = env[posterior.qU_cov_diag]
        M = Z.shape[-2]
        kern = self.model.kernel
        kern_params = kern.fetch_parameters(env)
        X, Z, noise_var, qU_mean, S_W, S_diag, kern_params = \
            arrays_as_samples(
                [X, Z, noise_var, qU_mean, S_W, S_diag, kern_params])

        S = p_einsum("...ik,...jk->...ij", S_W, S_W) + \
            make_diagonal(S_diag)
        eye_m = jnp.expand_dims(jnp.eye(M, dtype=Z.dtype), axis=0)
        Kuu = kern.K(Z, **kern_params)
        if self.jitter > 0.0:
            Kuu = Kuu + eye_m * self.jitter
        LL = jnp.linalg.cholesky(jnp.stack([Kuu, S], axis=-3))
        L = LL[..., 0, :, :]
        Ls = LL[..., 1, :, :]
        if self.whitened:
            # u = L v: Linv cancels against the whitened parameters
            LinvLs = Ls
            Linvmu = qU_mean
        else:
            LinvLs = jsl.solve_triangular(L, Ls, lower=True)
            Linvmu = jsl.solve_triangular(L, qU_mean, lower=True)
        LinvSLinvT = p_einsum("...ik,...jk->...ij", LinvLs, LinvLs)
        wv = jsl.solve_triangular(L, Linvmu, lower=True, trans="T")

        Kxt = kern.K(Z, X, **kern_params)
        mu = p_einsum("...mn,...md->...nd", Kxt, wv)
        if has_mean:
            mu = mu + env[self.model.mean]
        LinvKxt = jsl.solve_triangular(L, Kxt, lower=True)
        if self.diagonal_variance:
            Ktt = kern.Kdiag(X, **kern_params)
            tmp = p_einsum("...mk,...kn->...mn", LinvSLinvT, LinvKxt)
            var = Ktt - jnp.sum(jnp.square(LinvKxt), axis=-2) + \
                jnp.sum(tmp * LinvKxt, axis=-2)
            var = jnp.expand_dims(var, axis=-1)
            if not self.noise_free:
                var = var + noise_var
        else:
            Ktt = kern.K(X, **kern_params)
            tmp = p_einsum("...mk,...kn->...mn", LinvSLinvT, LinvKxt)
            var = Ktt - \
                p_einsum("...mn,...mk->...nk", LinvKxt, LinvKxt) + \
                p_einsum("...mn,...mk->...nk", LinvKxt, tmp)
            if not self.noise_free:
                var = var + jnp.expand_dims(
                    jnp.eye(N, dtype=X.dtype), axis=0) * \
                    jnp.expand_dims(noise_var, axis=-2)
        return mu, var

    def compute(self, env, ctx):
        mu, var = self._moments(env)
        outcomes = {self.model.Y.uuid: (mu, var)}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class SVGPRegressionSamplingPrediction(SVGPRegressionMeanVariancePrediction):
    """Predictive sampling (reference :192-280)."""

    serving_data_axes = ((1,),)  # one (s, N, D) samples leaf

    def __init__(self, model, posterior, observed, rand_gen=None,
                 noise_free=True, diagonal_variance=True, jitter=0.0,
                 whitened=False):
        super().__init__(model=model, posterior=posterior, observed=observed,
                         noise_free=noise_free,
                         diagonal_variance=diagonal_variance, jitter=jitter,
                         whitened=whitened)
        from ...components.distributions.random_gen import default_rand_gen
        self._rand_gen = rand_gen if rand_gen is not None \
            else default_rand_gen()

    def compute(self, env, ctx):
        if self.diagonal_variance:
            mu, var = self._moments(env)
        else:
            # full predictive covariance feeds a Cholesky below: pin
            # HIGHEST even when data-side precision is relaxed globally
            with data_precision_scope("highest"):
                mu, var = self._moments(env)
        out_shape = (self.num_samples,) + mu.shape[1:]
        if self.diagonal_variance:
            die = self._rand_gen.sample_normal(
                ctx.next_key(), shape=out_shape,
                dtype=self.model.F.factor.dtype)
            var = jnp.maximum(var, 0.0)
            samples = mu + die * jnp.sqrt(var)
        else:
            cov = var
            Lc = jnp.linalg.cholesky(cov)
            Lc = broadcast_to_w_samples(
                Lc, out_shape[1:-1] + out_shape[-2:-1], self.num_samples)
            die = self._rand_gen.sample_normal(
                ctx.next_key(), shape=out_shape,
                dtype=self.model.F.factor.dtype)
            samples = mu + p_einsum("...ij,...jk->...ik", Lc, die)
        outcomes = {self.model.Y.uuid: samples}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class SVGPRegression(Module):
    """SVGP regression module (reference :283-457)."""

    def __init__(self, X, kernel, noise_var, inducing_inputs=None,
                 num_inducing=10, mean=None, rand_gen=None, dtype=None,
                 jitter=1e-5, whitened=False):
        self.jitter = jitter
        self.whitened = whitened
        if not isinstance(X, Variable):
            X = Variable(value=X)
        if not isinstance(noise_var, Variable):
            noise_var = Variable(value=noise_var)
        if inducing_inputs is None:
            inducing_inputs = Variable(
                shape=(num_inducing, kernel.input_dim),
                initial_value=np.random.randn(num_inducing,
                                              kernel.input_dim))
        inputs = [("X", X), ("inducing_inputs", inducing_inputs),
                  ("noise_var", noise_var)]
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
        self.set_outputs([Variable(shape=Y_shape)])

    def _build_module_graphs(self):
        Y = self.random_variable
        graph = Model(name="svgp_regression")
        graph.X = self.X.replicate_self()
        graph.inducing_inputs = self.inducing_inputs.replicate_self()
        M = self.inducing_inputs.shape[0]
        graph.noise_var = self.noise_var.replicate_self()
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
        graph.Y = Y.replicate_self()
        graph.Y.set_prior(Normal(
            mean=graph.F,
            variance=broadcast_to(graph.noise_var, graph.Y.shape),
            rand_gen=self._rand_gen, dtype=self.dtype))
        graph.kernel = graph.U.factor.kernel
        post = Posterior(graph)
        post.qU_cov_diag = Variable(
            shape=(M,), transformation=PositiveTransformation(),
            initial_value=np.ones(M) * 1e-6)
        post.qU_cov_W = Variable(shape=(M, M),
                                 initial_value=np.eye(M))
        post.qU_mean = Variable(shape=(M, Y.shape[-1]))
        return graph, [post]

    def _attach_default_inference_algorithms(self):
        observed = [v for _, v in self.inputs] + \
            [v for _, v in self.outputs]
        self.attach_log_pdf_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=SVGPRegressionLogPdf(
                self._module_graph, self._extra_graphs[0], observed,
                jitter=self.jitter, whitened=self.whitened),
            alg_name="svgp_log_pdf")
        observed = [v for _, v in self.inputs]
        self.attach_draw_samples_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=ForwardSamplingAlgorithm(self._module_graph, observed),
            alg_name="svgp_sampling")
        self.attach_prediction_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=SVGPRegressionMeanVariancePrediction(
                self._module_graph, self._extra_graphs[0], observed,
                jitter=self.jitter, whitened=self.whitened),
            alg_name="svgp_predict")

    @staticmethod
    def define_variable(X, kernel, noise_var, shape=None,
                        inducing_inputs=None, num_inducing=10, mean=None,
                        rand_gen=None, dtype=None, jitter=1e-5,
                        whitened=False):
        gp = SVGPRegression(
            X=X, kernel=kernel, noise_var=noise_var,
            inducing_inputs=inducing_inputs, num_inducing=num_inducing,
            mean=mean, rand_gen=rand_gen, dtype=dtype, jitter=jitter,
            whitened=whitened)
        gp._generate_outputs({"random_variable": shape})
        return gp.random_variable

    def replicate_self(self, attribute_map=None):
        rep = super().replicate_self(attribute_map)
        rep.kernel = self.kernel.replicate_self(attribute_map)
        if rep._module_graph is not None:
            # restore the non-component convenience attr lost by clone()
            rep._module_graph.kernel = \
                rep._module_graph.U.factor.kernel
        rep._has_mean = self._has_mean
        rep.jitter = self.jitter
        rep.whitened = self.whitened
        return rep
