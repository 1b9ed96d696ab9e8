"""Titsias-style collapsed sparse GP regression (variational DTC).

Reference: /root/reference/mxfusion/modules/gp_modules/
sparsegp_regression.py (bound :30-107, predictions :110-257, module
:258-430). Internal model adds inducing inputs Z with ``U ~ GP(Z)`` and
``F ~ CondGP(X | Z, U)``; the collapsed lower bound needs one M×M
Cholesky of Kuu and one of A = I + Kuf Kfu/σ² — both MXU-batched — and
caches ``(L, LA, wv)`` for prediction.
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..module import Module
from ...models.model import Model
from ...models.posterior import Posterior
from ...components.variables.variable import Variable
from ...components.variables.runtime_variable import arrays_as_samples
from ...components.distributions.normal import Normal
from ...components.distributions.gp.gp import GaussianProcess
from ...components.distributions.gp.cond_gp import \
    ConditionalGaussianProcess
from ...components.functions.operators import broadcast_to
from ...inference.variational import VariationalInference
from ...inference.inference_alg import SamplingAlgorithm
from ...inference.forward_sampling import ForwardSamplingAlgorithm
from ...ops.linalg import broadcast_to_w_samples, \
    wide_triangular_solve
from ...ops.precision import einsum as p_einsum
from ...ops.precision import data_precision_scope

LOG2PI = float(np.log(2.0 * np.pi))


class SparseGPRegressionLogPdf(VariationalInference):
    """Collapsed variational bound (reference sparsegp_regression.py:30-107)."""

    def __init__(self, model, posterior, observed, jitter=0.0):
        super().__init__(num_samples=1, model=model, posterior=posterior,
                         observed=observed)
        self.log_pdf_scaling = 1.0
        self.jitter = jitter

    def compute(self, env, ctx):
        # the collapsed bound's A = I + LinvKuf LinvKufT / noise feeds a
        # Cholesky, so the globally relaxable data-side precision is
        # pinned back to HIGHEST for this whole computation
        with data_precision_scope("highest"):
            return self._compute_highest(env, ctx)

    def _compute_highest(self, env, ctx):
        has_mean = self.model.F.factor.has_mean
        X = env[self.model.X]
        Y = env[self.model.Y]
        Z = env[self.model.inducing_inputs]
        noise_var = env[self.model.noise_var]
        D = Y.shape[-1]
        M = Z.shape[-2]
        kern = self.model.kernel
        kern_params = kern.fetch_parameters(env)
        X, Y, Z, noise_var, kern_params = arrays_as_samples(
            [X, Y, Z, noise_var, kern_params])

        noise_var_m = jnp.expand_dims(noise_var, axis=-2)  # (s,1,1)
        eye_m = jnp.expand_dims(jnp.eye(M, dtype=Z.dtype), axis=0)

        Kuu = kern.K(Z, **kern_params)
        if self.jitter > 0.0:
            Kuu = Kuu + eye_m * self.jitter
        Kuf = kern.K(Z, X, **kern_params)
        Kff_diag = kern.Kdiag(X, **kern_params)

        L = jnp.linalg.cholesky(Kuu)
        LinvKuf = wide_triangular_solve(L, Kuf, lower=True)

        A = eye_m + p_einsum("...mn,...kn->...mk",
                               LinvKuf, LinvKuf) / noise_var_m
        LA = jnp.linalg.cholesky(A)

        if has_mean:
            Y = Y - env[self.model.mean]
        LAInvLinvKufY = jsl.solve_triangular(
            LA, p_einsum("...mn,...nd->...md", LinvKuf, Y), lower=True)

        sumlogdiag_LA = jnp.sum(jnp.log(
            jnp.diagonal(LA, axis1=-2, axis2=-1)), axis=-1)
        logL = -D * sumlogdiag_LA
        logL = logL - jnp.sum(
            jnp.square(Y) / noise_var_m + LOG2PI + jnp.log(noise_var_m),
            axis=(-2, -1)) / 2.0
        logL = logL + jnp.sum(
            jnp.square(LAInvLinvKufY) / (2.0 * jnp.square(noise_var_m)),
            axis=(-2, -1))
        logL = logL - D * jnp.sum(Kff_diag / (2.0 * noise_var), axis=-1)
        logL = logL + D * jnp.sum(
            jnp.square(LinvKuf) / (2.0 * noise_var_m), axis=(-2, -1))
        logL = logL * self.log_pdf_scaling

        wv = jsl.solve_triangular(
            L, jsl.solve_triangular(LA, LAInvLinvKufY, lower=True,
                                    trans="T"),
            lower=True, trans="T") / noise_var_m
        posterior = self._extra_graphs[0]
        self.set_parameter(ctx, posterior.wv, wv[0])
        self.set_parameter(ctx, posterior.L, L[0])
        self.set_parameter(ctx, posterior.LA, LA[0])
        return logL


class SparseGPRegressionMeanVariancePrediction(SamplingAlgorithm):
    """Predictive moments from cached (L, LA, wv) (reference :110-172)."""

    def __init__(self, model, posterior, observed, target_variables=None,
                 noise_free=True, diagonal_variance=True):
        super().__init__(model=model, observed=observed,
                         target_variables=target_variables,
                         extra_graphs=[posterior])
        self.noise_free = noise_free
        self.diagonal_variance = diagonal_variance

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
        L = env[posterior.L]
        LA = env[posterior.LA]
        wv = env[posterior.wv]
        kern = self.model.kernel
        kern_params = kern.fetch_parameters(env)
        X, Z, noise_var, L, LA, wv, kern_params = arrays_as_samples(
            [X, Z, noise_var, L, LA, wv, kern_params])

        Kxt = kern.K(Z, X, **kern_params)
        mu = p_einsum("...mn,...md->...nd", Kxt, wv)
        if has_mean:
            mu = mu + env[self.model.mean]
        LinvKxt = jsl.solve_triangular(L, Kxt, lower=True)
        LAinvLinvKxt = jsl.solve_triangular(LA, LinvKxt, lower=True)
        if self.diagonal_variance:
            Ktt = kern.Kdiag(X, **kern_params)
            var = Ktt - jnp.sum(jnp.square(LinvKxt), axis=-2) + \
                jnp.sum(jnp.square(LAinvLinvKxt), axis=-2)
            if not self.noise_free:
                var = var + noise_var
        else:
            Ktt = kern.K(X, **kern_params)
            var = Ktt - \
                p_einsum("...mn,...mk->...nk", LinvKxt, LinvKxt) + \
                p_einsum("...mn,...mk->...nk", LAinvLinvKxt,
                           LAinvLinvKxt)
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


class SparseGPRegressionSamplingPrediction(
        SparseGPRegressionMeanVariancePrediction):
    """Predictive sampling (reference :175-257)."""

    serving_data_axes = ((1,),)  # one (s, N, D) samples leaf

    def __init__(self, model, posterior, observed, rand_gen=None,
                 noise_free=True, diagonal_variance=True, jitter=0.0):
        super().__init__(model=model, posterior=posterior, observed=observed,
                         noise_free=noise_free,
                         diagonal_variance=diagonal_variance)
        from ...components.distributions.random_gen import default_rand_gen
        self._rand_gen = rand_gen if rand_gen is not None \
            else default_rand_gen()
        self.jitter = jitter

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
            samples = mu + die * jnp.sqrt(jnp.expand_dims(var, axis=-1))
        else:
            cov = var
            if self.jitter > 0.0:
                cov = cov + jnp.eye(cov.shape[-1], dtype=cov.dtype) * \
                    self.jitter
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


class SparseGPRegression(Module):
    """Sparse GP regression module (reference :258-430)."""

    def __init__(self, X, kernel, noise_var, inducing_inputs=None,
                 num_inducing=10, mean=None, rand_gen=None, dtype=None,
                 jitter=1e-5):
        self.jitter = jitter
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
        graph = Model(name="sparsegp_regression")
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
        post.L = Variable(shape=(M, M))
        post.LA = Variable(shape=(M, M))
        post.wv = Variable(shape=(M, Y.shape[-1]))
        self._cache_variables = [post.L, post.LA, post.wv]
        return graph, [post]

    def _attach_default_inference_algorithms(self):
        observed = [v for _, v in self.inputs] + \
            [v for _, v in self.outputs]
        self.attach_log_pdf_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=SparseGPRegressionLogPdf(
                self._module_graph, self._extra_graphs[0], observed,
                jitter=self.jitter),
            alg_name="sgp_log_pdf")
        observed = [v for _, v in self.inputs]
        self.attach_draw_samples_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=ForwardSamplingAlgorithm(self._module_graph, observed),
            alg_name="sgp_sampling")
        self.attach_prediction_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=SparseGPRegressionMeanVariancePrediction(
                self._module_graph, self._extra_graphs[0], observed),
            alg_name="sgp_predict")

    @staticmethod
    def define_variable(X, kernel, noise_var, shape=None,
                        inducing_inputs=None, num_inducing=10, mean=None,
                        rand_gen=None, dtype=None, jitter=1e-5):
        gp = SparseGPRegression(
            X=X, kernel=kernel, noise_var=noise_var,
            inducing_inputs=inducing_inputs, num_inducing=num_inducing,
            mean=mean, rand_gen=rand_gen, dtype=dtype, jitter=jitter)
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
        return rep
