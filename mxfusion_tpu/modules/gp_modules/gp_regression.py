"""Exact Gaussian-process regression module.

Reference: /root/reference/mxfusion/modules/gp_modules/gp_regression.py
(module :278-428, algorithms :31-275). Internal model:
``F ~ GP(X, kernel)``, ``Y ~ Normal(F, noise_var)``; the log_pdf
algorithm computes the *collapsed* Gaussian marginal likelihood via one
Cholesky, caching ``(X, L, LinvY)`` into the posterior graph through the
aux side-channel for prediction-time reuse. All linalg is XLA-batched
(cholesky + triangular solves on the MXU).
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
from ...components.functions.operators import broadcast_to
from ...inference.variational import VariationalInference
from ...inference.inference_alg import SamplingAlgorithm
from ...util.inference import realize_shape
from ...ops.linalg import broadcast_to_w_samples
from ...ops.precision import einsum as p_einsum
from ...ops.precision import data_precision_scope

LOG2PI = float(np.log(2.0 * np.pi))


def _noisy_K(kern, X, noise_var, kern_params, jitter=0.0):
    N = X.shape[-2]
    eye = jnp.eye(N, dtype=X.dtype)
    K = kern.K(X, **kern_params) + \
        jnp.expand_dims(eye, axis=0) * jnp.expand_dims(noise_var, axis=-2)
    if jitter > 0.0:
        K = K + jnp.expand_dims(eye, axis=0) * jitter
    return K


class GPRegressionLogPdf(VariationalInference):
    """Collapsed log marginal likelihood (reference gp_regression.py:31-76)."""

    def __init__(self, model, posterior, observed, jitter=0.0):
        super().__init__(num_samples=1, model=model, posterior=posterior,
                         observed=observed)
        self.log_pdf_scaling = 1.0
        self.jitter = jitter

    def compute(self, env, ctx):
        has_mean = self.model.F.factor.has_mean
        X = env[self.model.X]
        Y = env[self.model.Y]
        noise_var = env[self.model.noise_var]
        D = Y.shape[-1]
        kern = self.model.kernel
        kern_params = kern.fetch_parameters(env)
        X, Y, noise_var, kern_params = arrays_as_samples(
            [X, Y, noise_var, kern_params])
        K = _noisy_K(kern, X, noise_var, kern_params, self.jitter)
        L = jnp.linalg.cholesky(K)
        if has_mean:
            Y = Y - env[self.model.mean]
        LinvY = jsl.solve_triangular(L, Y, lower=True)
        logdet_l = jnp.sum(jnp.log(jnp.abs(
            jnp.diagonal(L, axis1=-2, axis2=-1))), axis=-1)
        tmp = jnp.sum(jnp.reshape(jnp.square(LinvY) + LOG2PI,
                                  (Y.shape[0], -1)), axis=-1)
        logL = (-logdet_l * D - tmp / 2.0) * self.log_pdf_scaling
        self.set_parameter(ctx, self.posterior.X, X[0])
        self.set_parameter(ctx, self.posterior.L, L[0])
        self.set_parameter(ctx, self.posterior.LinvY, LinvY[0])
        return logL


class GPRegressionSampling(SamplingAlgorithm):
    """Prior sampling (reference gp_regression.py:79-135)."""

    def __init__(self, model, observed, num_samples=1, target_variables=None,
                 rand_gen=None, jitter=0.0):
        super().__init__(model=model, observed=observed,
                         num_samples=num_samples,
                         target_variables=target_variables)
        from ...components.distributions.random_gen import default_rand_gen
        self._rand_gen = rand_gen if rand_gen is not None \
            else default_rand_gen()
        self.jitter = jitter

    def compute(self, env, ctx):
        has_mean = self.model.F.factor.has_mean
        X = env[self.model.X]
        noise_var = env[self.model.noise_var]
        kern = self.model.kernel
        kern_params = kern.fetch_parameters(env)
        X, noise_var, kern_params = arrays_as_samples(
            [X, noise_var, kern_params])
        K = _noisy_K(kern, X, noise_var, kern_params, self.jitter)
        L = jnp.linalg.cholesky(K)
        Y_shape = realize_shape(self.model.Y.shape, env)
        out_shape = (self.num_samples,) + Y_shape
        L = broadcast_to_w_samples(L, out_shape[1:-1] + out_shape[-2:-1],
                                   self.num_samples)
        die = self._rand_gen.sample_normal(
            ctx.next_key(), shape=out_shape,
            dtype=self.model.F.factor.dtype)
        y_samples = p_einsum("...ij,...jk->...ik", L, die)
        if has_mean:
            y_samples = y_samples + env[self.model.mean]
        samples = {self.model.Y.uuid: y_samples}
        if self.target_variables:
            return tuple(samples[v] for v in self.target_variables)
        return samples


class GPRegressionMeanVariancePrediction(SamplingAlgorithm):
    """Posterior predictive moments from the cached (X, L, LinvY)
    (reference gp_regression.py:138-196)."""

    def __init__(self, model, posterior, observed, noise_free=True,
                 diagonal_variance=True):
        super().__init__(model=model, observed=observed,
                         extra_graphs=[posterior])
        self.noise_free = noise_free
        self.diagonal_variance = diagonal_variance

    @property
    def serving_data_axes(self):
        # (s, N, D) mean + (s, N, 1) diag var | (s, N, N) covariance
        return ((1,), (1,)) if self.diagonal_variance \
            else ((1,), (1, 2))

    def _predictive_moments(self, env):
        has_mean = self.model.F.factor.has_mean
        X = env[self.model.X]
        N = X.shape[-2]
        noise_var = env[self.model.noise_var]
        posterior = self._extra_graphs[0]
        X_cond = env[posterior.X]
        L = env[posterior.L]
        LinvY = env[posterior.LinvY]
        kern = self.model.kernel
        kern_params = kern.fetch_parameters(env)
        X, noise_var, X_cond, L, LinvY, kern_params = arrays_as_samples(
            [X, noise_var, X_cond, L, LinvY, kern_params])
        Kxt = kern.K(X_cond, X, **kern_params)
        LinvKxt = jsl.solve_triangular(L, Kxt, lower=True)
        mu = p_einsum("...mn,...md->...nd", LinvKxt, LinvY)
        if has_mean:
            mu = mu + env[self.model.mean]
        if self.diagonal_variance:
            Ktt = kern.Kdiag(X, **kern_params)
            var = Ktt - jnp.sum(jnp.square(LinvKxt), axis=-2)
            if not self.noise_free:
                var = var + noise_var
        else:
            Ktt = kern.K(X, **kern_params)
            var = Ktt - p_einsum("...mn,...mk->...nk", LinvKxt, LinvKxt)
            if not self.noise_free:
                var = var + jnp.expand_dims(
                    jnp.eye(N, dtype=X.dtype), axis=0) * \
                    jnp.expand_dims(noise_var, axis=-2)
        return mu, var, noise_var

    def compute(self, env, ctx):
        mu, var, _ = self._predictive_moments(env)
        outcomes = {self.model.Y.uuid: (mu, var)}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class GPRegressionSamplingPrediction(GPRegressionMeanVariancePrediction):
    """Posterior predictive sampling (reference gp_regression.py:199-275)."""

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
            mu, var, _ = self._predictive_moments(env)
        else:
            # full predictive covariance feeds a Cholesky below: pin
            # HIGHEST even when data-side precision is relaxed globally
            with data_precision_scope("highest"):
                mu, var, _ = self._predictive_moments(env)
        out_shape = (self.num_samples,) + mu.shape[1:]
        if self.diagonal_variance:
            die = self._rand_gen.sample_normal(
                ctx.next_key(), shape=out_shape,
                dtype=self.model.F.factor.dtype)
            # clamp: tiny negative variances at training inputs (f32)
            var = jnp.maximum(var, 0.0)
            samples = mu + die * jnp.sqrt(jnp.expand_dims(var, axis=-1))
        else:
            cov = var
            if self.jitter > 0.0:
                cov = cov + jnp.eye(cov.shape[-1], dtype=cov.dtype) * \
                    self.jitter
            L = jnp.linalg.cholesky(cov)
            L = broadcast_to_w_samples(
                L, out_shape[1:-1] + out_shape[-2:-1], self.num_samples)
            die = self._rand_gen.sample_normal(
                ctx.next_key(), shape=out_shape,
                dtype=self.model.F.factor.dtype)
            samples = mu + p_einsum("...ij,...jk->...ik", L, die)
        outcomes = {self.model.Y.uuid: samples}
        if self.target_variables:
            return tuple(outcomes[v] for v in self.target_variables)
        return outcomes


class GPRegression(Module):
    """GP regression with Gaussian likelihood (reference :278-428)."""

    def __init__(self, X, kernel, noise_var, mean=None, rand_gen=None,
                 dtype=None, jitter=0.0):
        # jitter stabilizes the PRIOR sampling path's Cholesky (the
        # marginal-likelihood/prediction algebra is already regularized
        # by the noise variance and keeps jitter=0 by default)
        self.jitter = jitter
        if not isinstance(X, Variable):
            X = Variable(value=X)
        if not isinstance(noise_var, Variable):
            noise_var = Variable(value=noise_var)
        inputs = [("X", X), ("noise_var", noise_var)]
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

    def _generate_outputs(self, output_shapes):
        if output_shapes["random_variable"] is None:
            Y_shape = self.X.shape[:-1] + (1,)
        else:
            Y_shape = output_shapes["random_variable"]
        self.set_outputs([Variable(shape=Y_shape)])

    def _build_module_graphs(self):
        Y = self.random_variable
        graph = Model(name="gp_regression")
        graph.X = self.X.replicate_self()
        graph.noise_var = self.noise_var.replicate_self()
        mean = None
        if self._has_mean:
            graph.mean = self.mean.replicate_self()
            mean = graph.mean
        graph.F = GaussianProcess.define_variable(
            X=graph.X, kernel=self.kernel, shape=Y.shape, mean=mean,
            rand_gen=self._rand_gen, dtype=self.dtype, jitter=self.jitter)
        graph.Y = Y.replicate_self()
        graph.Y.set_prior(Normal(
            mean=graph.F,
            variance=broadcast_to(graph.noise_var, graph.Y.shape),
            rand_gen=self._rand_gen, dtype=self.dtype))
        graph.kernel = graph.F.factor.kernel
        # posterior graph = prediction-time cache of (X, L, LinvY)
        post = Posterior(graph)
        post.L = Variable(shape=graph.X.shape[:-1] + graph.X.shape[-2:-1])
        post.LinvY = Variable(shape=graph.X.shape[:-1] + graph.Y.shape[-1:])
        post.X = Variable(shape=graph.X.shape)
        self._cache_variables = [post.L, post.LinvY, post.X]
        return graph, [post]

    def _attach_default_inference_algorithms(self):
        observed = [v for _, v in self.inputs] + \
            [v for _, v in self.outputs]
        self.attach_log_pdf_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=GPRegressionLogPdf(self._module_graph,
                                         self._extra_graphs[0], observed),
            alg_name="gp_log_pdf")
        observed = [v for _, v in self.inputs]
        self.attach_draw_samples_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=GPRegressionSampling(self._module_graph, observed,
                                           rand_gen=self._rand_gen),
            alg_name="gp_sampling")
        self.attach_prediction_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=GPRegressionMeanVariancePrediction(
                self._module_graph, self._extra_graphs[0], observed),
            alg_name="gp_predict")

    @staticmethod
    def define_variable(X, kernel, noise_var, shape=None, mean=None,
                        rand_gen=None, dtype=None, jitter=0.0):
        gp = GPRegression(X=X, kernel=kernel, noise_var=noise_var, mean=mean,
                          rand_gen=rand_gen, dtype=dtype, jitter=jitter)
        gp._generate_outputs({"random_variable": shape})
        return gp.random_variable

    def replicate_self(self, attribute_map=None):
        rep = super().replicate_self(attribute_map)
        rep.kernel = self.kernel.replicate_self(attribute_map)
        if rep._module_graph is not None:
            # restore the non-component convenience attr lost by clone()
            rep._module_graph.kernel = \
                rep._module_graph.F.factor.kernel
        rep._has_mean = self._has_mean
        rep.jitter = self.jitter
        return rep
