"""Writing a new Module: closed-form Bayesian linear regression.

The Module abstraction (the framework's flagship, mirroring
/root/reference/mxfusion/modules/module.py) is a factor that carries
its own specialized inference: calling ``log_pdf`` on it evaluates a
closed form or a bound instead of a naive density. This example builds
one from scratch:

    w ~ N(0, alpha I);  Y ~ N(X w, s2 I)

- ``log_pdf`` -> the EXACT log evidence log N(Y | 0, alpha X Xᵀ + s2 I)
  (w collapsed analytically — the module's whole point), so training
  the outer model with MAP does type-II maximum likelihood,
- sampling -> ancestral through the internal graph (w then Y).

Everything is standard library surface: subclass ``Module``, build the
internal graphs, attach algorithms.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from mxfusion_tpu import Model, Posterior, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.components.variables.runtime_variable import \
    arrays_as_samples
from mxfusion_tpu.modules import Module
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, InferenceAlgorithm,
    ForwardSamplingAlgorithm, create_executor)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N, D = 200, 4
MAX_ITER = 30 if SMOKE else 300
LOG2PI = float(np.log(2 * np.pi))


class LinRegLogEvidence(InferenceAlgorithm):
    """Exact collapsed marginal likelihood via the Cholesky of
    alpha X Xᵀ + s2 I (one batched factorization on the MXU)."""

    def __init__(self, model, observed):
        super().__init__(model=model, observed=observed)
        self.log_pdf_scaling = 1.0

    def compute(self, env, ctx):
        X = env[self.model.X]
        Y = env[self.model.Y]
        alpha = env[self.model.alpha]
        s2 = env[self.model.noise_var]
        X, Y, alpha, s2 = arrays_as_samples([X, Y, alpha, s2])
        n = X.shape[-2]
        # Cholesky-feeding contraction: pin HIGHEST precision (on TPU
        # a default bf16 matmul here can NaN the factorization)
        from mxfusion_tpu.ops.precision import einsum as p_einsum
        K = alpha[..., None] * p_einsum("...nd,...md->...nm", X, X) \
            + s2[..., None] * jnp.eye(n, dtype=X.dtype)
        L = jnp.linalg.cholesky(K)
        LinvY = jsl.solve_triangular(L, Y, lower=True)
        logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                         axis=-1)
        lp = -0.5 * n * LOG2PI - logdet \
            - 0.5 * jnp.sum(LinvY ** 2, axis=(-2, -1))
        return self.log_pdf_scaling * lp


class BayesianLinearRegression(Module):
    """w collapsed analytically; training fits alpha/s2 by exact
    evidence maximization (type-II ML) through plain
    GradBasedInference."""

    def __init__(self, X, alpha, noise_var, rand_gen=None, dtype=None):
        if not isinstance(X, Variable):
            X = Variable(value=X)
        inputs = [("X", X), ("alpha", alpha), ("noise_var", noise_var)]
        super().__init__(inputs=inputs, outputs=None,
                         input_names=[k for k, _ in inputs],
                         output_names=["random_variable"],
                         rand_gen=rand_gen, dtype=dtype)

    def _generate_outputs(self, output_shapes=None):
        Y_shape = output_shapes["random_variable"] \
            if output_shapes["random_variable"] is not None \
            else self.X.shape[:-1] + (1,)
        self.set_outputs([Variable(shape=Y_shape)])

    def _build_module_graphs(self):
        Y = self.random_variable
        graph = Model(name="bayes_linreg")
        graph.X = self.X.replicate_self()
        graph.alpha = self.alpha.replicate_self()
        graph.noise_var = self.noise_var.replicate_self()
        d = self.X.shape[-1]
        graph.w = Normal.define_variable(
            mean=broadcast_to(Variable(value=0.), (d, 1)),
            variance=broadcast_to(graph.alpha, (d, 1)), shape=(d, 1),
            rand_gen=self._rand_gen, dtype=self.dtype)
        graph.f = dot(graph.X, graph.w)
        graph.Y = Y.replicate_self()
        graph.Y.set_prior(Normal(
            mean=graph.f,
            variance=broadcast_to(graph.noise_var, graph.Y.shape),
            rand_gen=self._rand_gen, dtype=self.dtype))
        return graph, [Posterior(graph)]

    def _attach_default_inference_algorithms(self):
        observed_io = [v for _, v in self.inputs] + \
            [v for _, v in self.outputs]
        self.attach_log_pdf_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=LinRegLogEvidence(self._module_graph, observed_io),
            alg_name="linreg_evidence")
        observed_in = [v for _, v in self.inputs]
        self.attach_draw_samples_algorithms(
            targets=self.output_names, conditionals=self.input_names,
            algorithm=ForwardSamplingAlgorithm(self._module_graph,
                                               observed_in),
            alg_name="linreg_sampling")

    @staticmethod
    def define_variable(X, alpha, noise_var, shape=None, rand_gen=None,
                        dtype=None):
        mod = BayesianLinearRegression(X=X, alpha=alpha,
                                       noise_var=noise_var,
                                       rand_gen=rand_gen, dtype=dtype)
        mod._generate_outputs({"random_variable": shape})
        return mod.random_variable


def main():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D))
    w_true = np.array([1.0, -0.5, 0.25, 2.0])[:, None]
    s2_true = 0.09
    y = X @ w_true + rng.standard_normal((N, 1)) * np.sqrt(s2_true)

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.alpha = Variable(transformation=PositiveTransformation(),
                       initial_value=1.0)
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=1.0)
    m.Y = BayesianLinearRegression.define_variable(
        X=m.X, alpha=m.alpha, noise_var=m.noise_var, shape=(m.n, 1))

    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(alg)
    infr.run(X=X, Y=y, max_iter=MAX_ITER, learning_rate=0.1,
             verbose=False)
    s2_hat = float(np.asarray(infr.params[m.noise_var]).ravel()[0])
    a_hat = float(np.asarray(infr.params[m.alpha]).ravel()[0])
    print("evidence-maximized noise variance: {:.4f} (true {})".format(
        s2_hat, s2_true))

    # the module's log_pdf at the fit == scipy's exact evidence
    from scipy import stats
    ex = create_executor(alg, infr.params)
    loss, _, _ = ex(infr.params.trainable_params(),
                    infr.params.fixed_params(), [X, y],
                    jax.random.PRNGKey(0))
    K = a_hat * X @ X.T + s2_hat * np.eye(N)
    log_z = stats.multivariate_normal.logpdf(y[:, 0], np.zeros(N), K)
    print("log evidence (module): {:.3f}  (scipy: {:.3f})".format(
        -float(np.asarray(loss)), log_z))
    return s2_hat


if __name__ == "__main__":
    main()
