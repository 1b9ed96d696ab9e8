"""Generate the narrative notebook renders of the top tutorials.

The reference ships its tutorials as Jupyter notebooks
(/root/reference/examples/notebooks/); this repo's canonical tutorial
form is tested .py scripts (examples/, smoke-run by
tests/examples/test_examples.py). For docs parity, this script renders
the top three as .ipynb with narrative markdown. Regenerate with:

    python examples/notebooks/generate.py
"""
import json
import os
import uuid

HERE = os.path.dirname(os.path.abspath(__file__))


def md(text):
    return {"cell_type": "markdown", "metadata": {},
            "id": uuid.uuid4().hex[:8],
            "source": text.splitlines(keepends=True)}


def code(text):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "id": uuid.uuid4().hex[:8], "outputs": [],
            "source": text.strip("\n").splitlines(keepends=True)}


def write(name, cells):
    nb = {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.10"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    path = os.path.join(HERE, name)
    with open(path, "w") as f:
        json.dump(nb, f, indent=1)
    print("wrote", path)


# ---------------------------------------------------------------- 1
write("getting_started.ipynb", [
    md("""# Getting started with mxfusion_tpu

`mxfusion_tpu` is a TPU-native probabilistic programming framework
(JAX/XLA/Pallas) with the modeling surface of MXFusion. This tutorial
estimates the mean and variance of noisy observations with a
mean-field variational posterior trained by reparameterized SVI —
the counterpart of the reference's `getting_started.ipynb`.

A model is a factor graph: attach variables to a `Model`, give random
variables distributions, and the graph is built for you."""),
    code("""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.components.variables import PositiveTransformation

N = 100
rng = np.random.default_rng(0)
y = rng.standard_normal((N, 1)) * 2.0 + 3.0
"""),
    md("""## Model definition

`m.mu` is the unknown mean with a wide Normal prior; `m.s` is the
observation variance, constrained positive through a softplus
bijector (the optimizer works in unconstrained space). Explicit
`broadcast_to` stretches the scalar latents over the `(N, 1)` data
shape — broadcasting across data dims is explicit, as in the
reference framework."""),
    code("""
m = Model()
m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
m.s = Variable(transformation=PositiveTransformation(),
               initial_value=5.)
m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                             variance=broadcast_to(m.s, (N, 1)),
                             shape=(N, 1))
"""),
    md("""## Variational inference

`create_Gaussian_meanfield` builds the posterior factor graph —
an independent (transformed) Normal per latent, with the factor
family following each latent's support. The SVI objective and its
gradients compile to a single XLA program; the loop runs jitted adam
steps."""),
    code("""
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)

q = create_Gaussian_meanfield(model=m, observed=[m.y])
alg = StochasticVariationalInference(num_samples=10, model=m,
                                     posterior=q, observed=[m.y])
infr = GradBasedInference(inference_algorithm=alg)
infr.run(max_iter=500, learning_rate=0.1, y=y, verbose=True)
"""),
    md("""## Inspecting the posterior

Trained parameters live in `infr.params`, indexable by Variable
(transformations applied automatically)."""),
    code("""
mu_post = float(np.asarray(infr.params[q.mu.factor.mean]).ravel()[0])
s_post = float(np.asarray(infr.params[m.s]).ravel()[0])
print("posterior mean: {:.3f} (data mean {:.3f})".format(mu_post,
                                                         y.mean()))
print("noise variance: {:.3f} (data var {:.3f})".format(s_post,
                                                        y.var()))
"""),
    md("""## Posterior predictive sampling

`VariationalPosteriorForwardSampling` draws latents from the fitted
posterior and pushes them through the generative model."""),
    code("""
from mxfusion_tpu.inference import VariationalPosteriorForwardSampling

fwd = VariationalPosteriorForwardSampling(
    num_samples=200, observed=[], inherited_inference=infr,
    target_variables=[m.y])
(samples,) = fwd.run()
print("predictive sample mean: {:.3f}".format(
    float(np.asarray(samples).mean())))
"""),
])

# ---------------------------------------------------------------- 2
write("gp_regression.ipynb", [
    md("""# Exact Gaussian-process regression

Fit an RBF-kernel GP to noisy observations of `sin(x)` by maximizing
the collapsed marginal likelihood, then predict at test inputs —
the counterpart of the reference's `gp_regression.ipynb`. All the
linear algebra (kernel gram, Cholesky, solves) runs as batched MXU
operations pinned to full float32 precision (bf16 kernel matrices
would make the Cholesky NaN — the framework pins these paths for
you)."""),
    code("""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm,
    TransferInference, BatchInferenceLoop)

N = 60
rng = np.random.default_rng(0)
X = rng.random((N, 1)) * 4
Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
"""),
    md("""## Model

`GPRegression` is a Module: a factor-graph node whose log-density is
the collapsed GP marginal likelihood. `m.N` is a symbolic dimension,
bound to the data size at inference time (it stays static under
jit)."""),
    code("""
m = Model()
m.N = Variable()
m.X = Variable(shape=(m.N, 1))
m.noise_var = Variable(transformation=PositiveTransformation(),
                       initial_value=0.1)
m.Y = GPRegression.define_variable(
    X=m.X, kernel=RBF(input_dim=1, variance=1., lengthscale=1.),
    noise_var=m.noise_var, shape=(m.N, 1))
"""),
    md("""## Hyperparameter fitting

MAP over the module maximizes the marginal likelihood. The
`metrics_callback` receives per-step metrics (loss, gradient norm)
computed INSIDE the jitted step."""),
    code("""
history = []
loop = BatchInferenceLoop(
    metrics_callback=lambda i, mtr: history.append(mtr))
infr = GradBasedInference(
    inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
    grad_loop=loop)
infr.run(max_iter=300, learning_rate=0.05, X=X, Y=Y)

kernel = m.Y.factor._module_graph.kernel
print("lengthscale: {:.3f}, variance: {:.3f}, noise: {:.4f}".format(
    float(np.asarray(infr.params[kernel.lengthscale]).ravel()[0]),
    float(np.asarray(infr.params[kernel.variance]).ravel()[0]),
    float(np.asarray(infr.params[m.noise_var]).ravel()[0])))
"""),
    md("""## Prediction

`TransferInference` carries the trained parameters into a prediction
algorithm; the posterior Cholesky computed during training is cached
and reused. For production serving (compile once, stream requests),
see `mxfusion_tpu.inference.BatchedPredictor`."""),
    code("""
Xt = np.linspace(0, 4, 20)[:, None]
pred = TransferInference(ModulePredictionAlgorithm(
    model=m, observed=[m.X], target_variables=[m.Y.uuid]),
    infr_params=infr.params)
mu, var = pred.run(X=Xt)[0]
print("predictive mean abs error vs sin(x): {:.4f}".format(
    np.abs(np.asarray(mu)[0] - np.sin(Xt)).mean()))
"""),
])

# ---------------------------------------------------------------- 3
write("svgp_regression.ipynb", [
    md("""# Stochastic variational GP regression

Scalable GP regression with the uncollapsed Hensman ELBO: explicit
`q(U)` variational parameters over inducing points, minibatch SVI —
the counterpart of the reference's `svgp_regression.ipynb`. On a TPU
this is the production path: every bound term is a batched MXU
contraction, minibatches keep the per-step cost `O(M^2 B)`, and a
`DeviceMinibatchLoop` can run a whole epoch as one XLA program with
the dataset resident in HBM (see `examples/svgp_large_scale.py`)."""),
    code("""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, MinibatchInferenceLoop,
    ModulePredictionAlgorithm, TransferInference)

N, BATCH, M_INDUCING = 2000, 100, 20
rng = np.random.default_rng(0)
X = rng.random((N, 1)) * 4
Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1
"""),
    md("""## Model with inducing inputs

The inducing inputs are a trainable `(M, 1)` Variable; `q(U)` (mean
and covariance factors) is created inside the module's posterior
graph. `whitened=True` is also available for the GPflow-style
whitened parameterization."""),
    code("""
m = Model()
m.N = Variable()
m.X = Variable(shape=(m.N, 1))
m.noise_var = Variable(transformation=PositiveTransformation(),
                       initial_value=0.1)
Z0 = np.linspace(0, 4, M_INDUCING)[:, None]
m.Y = SVGPRegression.define_variable(
    X=m.X, kernel=RBF(input_dim=1, variance=1., lengthscale=1.),
    noise_var=m.noise_var, shape=(m.N, 1),
    inducing_inputs=Variable(shape=(M_INDUCING, 1),
                             initial_value=Z0))
"""),
    md("""## Minibatch SVI

`rv_scaling = N / BATCH` makes each minibatch loss an unbiased
estimator of the full ELBO. Every batch has the same shape (rollover
padding), so the step compiles exactly once."""),
    code("""
loop = MinibatchInferenceLoop(batch_size=BATCH,
                              rv_scaling={m.Y: N / BATCH})
infr = GradBasedInference(
    inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
    grad_loop=loop)
infr.run(max_iter=60, learning_rate=0.05, X=X, Y=Y)
"""),
    md("""## Prediction"""),
    code("""
Xt = np.linspace(0, 4, 20)[:, None]
pred = TransferInference(ModulePredictionAlgorithm(
    model=m, observed=[m.X], target_variables=[m.Y.uuid]),
    infr_params=infr.params)
mu, var = pred.run(X=Xt)[0]
print("predictive mean abs error vs sin(x): {:.4f}".format(
    np.abs(np.asarray(mu)[0] - np.sin(Xt)).mean()))
"""),
    md("""## Where to go next

* `examples/svgp_large_scale.py` — the 10^6-point workload: HBM-
  resident dataset, one XLA program per epoch (0.16 s/epoch on a
  v5e chip).
* `mxfusion_tpu.inference.NaturalGradientLoop` — natural-gradient
  updates on `q(U)` (~2 epochs ahead of adam on the large workload).
* `mxfusion_tpu.parallel` — data-parallel SVI over a device mesh.
* `docs/migrating_from_mxfusion.md` — the API mapping from the
  reference framework."""),
])
