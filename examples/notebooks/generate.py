"""Generate the narrative notebook renders of the tutorials.

The reference ships its tutorials as 8 Jupyter notebooks
(/root/reference/examples/notebooks/); this repo's canonical tutorial
form is tested .py scripts (examples/, smoke-run by
tests/examples/test_examples.py). For docs parity, this script renders
all 8 topics as .ipynb with narrative markdown. Regenerate with:

    python examples/notebooks/generate.py            # cells only
    python examples/notebooks/generate.py --execute  # + embed outputs

--execute runs every code cell (shared namespace per notebook, CPU
platform, fixed seeds) and embeds the captured stdout as real executed
outputs, like the reference's committed notebooks.
"""
import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WRITTEN = []


def _cell_id(text):
    """Deterministic cell id (hash of the source): regeneration is
    idempotent, so adding one notebook never churns the ids of the
    other committed notebooks with spurious diffs."""
    return hashlib.sha256(text.encode()).hexdigest()[:8]


def md(text):
    return {"cell_type": "markdown", "metadata": {},
            "id": _cell_id(text),
            "source": text.splitlines(keepends=True)}


def code(text):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "id": _cell_id(text), "outputs": [],
            "source": text.strip("\n").splitlines(keepends=True)}


def _dedupe_ids(cells):
    """nbformat 4.5 requires per-notebook UNIQUE cell ids; two cells
    with identical source would hash to the same id. Salt repeats with
    their occurrence index — still deterministic, so regeneration stays
    idempotent."""
    seen = {}
    for cell in cells:
        cid = cell["id"]
        n = seen.get(cid, 0)
        seen[cid] = n + 1
        if n:
            cell["id"] = _cell_id("{}#{}".format(cid, n))
    return cells


def write(name, cells):
    nb = {
        "cells": _dedupe_ids(cells),
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
    WRITTEN.append(name)
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

# ---------------------------------------------------------------- 4
write("ppca_tutorial.ipynb", [
    md("""# Probabilistic PCA

Learn a 2-D latent representation of 5-D synthetic data with
probabilistic PCA trained by reparameterized SVI — the counterpart of
the reference's `ppca_tutorial.ipynb` (and the first BASELINE.json
ladder config). The latents get a meanfield Normal posterior; the
loading matrix and noise are point-estimated (MAP-style) alongside."""),
    code("""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import (broadcast_to,
                                                         dot)
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)

N, K, D = 100, 2, 5
rng = np.random.default_rng(0)
w_true = rng.standard_normal((K, D))
z_true = rng.standard_normal((N, K))
x = z_true @ w_true + rng.standard_normal((N, D)) * 0.1
"""),
    md("""## Model

`m.z` are the per-point latents with standard-Normal priors; `dot`
(a deterministic operator factor) projects them through the loading
matrix `m.w`; the observations are Normal around that projection.
Every operator is a factor-graph node, so the whole generative
density traces to one jaxpr."""),
    code("""
m = Model()
m.w = Variable(shape=(K, D),
               initial_value=rng.standard_normal((K, D)) * 0.1)
m.z = Normal.define_variable(
    mean=broadcast_to(Variable(value=0.), (N, K)),
    variance=broadcast_to(Variable(value=1.), (N, K)),
    shape=(N, K))
m.x_mean = dot(m.z, m.w)
m.noise = Variable(transformation=PositiveTransformation(),
                   initial_value=0.1)
m.x = Normal.define_variable(mean=m.x_mean,
                             variance=broadcast_to(m.noise, (N, D)),
                             shape=(N, D))
"""),
    md("""## Meanfield SVI

`create_Gaussian_meanfield` builds the posterior graph over every
unobserved random variable (here: `z`). The 5-sample reparameterized
ELBO estimator and adam updates compile into a single jitted step."""),
    code("""
q = create_Gaussian_meanfield(model=m, observed=[m.x])
alg = StochasticVariationalInference(num_samples=5, model=m,
                                     posterior=q, observed=[m.x])
infr = GradBasedInference(inference_algorithm=alg)
losses = []
infr.run(max_iter=1500, learning_rate=0.05, x=x,
         callback=lambda i, l: losses.append(float(l)))
print("loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))
"""),
    md("""## Reconstruction

The posterior mean of `z` times the learned loading matrix should
reproduce the data up to the noise floor (~0.1)."""),
    code("""
z_post = np.asarray(infr.params[q.z.factor.mean])
w_post = np.asarray(infr.params[m.w])
recon = z_post @ w_post
print("mean reconstruction error: {:.3f}".format(
    np.abs(recon - x).mean()))
"""),
])

# ---------------------------------------------------------------- 5
write("bnn_regression.ipynb", [
    md("""# Bayesian neural-network regression

A flax MLP with Normal priors over all weights, trained with meanfield
SVI; predictions by sampling the weight posterior — the counterpart of
the reference's `bnn_regression.ipynb` (which wraps a Gluon block;
here `FlaxFunction` wraps any flax `nn.Module` as a factor-graph
function, and the per-sample evaluation is a `vmap`, not a loop)."""),
    code("""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions import FlaxFunction
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield, VariationalPosteriorForwardSampling)

N = 80
rng = np.random.default_rng(0)
X = np.sort(rng.uniform(-3, 3, (N, 1)), axis=0)
Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(16)(x)
        x = jnp.tanh(x)
        return nn.Dense(1)(x)
"""),
    md("""## Model: priors over network weights

`FlaxFunction` lifts the MLP into the graph; its parameters become
latent Variables, and `set_prior` attaches a standard-Normal prior to
each (shapes broadcast automatically)."""),
    code("""
net = FlaxFunction(MLP(), name="f", input_shapes=[(N, 1)],
                   rng_key=jax.random.PRNGKey(0))
m = Model()
m.x = Variable(shape=(N, 1))
m.r = net(m.x)
for _, v in m.r.factor.function.parameters.items():
    v.set_prior(Normal(mean=broadcast_to(Variable(value=0.), v.shape),
                       variance=broadcast_to(Variable(value=1.),
                                             v.shape)))
m.noise = Variable(transformation=PositiveTransformation(),
                   initial_value=0.01)
m.y = Normal.define_variable(mean=m.r,
                             variance=broadcast_to(m.noise, (N, 1)),
                             shape=(N, 1))
"""),
    md("""## Meanfield SVI over the weights"""),
    code("""
q = create_Gaussian_meanfield(model=m, observed=[m.x, m.y])
alg = StochasticVariationalInference(num_samples=5, model=m,
                                     posterior=q,
                                     observed=[m.x, m.y])
infr = GradBasedInference(inference_algorithm=alg)
losses = []
infr.run(max_iter=800, learning_rate=0.02, x=X, y=Y,
         callback=lambda i, l: losses.append(float(l)))
print("loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))
"""),
    md("""## Posterior predictive

`VariationalPosteriorForwardSampling` draws weights from the fitted
posterior and pushes each draw through the network (vectorized over
the sample axis)."""),
    code("""
fwd = VariationalPosteriorForwardSampling(
    num_samples=100, observed=[m.x], inherited_inference=infr,
    target_variables=[m.y])
(samples,) = fwd.run(x=X)
pred_mean = np.asarray(samples).mean(axis=0)
print("posterior predictive mean abs error vs sin(x): {:.3f}".format(
    np.abs(pred_mean - np.sin(X)).mean()))
"""),
])

# ---------------------------------------------------------------- 6
write("bnn_classification.ipynb", [
    md("""# Bayesian neural-network classification

Two-moons binary classification with a Categorical likelihood over
MLP logits and Normal priors on the weights — the counterpart of the
reference's `bnn_classification.ipynb`."""),
    code("""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal, Categorical
from mxfusion_tpu.components.functions import FlaxFunction
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)

rng = np.random.default_rng(0)
n_half = 50
t = rng.uniform(0, np.pi, n_half)
upper = np.stack([np.cos(t), np.sin(t)], -1)
lower = np.stack([1 - np.cos(t), -np.sin(t) + 0.5], -1)
X = np.concatenate([upper, lower]) + rng.standard_normal(
    (2 * n_half, 2)) * 0.1
Y = np.concatenate([np.zeros(n_half), np.ones(n_half)])[:, None]
n = len(X)


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(16)(x)
        x = jnp.tanh(x)
        return nn.Dense(2)(x)
"""),
    md("""## Model

The network emits per-class scores; `Categorical` consumes them as
(normalized-inside) log-probabilities. Weight priors are standard
Normals, as in the regression tutorial."""),
    code("""
net = FlaxFunction(MLP(), name="f", input_shapes=[(n, 2)],
                   rng_key=jax.random.PRNGKey(0))
m = Model()
m.x = Variable(shape=(n, 2))
m.r = net(m.x)
for _, v in m.r.factor.function.parameters.items():
    v.set_prior(Normal(mean=broadcast_to(Variable(value=0.), v.shape),
                       variance=broadcast_to(Variable(value=1.),
                                             v.shape)))
m.y = Categorical.define_variable(log_prob=m.r, num_classes=2,
                                  shape=(n, 1))
"""),
    md("""## Meanfield SVI"""),
    code("""
q = create_Gaussian_meanfield(model=m, observed=[m.x, m.y])
alg = StochasticVariationalInference(num_samples=5, model=m,
                                     posterior=q,
                                     observed=[m.x, m.y])
infr = GradBasedInference(inference_algorithm=alg)
losses = []
infr.run(max_iter=600, learning_rate=0.02, x=X, y=Y,
         callback=lambda i, l: losses.append(float(l)))
print("loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))
"""),
    md("""## Decision quality at the posterior mean

Evaluate the network at the posterior-mean weights (`q[v]` indexes
the posterior graph by the model's weight variable)."""),
    code("""
params = {}
for name, v in m.r.factor.function.parameters.items():
    params[name] = jnp.asarray(
        np.asarray(infr.params[q[v].factor.mean]))
logits = m.r.factor.function.eval(params, f_input_0=jnp.asarray(X))
acc = float((np.asarray(logits).argmax(-1) == Y[:, 0]).mean())
print("train accuracy with posterior-mean weights: {:.3f}".format(acc))
"""),
])

# ---------------------------------------------------------------- 7
write("variational_auto_encoder.ipynb", [
    md("""# Variational auto-encoder

A flax decoder inside the generative model and a flax encoder inside
the variational posterior — amortized inference trained end-to-end by
reparameterized SVI. Counterpart of the reference's
`variational_auto_encoder.ipynb`."""),
    code("""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mxfusion_tpu import Model, Posterior, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions import FlaxFunction
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference)

N, D, K = 100, 8, 2
rng = np.random.default_rng(0)
z_true = rng.standard_normal((N, K))
proj = rng.standard_normal((K, D))
x = np.tanh(z_true @ proj) + rng.standard_normal((N, D)) * 0.05


class Decoder(nn.Module):
    out: int

    @nn.compact
    def __call__(self, z):
        h = jnp.tanh(nn.Dense(16)(z))
        return nn.Dense(self.out)(h)


class Encoder(nn.Module):
    latent: int

    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(nn.Dense(16)(x))
        mean = nn.Dense(self.latent)(h)
        log_var = nn.Dense(self.latent)(h)
        return mean, jnp.exp(log_var) + 1e-6
"""),
    md("""## Generative model: decoder inside the graph"""),
    code("""
decoder = FlaxFunction(Decoder(out=D), name="dec",
                       input_shapes=[(N, K)],
                       rng_key=jax.random.PRNGKey(0))
m = Model()
m.z = Normal.define_variable(
    mean=broadcast_to(Variable(value=0.), (N, K)),
    variance=broadcast_to(Variable(value=1.), (N, K)),
    shape=(N, K))
m.x_mean = decoder(m.z)
m.x = Normal.define_variable(
    mean=m.x_mean,
    variance=broadcast_to(Variable(value=0.01), (N, D)),
    shape=(N, D))
"""),
    md("""## Amortized posterior: encoder inside the Posterior graph

A `Posterior` replicates the model's variables; attaching the
encoder's outputs as `q(z)`'s mean/variance makes the variational
parameters a FUNCTION of the observed data (`num_outputs=2` splits
the flax module's tuple output into two graph variables)."""),
    code("""
encoder = FlaxFunction(Encoder(latent=K), name="enc",
                       input_shapes=[(N, D)], num_outputs=2,
                       rng_key=jax.random.PRNGKey(1))
q = Posterior(m)
q_mean, q_var = encoder(q.x)
q.z.set_prior(Normal(mean=q_mean, variance=q_var))
"""),
    md("""## Joint training

One SVI objective trains decoder weights (model side) and encoder
weights (posterior side) together."""),
    code("""
alg = StochasticVariationalInference(num_samples=3, model=m,
                                     posterior=q, observed=[m.x])
infr = GradBasedInference(inference_algorithm=alg)
losses = []
infr.run(max_iter=1000, learning_rate=0.01, x=x,
         callback=lambda i, l: losses.append(float(l)))
print("ELBO loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))
"""),
])

# ---------------------------------------------------------------- 8
write("writing_a_new_distribution.ipynb", [
    md("""# Writing a new distribution

Implement a Gumbel distribution — log-pdf plus reparameterized
sampling — and fit it by MAP, end-to-end. Counterpart of the
reference's `writing_a_new_distribution.ipynb`. (That notebook's
original exercise, an Exponential, already ships in
`mxfusion_tpu.components.distributions`, so the tutorial builds
something genuinely new.)

A distribution needs three things:

1. `__init__` declaring its input parameters,
2. `log_pdf_impl` — plain jax.numpy on arrays that already carry the
   leading sample axis,
3. `draw_samples_impl` — sampling through the key-threaded random
   generator; use the inverse CDF (or another pathwise form) and
   gradients flow to the parameters automatically.

Declare `support` if the variable lives on a constrained domain
(e.g. `"positive"`) so MCMC/MAP auto-biject it."""),
    code("""
import numpy as np
import jax.numpy as jnp

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions.distribution import \\
    UnivariateDistribution
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import GradBasedInference, MAP


class Gumbel(UnivariateDistribution):
    \"\"\"Gumbel(location, scale):
    log p(x) = -z - exp(-z) - log(scale), z = (x - location)/scale.\"\"\"

    def __init__(self, location, scale, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("location", location), ("scale", scale)],
            outputs=None,
            input_names=["location", "scale"],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)

    def log_pdf_impl(self, random_variable, location, scale):
        z = (random_variable - location) / scale
        return -z - jnp.exp(-z) - jnp.log(scale)

    def draw_samples_impl(self, rv_shape, num_samples, key, location,
                          scale):
        u = self._rand_gen.sample_uniform(
            key, shape=(num_samples,) + rv_shape, dtype=self.dtype)
        # inverse CDF, reparameterized: gradients flow to the params
        return location - scale * jnp.log(-jnp.log(u))

    @classmethod
    def define_variable(cls, location=0., scale=1., shape=None,
                        rand_gen=None, dtype=None):
        dist = cls(location=location, scale=scale, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
"""),
    md("""## Using it in a model

Nothing else is needed: the new distribution is a first-class factor.
Fit location and scale to 400 Gumbel draws by MAP (the positive scale
trains in softplus space via its transformation)."""),
    code("""
rng = np.random.default_rng(0)
true_loc, true_scale = 1.5, 0.8
y = rng.gumbel(true_loc, true_scale, (400, 1))

m = Model()
m.loc = Variable(initial_value=0.0)
m.scale = Variable(transformation=PositiveTransformation(),
                   initial_value=1.0)
m.y = Gumbel.define_variable(
    location=broadcast_to(m.loc, (400, 1)),
    scale=broadcast_to(m.scale, (400, 1)), shape=(400, 1))

infr = GradBasedInference(
    inference_algorithm=MAP(model=m, observed=[m.y]))
infr.run(max_iter=400, learning_rate=0.1, y=y)
print("MLE location: {:.3f} (true {})".format(
    float(np.asarray(infr.params[m.loc]).ravel()[0]), true_loc))
print("MLE scale:    {:.3f} (true {})".format(
    float(np.asarray(infr.params[m.scale]).ravel()[0]), true_scale))
"""),
    md("""## Where to go next

* `examples/writing_a_new_module.py` — the same exercise one level
  up: a new Module with its own inference algorithms.
* `tests/components/distributions/` — the KS/moment test pattern for
  validating a new distribution's sampler against scipy.
* `docs/design_documents/distributions.md` — the distribution layer's
  design (sample-axis conventions, support declarations, bijectors)."""),
])


# ---------------------------------------------------------------- 9
write("deep_gp.ipynb", [
    md("""# Deep Gaussian processes

Stack SVGP layers and train them jointly by doubly-stochastic
variational inference (Salimbeni & Deisenroth, 2017) — a capability
beyond the reference framework's module set. The target is a step
function: a stationary single-layer RBF GP smooths the jump, while the
2-layer stack learns an input warp that sharpens it.

TPU notes: the Monte-Carlo propagation samples ride the framework's
leading sample axis, so each layer is ONE batched evaluation (kernel
gram + batched triangular ops + MXU einsums over an `(S, N, D)`
block) — the whole training step is a single XLA program. The final
layer's Gaussian expected log-likelihood is analytic, so a 1-layer
`DeepGPRegression` reproduces the SVGP ELBO exactly."""),
    code("""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import DeepGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm,
    TransferInference)

N = 120
rng = np.random.default_rng(0)
X = np.sort(rng.random((N, 1)) * 4, axis=0)
truth = np.where(X > 2.0, 1.0, -1.0)
Y = truth + rng.standard_normal((N, 1)) * 0.05
"""),
    md("""## Model

One kernel per layer; layer widths follow the NEXT kernel's
`input_dim` (the final layer outputs Y's event width). Inner layers
carry fixed identity-like linear mean maps (the standard skip
connection that keeps the signal path open at initialization), the
whitened parameterization is the default, and `jitter` is RELATIVE to
each layer's kernel scale — deep training grows those scales
freely."""),
    code("""
m = Model()
m.n = Variable()
m.X = Variable(shape=(m.n, 1))
m.noise_var = Variable(transformation=PositiveTransformation(),
                       initial_value=0.1)
Z0 = np.linspace(0.2, 3.8, 8)[:, None]
Z1 = np.linspace(-1.2, 1.2, 8)[:, None]
m.Y = DeepGPRegression.define_variable(
    X=m.X, kernels=[RBF(input_dim=1), RBF(input_dim=1)],
    noise_var=m.noise_var, shape=(m.n, 1),
    inducing_inputs=[Variable(shape=Z0.shape, initial_value=Z0),
                     Variable(shape=Z1.shape, initial_value=Z1)],
    jitter=1e-5, num_samples=3)
"""),
    md("""## Training

MAP over the module maximizes the doubly-stochastic ELBO (the S=3
propagation samples average inside the loss)."""),
    code("""
infr = GradBasedInference(
    inference_algorithm=MAP(model=m, observed=[m.X, m.Y]))
losses = []
infr.run(max_iter=300, learning_rate=0.02, X=X, Y=Y,
         callback=lambda i, l: losses.append(float(l)))
print("loss: {:.1f} -> {:.1f}".format(losses[0], losses[-1]))
"""),
    md("""## Prediction

`predict` returns the Gaussian-mixture moments over the propagation
samples. An UNSET sample count uses the module's default (20); pass
`num_samples=...` to control the cost/variance trade-off explicitly
(an explicit 1 is honored as a cheap point estimate)."""),
    code("""
pred = TransferInference(ModulePredictionAlgorithm(
    model=m, observed=[m.X], target_variables=[m.Y.uuid],
    num_samples=50), infr_params=infr.params)
mu, var = pred.run(X=X)[0]
rmse = float(np.sqrt(np.mean((np.asarray(mu)[0] - truth) ** 2)))
print("RMSE vs the noiseless step: {:.3f}".format(rmse))
"""),
    md("""## Where to go next

* `DeepGPClassification` — the same stack with a Bernoulli likelihood
  (Gauss–Hermite expected log-likelihood, logit/probit links).
* `examples/deep_gp_regression.py` — this workload against a
  single-layer SVGP baseline.
* Serving: `BatchedPredictor` chunks deep-GP prediction like any
  other module (the mixture moments declare their serving axes)."""),
])


def execute_notebook(name):
    """Run every code cell in one shared namespace and embed captured
    stdout as executed outputs (the committed form matches how the
    reference ships its notebooks: with outputs)."""
    import contextlib
    import io

    path = os.path.join(HERE, name)
    with open(path) as f:
        nb = json.load(f)
    ns = {"__name__": "__notebook__"}
    count = 0
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        count += 1
        src = "".join(cell["source"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(compile(src, "{}[{}]".format(name, count), "exec"), ns)
        cell["execution_count"] = count
        text = buf.getvalue()
        cell["outputs"] = ([{"name": "stdout",
                             "output_type": "stream",
                             "text": text.splitlines(keepends=True)}]
                           if text else [])
    with open(path, "w") as f:
        json.dump(nb, f, indent=1)
    print("executed", path)


if "--execute" in sys.argv:
    sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))
    import jax
    jax.config.update("jax_platforms", "cpu")  # fast, deterministic
    for _name in WRITTEN:
        execute_notebook(_name)
