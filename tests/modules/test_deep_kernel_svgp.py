"""Deep kernel learning: a Flax feature extractor feeding a GP module.

Composition test (no reference counterpart — the reference cannot feed
a Gluon block's output into a GP module's X input because its GP
modules require raw variables; here the module's X is just another env
value, so NN features compose for free). The NN weights and the GP
hyperparameters train jointly through one jitted objective."""
import numpy as np
import jax
import flax.linen as nn

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.functions import FlaxFunction
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm, TransferInference)

N, H, F = 96, 8, 2


class FeatureNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(H)(x))
        return nn.Dense(F)(x)


def _build(n_rows):
    m = Model()
    m.X_raw = Variable(shape=(n_rows, 3))
    net = FlaxFunction(FeatureNet(), name="feat",
                      input_shapes=[(n_rows, 3)])
    m.features = net(m.X_raw)
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.05)
    Z0 = np.random.default_rng(3).standard_normal((10, F)) * 0.5
    m.Y = SVGPRegression.define_variable(
        X=m.features, kernel=RBF(input_dim=F, variance=1.0,
                                 lengthscale=1.0),
        noise_var=m.noise_var, shape=(n_rows, 1),
        inducing_inputs=Variable(shape=(10, F), initial_value=Z0))
    return m


def test_deep_kernel_svgp_trains_jointly():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, 3))
    # target depends on a 1-D nonlinear projection: exactly what a
    # learned feature map should recover
    proj = X @ np.array([1.0, -2.0, 0.5])
    y = (np.sin(proj) + 0.1 * rng.standard_normal(N))[:, None]

    m = _build(N)
    infr = GradBasedInference(MAP(model=m, observed=[m.X_raw, m.Y]))
    losses = []
    infr.run(X_raw=X, Y=y, max_iter=400, learning_rate=0.01,
             verbose=False,
             callback=lambda i, l: losses.append(float(np.asarray(l))))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] - 10.0, (losses[0], losses[-1])

    # NN weights must actually have moved (joint training, not frozen)
    net_fac = m.features.factor
    moved = []
    for pname, pvar in net_fac.function.parameters.items():
        v = np.asarray(infr.params[pvar])
        moved.append(v)
    assert any(np.abs(v).max() > 0 for v in moved)

    # prediction through the same composed graph
    pred0 = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X_raw], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, var = pred0.run(X_raw=X)[0]
    mu = np.asarray(mu)[0, :, 0]
    resid = mu - y[:, 0]
    assert np.sqrt((resid ** 2).mean()) < 0.5
