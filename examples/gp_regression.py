"""Exact GP regression with the GPRegression module.

Counterpart of /root/reference/examples/notebooks/gp_regression.ipynb:
fit kernel hyperparameters by maximizing the collapsed marginal
likelihood, then predict mean and variance at test inputs via the
cached Cholesky.
"""
import os
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import GPRegression
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, ModulePredictionAlgorithm, TransferInference,
    BatchInferenceLoop)

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N = 60
MAX_ITER = 30 if SMOKE else 300


def main():
    rng = np.random.default_rng(0)
    X = rng.random((N, 1)) * 4
    Y = np.sin(X) + rng.standard_normal((N, 1)) * 0.1

    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1., lengthscale=1.),
        noise_var=m.noise_var, shape=(m.N, 1))

    # structured per-step metrics (loss, grad global-norm computed
    # inside the jitted step; step wall time at host)
    history = []
    loop = BatchInferenceLoop(
        metrics_callback=lambda i, mtr: history.append(mtr))
    infr = GradBasedInference(
        inference_algorithm=MAP(model=m, observed=[m.X, m.Y]),
        grad_loop=loop)
    infr.run(max_iter=MAX_ITER, learning_rate=0.05, X=X, Y=Y,
             verbose=not SMOKE)
    print("first/last metrics: {} -> {}".format(
        {k: round(v, 4) for k, v in history[0].items()},
        {k: round(v, 4) for k, v in history[-1].items()}))
    kernel = m.Y.factor._module_graph.kernel
    print("lengthscale: {:.3f}, variance: {:.3f}, noise: {:.4f}".format(
        float(np.asarray(infr.params[kernel.lengthscale]).ravel()[0]),
        float(np.asarray(infr.params[kernel.variance]).ravel()[0]),
        float(np.asarray(infr.params[m.noise_var]).ravel()[0])))

    Xt = np.linspace(0, 4, 20)[:, None]
    pred = TransferInference(ModulePredictionAlgorithm(
        model=m, observed=[m.X], target_variables=[m.Y.uuid]),
        infr_params=infr.params)
    mu, var = pred.run(X=Xt)[0]
    err = np.abs(np.asarray(mu)[0] - np.sin(Xt)).mean()
    print("predictive mean abs error vs sin(x): {:.4f}".format(err))
    return err


if __name__ == "__main__":
    main()
