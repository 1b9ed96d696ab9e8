"""Data-parallel SVI over a device mesh (new TPU capability).

No counterpart exists in the reference — it is single-device. This
example shards the observed data over all available devices (ICI on a
TPU slice, or a virtual CPU mesh with
``XLA_FLAGS=--xla_force_host_platform_device_count=8``); parameters are
replicated and XLA/GSPMD inserts the gradient collectives.
"""
import os
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)
from mxfusion_tpu.parallel import make_mesh, DataParallelBatchLoop

SMOKE = bool(os.environ.get("MXF_SMOKE"))
N = 1600
MAX_ITER = 30 if SMOKE else 300


def main():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0

    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(m.s, (N, 1)),
                                 shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q, observed=[m.y])

    mesh = make_mesh()
    print("mesh devices:", mesh.devices.size)
    infr = GradBasedInference(inference_algorithm=alg,
                              grad_loop=DataParallelBatchLoop(mesh))
    infr.run(max_iter=MAX_ITER, learning_rate=0.1, y=y)
    mu_post = float(np.asarray(infr.params[q.mu.factor.mean]).ravel()[0])
    print("posterior mean: {:.3f} (data mean {:.3f})".format(
        mu_post, y.mean()))
    return mu_post


if __name__ == "__main__":
    main()
