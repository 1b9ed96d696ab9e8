"""DataParallelMinibatchLoop test on the virtual 8-device mesh."""
import numpy as np

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)
from mxfusion_tpu.parallel import make_mesh, DataParallelMinibatchLoop

N = 640
B = 160  # divisible by the 8-device mesh


def test_dp_minibatch_loop_converges():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * 2.0 + 3.0
    m = Model()
    m.n = Variable()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (m.n, 1)),
                                 variance=broadcast_to(m.s, (m.n, 1)),
                                 shape=(m.n, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=8, model=m,
                                         posterior=q, observed=[m.y])
    mesh = make_mesh(8)
    loop = DataParallelMinibatchLoop(mesh, batch_size=B,
                                     rv_scaling={m.y: N / B})
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop)
    infr.run(max_iter=40, learning_rate=0.1, y=y)
    mu_post = np.asarray(infr.params[q.mu.factor.mean]).item()
    assert abs(mu_post - y.mean()) < 0.5
