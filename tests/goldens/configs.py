"""Golden ELBO-trajectory configs (BASELINE.json ladder).

Each function builds one ladder config end-to-end through the public
API in float64 with fixed seeds/keys and returns the loss trajectory as
a 1-D float64 numpy array. The trajectories are frozen once into
``tests/goldens/golden_<name>.npz`` (see ``generate.py``) and every
future run must match them to 1e-5 rtol — the operational form of the
north star's "matches the reference ELBO trajectory to 1e-5"
(BASELINE.json) in an environment where MXNet/GPy cannot run. This is
the trajectory-level analogue of the reference's GPy-oracle tier
(/root/reference/testing/modules/gpregression_test.py:82-109).

Determinism notes: everything runs float64 on the CPU backend with
fixed jax PRNG keys; the SVGP config uses DeviceMinibatchLoop so the
epoch permutation comes from jax.random (bit-stable) rather than the
host batcher (whose native/numpy fallback permutations differ).
"""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.common import config as mxf_config
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import (
    GradBasedInference, MAP, StochasticVariationalInference,
    create_Gaussian_meanfield)
from mxfusion_tpu.inference.device_loop import DeviceMinibatchLoop
from mxfusion_tpu.modules import GPRegression, SVGPRegression


def _f64(fn):
    """Run ``fn`` with the framework default dtype pinned to float64."""
    def wrapper():
        prev = mxf_config.get_default_dtype()
        mxf_config.set_default_dtype("float64")
        try:
            return np.asarray(fn(), dtype=np.float64)
        finally:
            mxf_config.set_default_dtype(prev)
    wrapper.__name__ = fn.__name__
    return wrapper


@_f64
def ppca_svi():
    """PPCA via reparameterized SVI, meanfield posterior (config 1)."""
    N, K, D = 60, 2, 5
    rng = np.random.default_rng(0)
    w_true = rng.standard_normal((K, D))
    z_true = rng.standard_normal((N, K))
    x = z_true @ w_true + rng.standard_normal((N, D)) * 0.1

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
    q = create_Gaussian_meanfield(model=m, observed=[m.x])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q, observed=[m.x])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    losses = []
    infr.run(max_iter=50, learning_rate=0.05, x=x,
             key=jax.random.PRNGKey(11),
             callback=lambda i, l: losses.append(float(l)))
    return losses


@_f64
def meanfield_linreg():
    """Bayesian linear regression, meanfield Normal posterior (config 2)."""
    N, D = 80, 3
    rng = np.random.default_rng(1)
    X = rng.standard_normal((N, D))
    w_true = np.array([[1.5], [-0.7], [0.3]])
    y = X @ w_true + rng.standard_normal((N, 1)) * 0.1

    m = Model()
    m.X = Variable(shape=(N, D))
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (D, 1)),
        variance=broadcast_to(Variable(value=1.), (D, 1)),
        shape=(D, 1))
    m.f = dot(m.X, m.w)
    m.noise = Variable(transformation=PositiveTransformation(),
                       initial_value=0.1)
    m.y = Normal.define_variable(mean=m.f,
                                 variance=broadcast_to(m.noise, (N, 1)),
                                 shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.X, m.y])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q,
                                         observed=[m.X, m.y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    losses = []
    infr.run(max_iter=50, learning_rate=0.05, X=X, y=y,
             key=jax.random.PRNGKey(12),
             callback=lambda i, l: losses.append(float(l)))
    return losses


@_f64
def gp_exact_1k():
    """Exact GPRegression, RBF kernel, 1k points (config 3)."""
    N, D = 1000, 1
    rng = np.random.default_rng(2)
    X = rng.random((N, D)) * 4
    y = np.sin(X[:, :1] * 2) + rng.standard_normal((N, 1)) * 0.1

    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    kernel = RBF(input_dim=D, variance=1.0, lengthscale=1.0,
                 dtype="float64")
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, 1),
        dtype="float64")
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg, dtype="float64")
    losses = []
    infr.run(max_iter=50, learning_rate=0.02, X=X, Y=y,
             key=jax.random.PRNGKey(13),
             callback=lambda i, l: losses.append(float(l)))
    return losses


@_f64
def svgp_minibatch():
    """SVGPRegression minibatch SVI, on-device epoch loop (config 4);
    trajectory = per-epoch mean losses."""
    N, D, M, B = 2000, 2, 16, 256
    rng = np.random.default_rng(3)
    X = rng.random((N, D)) * 4
    y = (np.sin(X[:, :1]) + np.cos(X[:, 1:2])
         + rng.standard_normal((N, 1)) * 0.1)
    Z0 = rng.random((M, D)) * 4

    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    kernel = RBF(input_dim=D, variance=1.0, lengthscale=1.0,
                 dtype="float64")
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.N, 1),
        inducing_inputs=Variable(shape=(M, D), initial_value=Z0),
        dtype="float64")
    alg = MAP(model=m, observed=[m.X, m.Y])
    loop = DeviceMinibatchLoop(batch_size=B,
                               rv_scaling={m.Y: N / B})
    infr = GradBasedInference(inference_algorithm=alg, grad_loop=loop,
                              dtype="float64")
    losses = []
    infr.run(max_iter=12, learning_rate=0.02, X=X, Y=y,
             key=jax.random.PRNGKey(14),
             callback=lambda e, l: losses.append(float(l)))
    return losses


@_f64
def svgp_classification():
    """Binary SVGP classification: quadrature ELBO, whitened q(U)
    (r3 module; pins the quadrature bound + relative jitter)."""
    from mxfusion_tpu.modules import SVGPClassification
    N, M = 96, 8
    rng = np.random.default_rng(21)
    X = rng.random((N, 1)) * 4
    p = 1.0 / (1.0 + np.exp(-3.0 * np.sin(2.0 * X[:, :1])))
    y = (rng.random((N, 1)) < p).astype(np.float64)
    Z0 = np.linspace(0.1, 3.9, M)[:, None]

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.Y = SVGPClassification.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.5, lengthscale=0.7,
                          dtype="float64"),
        shape=(m.n, 1),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        dtype="float64", whitened=True)
    infr = GradBasedInference(
        MAP(model=m, observed=[m.X, m.Y]), dtype="float64")
    losses = []
    infr.run(X=X, Y=y, max_iter=50, learning_rate=0.05, verbose=False,
             key=jax.random.PRNGKey(15),
             callback=lambda i, l: losses.append(float(l)))
    return losses


@_f64
def lmc_multioutput():
    """LMC multi-output SVGP: closed-form mixed ELBO (r3 module; pins
    the mixing/column-shared-variance algebra and the shared KL)."""
    from mxfusion_tpu.modules import LMCSVGPRegression
    N, M, Q, C = 72, 6, 2, 3
    rng = np.random.default_rng(31)
    X = np.sort(rng.random((N, 1)) * 5, axis=0)
    G = np.stack([np.sin(X[:, 0]), np.cos(1.3 * X[:, 0])], -1)
    W_true = np.array([[1.0, 0.5, -1.0], [0.2, -0.8, 0.4]])
    Y = G @ W_true + rng.standard_normal((N, C)) * 0.05
    Z0 = np.linspace(0.2, 4.8, M)[:, None]

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.Y = LMCSVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1, variance=1.0, lengthscale=1.0,
                          dtype="float64"),
        num_outputs=C, num_latents=Q, shape=(m.n, C),
        inducing_inputs=Variable(shape=Z0.shape, initial_value=Z0),
        dtype="float64", whitened=True)
    infr = GradBasedInference(
        MAP(model=m, observed=[m.X, m.Y]), dtype="float64")
    losses = []
    infr.run(X=X, Y=Y, max_iter=50, learning_rate=0.05, verbose=False,
             key=jax.random.PRNGKey(16),
             callback=lambda i, l: losses.append(float(l)))
    return losses


@_f64
def ssm_map():
    """LGSSM transition-matrix MAP fit (r3 temporal family; pins the
    Kalman-filter density and its gradient path)."""
    from mxfusion_tpu.components.distributions import LinearGaussianSSM
    T = 60
    rng = np.random.default_rng(41)
    A_true = np.array([[0.9, 0.2], [0.0, 0.7]])
    H = np.array([[1.0, 0.5]])
    Q = np.eye(2) * 0.05
    R = np.eye(1) * 0.1
    x = np.zeros((T, 2))
    x[0] = rng.standard_normal(2)
    for t in range(1, T):
        x[t] = A_true @ x[t - 1] + rng.multivariate_normal(
            np.zeros(2), Q)
    y = x @ H.T + rng.multivariate_normal(np.zeros(1), R, size=T)

    m = Model()
    m.A = Variable(shape=(2, 2), initial_value=np.eye(2) * 0.5)
    m.y = LinearGaussianSSM.define_variable(
        A=m.A, H=Variable(value=H), trans_cov=Variable(value=Q),
        obs_cov=Variable(value=R),
        initial_mean=Variable(value=np.zeros(2)),
        initial_cov=Variable(value=np.eye(2)), shape=(T, 1),
        dtype="float64")
    infr = GradBasedInference(
        MAP(model=m, observed=[m.y]), dtype="float64")
    losses = []
    infr.run(y=y, max_iter=50, learning_rate=0.05, verbose=False,
             key=jax.random.PRNGKey(17),
             callback=lambda i, l: losses.append(float(l)))
    return losses


CONFIGS = {
    "ppca_svi": ppca_svi,
    "meanfield_linreg": meanfield_linreg,
    "gp_exact_1k": gp_exact_1k,
    "svgp_minibatch": svgp_minibatch,
    "svgp_classification": svgp_classification,
    "lmc_multioutput": lmc_multioutput,
    "ssm_map": ssm_map,
}
