"""SVGD particle inference tests (beyond-reference).

Oracle tier: conjugate Gaussian posteriors in closed form — SVGD
particles must reproduce both posterior mean AND spread (the repulsion
term is what keeps the particles from collapsing to the MAP point)."""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to, dot
from mxfusion_tpu.inference import SVGDAlgorithm, SVGDInference


def test_svgd_conjugate_gaussian_mean():
    N, s2, tau2 = 60, 2.0, 50.0
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) * np.sqrt(s2) + 1.5

    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=tau2, shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=s2), (N, 1)),
                                 shape=(N, 1))
    alg = SVGDAlgorithm(model=m, observed=[m.y], num_particles=100,
                        num_iterations=800, step_size=0.1)
    infr = SVGDInference(inference_algorithm=alg)
    particles = infr.run(y=y, key=jax.random.PRNGKey(0))

    post_var = 1.0 / (N / s2 + 1.0 / tau2)
    post_mean = post_var * y.sum() / s2
    z = np.asarray(particles[m.mu.uuid]).reshape(-1)
    assert z.shape == (100,)
    assert abs(z.mean() - post_mean) < 3 * np.sqrt(post_var), \
        (z.mean(), post_mean)
    # particles must carry the posterior spread, not collapse to MAP
    assert np.isclose(z.var(), post_var, rtol=0.4), (z.var(), post_var)
    assert np.isfinite(
        infr.diagnostics["final_mean_abs_update"])


def test_svgd_linear_regression_posterior():
    N, D, s2 = 80, 3, 0.25
    rng = np.random.default_rng(1)
    X = rng.standard_normal((N, D))
    w_true = np.array([[1.0], [-0.5], [0.25]])
    y = X @ w_true + rng.standard_normal((N, 1)) * np.sqrt(s2)

    m = Model()
    m.X = Variable(shape=(N, D))
    m.w = Normal.define_variable(
        mean=broadcast_to(Variable(value=0.), (D, 1)),
        variance=broadcast_to(Variable(value=1.), (D, 1)),
        shape=(D, 1))
    m.f = dot(m.X, m.w)
    m.y = Normal.define_variable(mean=m.f,
                                 variance=broadcast_to(
                                     Variable(value=s2), (N, 1)),
                                 shape=(N, 1))
    alg = SVGDAlgorithm(model=m, observed=[m.X, m.y],
                        num_particles=120, num_iterations=1000,
                        step_size=0.1)
    infr = SVGDInference(inference_algorithm=alg)
    particles = infr.run(X=X, y=y, key=jax.random.PRNGKey(1))

    Sigma = np.linalg.inv(X.T @ X / s2 + np.eye(D))
    mu = Sigma @ X.T @ y[:, 0] / s2
    z = np.asarray(particles[m.w.uuid]).reshape(-1, D)
    np.testing.assert_allclose(z.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(z.var(0), np.diag(Sigma), rtol=0.5,
                               atol=5e-4)


def test_svgd_single_particle_is_map():
    """n=1: the kernel term is constant, SVGD degenerates to MAP ascent."""
    N = 40
    rng = np.random.default_rng(2)
    y = rng.standard_normal((N, 1)) + 2.0
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.), (N, 1)),
                                 shape=(N, 1))
    alg = SVGDAlgorithm(model=m, observed=[m.y], num_particles=1,
                        num_iterations=600, step_size=0.2, bandwidth=1.0)
    infr = SVGDInference(inference_algorithm=alg)
    particles = infr.run(y=y, key=jax.random.PRNGKey(2))
    z = float(np.asarray(particles[m.mu.uuid]).ravel()[0])
    post_var = 1.0 / (N + 0.01)
    post_mean = post_var * y.sum()
    assert abs(z - post_mean) < 0.05, (z, post_mean)


def test_svgd_sample_predictive():
    N = 30
    rng = np.random.default_rng(5)
    y = rng.standard_normal((N, 1)) + 1.0
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=50., shape=(1,))
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(
                                     Variable(value=1.), (N, 1)),
                                 shape=(N, 1))
    alg = SVGDAlgorithm(model=m, observed=[m.y], num_particles=40,
                        num_iterations=300, step_size=0.1)
    infr = SVGDInference(inference_algorithm=alg)
    infr.run(y=y, key=jax.random.PRNGKey(5))
    pred = infr.sample_predictive(key=jax.random.PRNGKey(6))
    yp = np.asarray(pred[m.y.uuid])
    assert yp.shape == (40, N, 1)
    # predictive draws center near the data mean
    assert abs(yp.mean() - y.mean()) < 0.5
