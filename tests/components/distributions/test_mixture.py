"""NormalMixture (marginalized GMM) oracle and inference tests."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import NormalMixture
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.util.testutils import prepare_runtime_array
from mxfusion_tpu.inference import GradBasedInference, MAP


def _np_mix_logpdf(x, w, mu, var):
    w = w / w.sum(-1, keepdims=True)
    comp = stats.norm.logpdf(x[..., None], mu, np.sqrt(var))
    return np.log((w * np.exp(comp)).sum(-1))


def test_mixture_log_pdf_vs_numpy():
    rng = np.random.default_rng(0)
    K = 3
    w = rng.random(K) + 0.2
    mu = rng.standard_normal(K) * 2
    var = rng.random(K) + 0.3
    x = rng.standard_normal((5, 7, 1))

    w_v, m_v, v_v = Variable(), Variable(), Variable()
    dist = NormalMixture(weights=w_v, means=m_v, variances=v_v,
                         dtype="float64")
    dist._generate_outputs(shape=(7, 1))
    env = {w_v.uuid: prepare_runtime_array(w, False, "float64"),
           m_v.uuid: prepare_runtime_array(mu, False, "float64"),
           v_v.uuid: prepare_runtime_array(var, False, "float64"),
           dist.random_variable.uuid: prepare_runtime_array(
               x, True, "float64")}
    result = np.asarray(dist.log_pdf(env))
    expected = _np_mix_logpdf(x, w, mu, var)
    assert np.allclose(result, expected, rtol=1e-9, atol=1e-12)


def test_mixture_samples_match_distribution():
    w = np.array([0.3, 0.7])
    mu = np.array([-2.0, 3.0])
    var = np.array([0.5, 1.5])
    w_v, m_v, v_v = Variable(), Variable(), Variable()
    dist = NormalMixture(weights=w_v, means=m_v, variances=v_v,
                         dtype="float64")
    dist._generate_outputs(shape=(1,))
    env = {w_v.uuid: jnp.asarray(w)[None],
           m_v.uuid: jnp.asarray(mu)[None],
           v_v.uuid: jnp.asarray(var)[None]}
    s = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                     num_samples=30000)).ravel()

    def cdf(x):
        return (0.3 * stats.norm.cdf(x, -2.0, np.sqrt(0.5))
                + 0.7 * stats.norm.cdf(x, 3.0, np.sqrt(1.5)))

    _, p = stats.kstest(s, cdf)
    assert p > 1e-3
    # both modes populated in the right proportion
    frac_hi = (s > 0.5).mean()
    assert abs(frac_hi - 0.7) < 0.02


def test_mixture_fit_recovers_bimodal_data():
    """MAP fit of a 2-component mixture on clearly bimodal data."""
    rng = np.random.default_rng(1)
    N = 600
    comp = rng.random(N) < 0.4
    y = np.where(comp, rng.normal(-3.0, 0.6, N),
                 rng.normal(2.0, 0.8, N))[:, None]

    m = Model()
    m.w = Variable(shape=(2,), transformation=PositiveTransformation(),
                   initial_value=np.array([1.0, 1.0]))
    m.mu = Variable(shape=(2,), initial_value=np.array([-1.0, 1.0]))
    m.var = Variable(shape=(2,), transformation=PositiveTransformation(),
                     initial_value=np.array([1.0, 1.0]))
    from mxfusion_tpu.components.functions.operators import broadcast_to
    m.y = NormalMixture.define_variable(
        weights=broadcast_to(m.w, (N, 1, 2)),
        means=broadcast_to(m.mu, (N, 1, 2)),
        variances=broadcast_to(m.var, (N, 1, 2)),
        shape=(N, 1))
    infr = GradBasedInference(MAP(model=m, observed=[m.y]))
    infr.run(y=y, max_iter=800, learning_rate=0.05, verbose=False)

    mu_hat = np.sort(np.asarray(infr.params[m.mu]).ravel())
    w_hat = np.asarray(infr.params[m.w]).ravel()
    w_hat = w_hat / w_hat.sum()
    w_lo = w_hat[np.argsort(np.asarray(infr.params[m.mu]).ravel())[0]]
    assert abs(mu_hat[0] - (-3.0)) < 0.2, mu_hat
    assert abs(mu_hat[1] - 2.0) < 0.2, mu_hat
    assert abs(w_lo - 0.4) < 0.08, w_hat


def test_mixture_samples_with_sample_axis_and_event_shape():
    """Per-sample parameters (s, K) combined with a non-empty rv_shape:
    right-aligned broadcasting used to pit the sample axis against the
    event dim and raise (r3 advisor finding); parameters must align as
    in log_pdf_impl."""
    s, K = 4, 3
    rng = np.random.default_rng(1)
    w = rng.random((s, K)) + 0.2
    mu = rng.standard_normal((s, K))
    var = rng.random((s, K)) + 0.3
    w_v, m_v, v_v = Variable(), Variable(), Variable()
    dist = NormalMixture(weights=w_v, means=m_v, variances=v_v,
                         dtype="float64")
    dist._generate_outputs(shape=(6, 1))
    env = {w_v.uuid: jnp.asarray(w), m_v.uuid: jnp.asarray(mu),
           v_v.uuid: jnp.asarray(var)}
    out = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                       num_samples=s))
    assert out.shape == (s, 6, 1)
    assert np.all(np.isfinite(out))
    # each sample row draws from ITS OWN mixture: rows with very
    # separated means should produce distinguishable outputs
    mu2 = np.zeros((s, K))
    mu2[0] = -100.0
    mu2[1] = +100.0
    env[m_v.uuid] = jnp.asarray(mu2)
    out2 = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                        num_samples=s))
    assert out2[0].mean() < -50 and out2[1].mean() > 50
