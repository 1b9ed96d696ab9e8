"""Concrete (Gumbel-Softmax) distribution tests.

Density oracle: the closed form from Maddison et al. 2017 re-derived
in numpy, plus a quadrature check that the K=2 density integrates to 1.
Sampling: argmax frequencies match the class probabilities at any
temperature; low temperature concentrates near the simplex vertices;
reparameterized gradients flow to the probs."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import gammaln as np_gammaln

from mxfusion_tpu.components.variables.variable import Variable
from mxfusion_tpu.components.distributions import Concrete
from mxfusion_tpu.util.testutils import prepare_runtime_array


def np_concrete_logpdf(x, p, tau):
    K = x.shape[-1]
    p = p / p.sum(-1, keepdims=True)
    logp = np.log(p)
    logx = np.log(x)
    return (np_gammaln(K) + (K - 1) * np.log(tau)
            + (logp - (tau + 1) * logx).sum(-1)
            - K * np.log(np.exp(logp - tau * logx).sum(-1)))


def test_concrete_log_pdf_vs_numpy():
    rng = np.random.default_rng(0)
    K, tau = 4, 0.7
    p = rng.random((3, K)) + 0.2
    raw = rng.random((5, 3, K)) + 0.1
    x = raw / raw.sum(-1, keepdims=True)

    p_v = Variable()
    dist = Concrete(probs=p_v, temperature=tau, dtype="float64")
    dist._generate_outputs(shape=(3, K))
    env = {p_v.uuid: prepare_runtime_array(p, False, "float64"),
           dist.random_variable.uuid: prepare_runtime_array(
               x, True, "float64")}
    result = np.asarray(dist.log_pdf(env))
    # the interpreter sums over the remaining event dims
    expected = np_concrete_logpdf(x, p[None], tau)
    assert np.allclose(result, expected, rtol=1e-9, atol=1e-12)


def test_concrete_density_integrates_to_one_k2():
    """K=2: the density of x0 on (0,1) must integrate to 1."""
    tau, p = 1.3, np.array([0.3, 0.7])
    t = np.linspace(1e-4, 1 - 1e-4, 20001)
    x = np.stack([t, 1 - t], axis=-1)
    lp = np_concrete_logpdf(x, p[None], tau)
    integral = np.trapezoid(np.exp(lp), t)
    assert abs(integral - 1.0) < 1e-3, integral


def test_concrete_sampling_statistics_and_gradients():
    K, tau = 3, 0.5
    p = np.array([0.5, 0.3, 0.2])
    p_v = Variable()
    dist = Concrete(probs=p_v, temperature=tau, dtype="float64")
    dist._generate_outputs(shape=(1, K))
    env = {p_v.uuid: jnp.asarray(p)[None, None]}
    s = np.asarray(dist.draw_samples(env, jax.random.PRNGKey(0),
                                     num_samples=20000))[:, 0, :]
    assert np.allclose(s.sum(-1), 1.0, atol=1e-6)
    freq = np.bincount(s.argmax(-1), minlength=K) / len(s)
    np.testing.assert_allclose(freq, p, atol=0.02)

    # low temperature: mass near the vertices
    dist_cold = Concrete(probs=p_v, temperature=0.05, dtype="float64")
    dist_cold._generate_outputs(shape=(1, K))
    sc = np.asarray(dist_cold.draw_samples(env, jax.random.PRNGKey(1),
                                           num_samples=2000))[:, 0, :]
    assert (sc.max(-1) > 0.9).mean() > 0.9

    # reparameterized: gradients flow from samples to the probs
    def mean_first_coord(logits):
        e = {p_v.uuid: jax.nn.softmax(logits)[None, None]}
        out = dist.draw_samples(e, jax.random.PRNGKey(2),
                                num_samples=500)
        return jnp.mean(out[..., 0])

    g = jax.grad(mean_first_coord)(jnp.asarray([0.1, -0.2, 0.05]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(g[0]) > 0  # more weight on class 0 raises E[x_0]


def test_concrete_latent_svi_discrete_autoencoder():
    """End-to-end: amortized SVI with a Concrete posterior over relaxed
    one-hot codes (the discrete-VAE pattern) — trains through the
    reparameterized sampler, and the encoder becomes confident."""
    import flax.linen as nn
    from mxfusion_tpu import Model, Posterior
    from mxfusion_tpu.components.functions import FlaxFunction
    from mxfusion_tpu.components.functions.operators import broadcast_to
    from mxfusion_tpu.inference import (GradBasedInference,
                                        StochasticVariationalInference)
    from mxfusion_tpu.components.distributions import Normal

    rng = np.random.default_rng(0)
    N, D, K = 120, 4, 3
    centers = np.array([[2.0, 0, 0, 0], [0, 2.0, 0, 0], [0, 0, 2.0, 0]])
    comp = rng.integers(0, K, N)
    x = centers[comp] + rng.standard_normal((N, D)) * 0.15

    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, z):
            return nn.Dense(D)(z)

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = jnp.tanh(nn.Dense(16)(x))
            return jax.nn.softmax(nn.Dense(K)(h)) + 1e-6

    decoder = FlaxFunction(Decoder(), name="dec", input_shapes=[(N, K)],
                           rng_key=jax.random.PRNGKey(0))
    m = Model()
    m.z = Concrete.define_variable(
        probs=broadcast_to(Variable(value=1.0 / K), (N, K)),
        shape=(N, K), temperature=0.5)
    m.x_mean = decoder(m.z)
    m.x = Normal.define_variable(
        mean=m.x_mean,
        variance=broadcast_to(Variable(value=0.05), (N, D)),
        shape=(N, D))

    encoder = FlaxFunction(Encoder(), name="enc", input_shapes=[(N, D)],
                           rng_key=jax.random.PRNGKey(1))
    q = Posterior(m)
    q_probs = encoder(q.x)
    q.z.set_prior(Concrete(probs=q_probs, temperature=0.5))

    alg = StochasticVariationalInference(num_samples=4, model=m,
                                         posterior=q, observed=[m.x])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=400, learning_rate=0.02, x=x,
             callback=lambda i, l: losses.append(float(np.asarray(l))))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] - 50, (losses[0], losses[-1])
