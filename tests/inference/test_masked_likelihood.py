"""Missing-data handling via elementwise rv_scaling masks.

Because a factor's ``log_pdf_scaling`` multiplies the ELEMENTWISE
log-density before the graph sums, an rv_scaling array acts as an
observation mask: zeroed entries contribute nothing to the objective
regardless of their placeholder values. Oracle: the masked MAP equals
the closed-form posterior computed from the observed subset alone."""
import numpy as np
import jax

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.inference import (GradBasedInference, MAP,
                                    StochasticVariationalInference,
                                    create_Gaussian_meanfield,
                                    create_executor)

N = 100


def _model():
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.y = Normal.define_variable(
        mean=broadcast_to(m.mu, (N, 1)),
        variance=broadcast_to(Variable(value=1.0), (N, 1)),
        shape=(N, 1))
    return m


def _data(seed=0):
    rng = np.random.default_rng(seed)
    y_full = rng.standard_normal((N, 1)) * 2.0 + 3.0
    mask = (rng.random((N, 1)) < 0.7).astype(np.float64)
    # poison the missing entries: the mask must make them irrelevant
    y_obs = np.where(mask > 0, y_full, 1e6)
    return y_full, mask, y_obs


def test_masked_map_matches_observed_subset_posterior():
    y_full, mask, y_obs = _data()
    m = _model()
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(alg)
    infr.run(y=y_obs, max_iter=500, learning_rate=0.1, verbose=False,
             rv_scaling={m.y: mask})
    loc = alg.posterior[m.mu].factor.location
    mu_hat = float(np.asarray(infr.params[loc]).ravel()[0])
    k = mask.sum()
    # conjugate posterior mean over the observed subset only
    expected = y_full[mask > 0].sum() * 100.0 / (100.0 * k + 1.0)
    np.testing.assert_allclose(mu_hat, expected, atol=5e-3)


def test_masked_objective_value_equals_subset_objective():
    y_full, mask, y_obs = _data(seed=1)
    m = _model()
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(alg)
    infr.initialize(y=y_obs)
    ex = create_executor(alg, infr.params,
                         rv_scaling={m.y.uuid: mask})
    loss_masked, _, _ = ex(infr.params.trainable_params(),
                           infr.params.fixed_params(), [y_obs],
                           jax.random.PRNGKey(0))
    # same objective with the poisoned entries replaced by in-support
    # values but still masked: must be IDENTICAL (mask kills them)
    y_alt = np.where(mask > 0, y_obs, -7.0)
    loss_alt, _, _ = ex(infr.params.trainable_params(),
                        infr.params.fixed_params(), [y_alt],
                        jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(np.asarray(loss_masked)),
                               float(np.asarray(loss_alt)), rtol=1e-12)


def test_masked_svi_posterior_concentrates_on_observed():
    y_full, mask, y_obs = _data(seed=2)
    m = _model()
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=10, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.run(y=y_obs, max_iter=600, learning_rate=0.1, verbose=False,
             rv_scaling={m.y: mask})
    mu_hat = float(np.asarray(infr.params[q.mu.factor.mean]).ravel()[0])
    np.testing.assert_allclose(mu_hat, y_full[mask > 0].mean(),
                               atol=0.3)


def test_minibatch_loop_rejects_run_level_rv_scaling():
    import pytest
    from mxfusion_tpu.inference import MinibatchInferenceLoop
    _, mask, y_obs = _data(seed=3)
    m = _model()
    infr = GradBasedInference(
        MAP(model=m, observed=[m.y]),
        grad_loop=MinibatchInferenceLoop(batch_size=20))
    with pytest.raises(ValueError):
        infr.run(y=y_obs, max_iter=10, verbose=False,
                 rv_scaling={m.y: mask})


def test_rank_mismatched_mask_raises():
    import pytest
    from mxfusion_tpu.common.exceptions import InferenceError
    _, mask, y_obs = _data(seed=4)
    m = _model()
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(alg)
    with pytest.raises(InferenceError, match="rank"):
        infr.run(y=y_obs, max_iter=5, verbose=False,
                 rv_scaling={m.y: mask[:, 0]})       # (N,) vs (N, 1)


def test_module_array_mask_raises():
    import pytest
    from mxfusion_tpu.common.exceptions import InferenceError
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import SVGPRegression
    rng = np.random.default_rng(5)
    X = rng.random((30, 1))
    Y = rng.standard_normal((30, 1))
    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, 1))
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1), noise_var=Variable(value=0.1),
        shape=(m.n, 1), num_inducing=4)
    infr = GradBasedInference(MAP(model=m, observed=[m.X, m.Y]))
    with pytest.raises(InferenceError, match="module"):
        infr.run(X=X, Y=Y, max_iter=5, verbose=False,
                 rv_scaling={m.Y: np.ones((30, 1))})


def test_mask_rides_as_executor_argument():
    # the mask must be a jit ARG (fixed-params path), not a baked
    # closure constant (CLAUDE.md relay rule): after executor creation
    # the fixed store carries the mask under the derived key, and
    # swapping the array there changes the objective WITHOUT retracing
    _, mask, y_obs = _data(seed=6)
    m = _model()
    alg = MAP(model=m, observed=[m.y])
    infr = GradBasedInference(alg)
    infr.initialize(y=y_obs)
    ex = create_executor(alg, infr.params,
                         rv_scaling={m.y.uuid: mask})
    key = m.y.uuid + ":rv_scale"
    fixed = infr.params.fixed_params()
    assert key in fixed
    import jax
    jitted = jax.jit(ex)
    l1, _, _ = jitted(infr.params.trainable_params(), fixed, [y_obs],
                      jax.random.PRNGKey(0))
    fixed2 = dict(fixed)
    fixed2[key] = np.zeros_like(mask)    # mask everything out
    l2, _, _ = jitted(infr.params.trainable_params(), fixed2, [y_obs],
                      jax.random.PRNGKey(0))
    assert not np.allclose(float(np.asarray(l1)),
                           float(np.asarray(l2)))
