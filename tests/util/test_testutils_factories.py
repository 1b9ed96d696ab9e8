"""Shipped test-utility factories (reference testutils.py:96-161)."""
import numpy as np
import jax

from mxfusion_tpu.util.testutils import (
    make_basic_model, make_bnn_model, make_net, make_spd_matrix,
    numpy_array_reshape, check_sampling_bivariate)
from mxfusion_tpu.util.util import rename_duplicate_names, \
    parse_string_to_tuple
from mxfusion_tpu.inference import (
    GradBasedInference, StochasticVariationalInference,
    create_Gaussian_meanfield)


def test_make_basic_model_trains():
    m = make_basic_model()
    rng = np.random.default_rng(0)
    y = rng.standard_normal((100, 1)) + 1.0
    q = create_Gaussian_meanfield(model=m, observed=[m.Y])
    alg = StochasticVariationalInference(num_samples=5, model=m,
                                         posterior=q, observed=[m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    losses = []
    infr.run(max_iter=60, learning_rate=0.1, Y=y,
             callback=lambda i, l: losses.append(float(l)))
    assert losses[-1] < losses[0]


def test_make_bnn_model_structure():
    net = make_net(input_shape=(50, 2), hidden=4)
    m = make_bnn_model(net, data_x_shape=(50, 2))
    # every lifted network weight has a Normal prior attached
    for _, v in m.r.factor.function.parameters.items():
        assert v.factor is not None
        assert type(v.factor).__name__ == "Normal"
    latents = m.get_latent_variables([m.x.uuid, m.y.uuid])
    assert len(latents) >= len(m.r.factor.function.parameters)


def test_misc_utils():
    assert numpy_array_reshape([1.0, 2.0], has_samples=False,
                               n_dim=3).shape == (1, 1, 2)
    A = make_spd_matrix(4)
    assert np.all(np.linalg.eigvalsh(A) > 0)
    renamed = rename_duplicate_names([("a", 1), ("a", 2), ("b", 3)])
    assert [n for n, _ in renamed] == ["a_0", "a_1", "b"]
    assert parse_string_to_tuple("(1, 2)") == (1, 2)
    rng = np.random.default_rng(0)
    s = rng.multivariate_normal([1.0, -1.0], [[1.0, 0.3], [0.3, 0.5]],
                                size=20000)
    assert check_sampling_bivariate(s, [1.0, -1.0],
                                    [[1.0, 0.3], [0.3, 0.5]])
