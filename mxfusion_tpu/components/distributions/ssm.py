"""Linear-Gaussian state-space model (LGSSM) distribution.

Beyond the reference (amzn/MXFusion has no temporal models; SURVEY
§2.2 lists its complete distribution set). The output variable is the
full observation trajectory y (T, E) of

    x_t = A x_{t-1} + w_t,  w_t ~ N(0, Q);  y_t = H x_t + v_t,
    v_t ~ N(0, R);  x_0 ~ N(m0, P0)

with the latent path x MARGINALIZED: ``log_pdf`` is the exact Kalman-
filter marginal likelihood (one lax.scan over time), so the
trajectory density is smooth in (A, H, Q, R, m0, P0) and every
inference driver in the framework applies — MAP/SVI fit the system
matrices by gradient, HMC/PT give Bayesian posteriors over them, and
the ops.kalman utilities (filter / RTS smoother) recover the latent
states from fitted parameters. Sampling simulates trajectories.

All six parameters are ordinary input Variables, so priors and
transformations attach as usual. Covariances are full matrices; pass
``make_diagonal``-style constructions (or Variable values) for
diagonal noise.
"""
import jax
import jax.numpy as jnp

from .distribution import Distribution
from ..variables.variable import Variable
from ...ops.kalman import (kalman_filter, kalman_filter_parallel,
                           lgssm_sample)


class LinearGaussianSSM(Distribution):

    def __init__(self, A, H, trans_cov, obs_cov, initial_mean,
                 initial_cov, observation_mask=None,
                 parallel_filter=False, rand_gen=None, dtype=None):
        inputs = [("A", A), ("H", H), ("trans_cov", trans_cov),
                  ("obs_cov", obs_cov), ("initial_mean", initial_mean),
                  ("initial_cov", initial_cov)]
        if observation_mask is not None:
            if parallel_filter:
                raise ValueError(
                    "observation_mask requires the sequential filter "
                    "(parallel_filter=False).")
            if not isinstance(observation_mask, Variable):
                observation_mask = Variable(value=observation_mask)
            inputs.append(("observation_mask", observation_mask))
        super().__init__(
            inputs=inputs, outputs=None,
            input_names=[k for k, _ in inputs],
            output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)
        # associative-scan filter: log-depth over T instead of a
        # sequential scan — the right choice for long series on
        # parallel hardware (measured verdict in benchmarks/NOTES.md)
        self.parallel_filter = parallel_filter

    def replicate_self(self, attribute_map=None):
        replica = super().replicate_self(attribute_map)
        replica.parallel_filter = self.parallel_filter
        return replica

    def log_pdf_impl(self, random_variable, A, H, trans_cov, obs_cov,
                     initial_mean, initial_cov, observation_mask=None):
        y = random_variable                       # (s, T, E)
        s = y.shape[0]
        has_mask = observation_mask is not None

        def bc(a):
            return jnp.broadcast_to(a, (s,) + a.shape[1:])

        def one(y1, A1, H1, Q1, R1, m01, P01, mk=None):
            if mk is not None:
                return kalman_filter(y1, A1, H1, Q1, R1, m01, P01,
                                     mask=mk)["loglik"]
            filt = kalman_filter_parallel if self.parallel_filter \
                else kalman_filter
            return filt(y1, A1, H1, Q1, R1, m01, P01)["loglik"]

        args = [bc(y), bc(A), bc(H), bc(trans_cov), bc(obs_cov),
                bc(initial_mean), bc(initial_cov)]
        if has_mask:
            args.append(bc(observation_mask))
        return jax.vmap(one)(*args)               # (s,)

    def draw_samples_impl(self, rv_shape, num_samples, key, A, H,
                          trans_cov, obs_cov, initial_mean,
                          initial_cov, observation_mask=None):
        # the mask marks which steps were OBSERVED in training; the
        # generative process itself is unaffected, so simulation
        # ignores it
        T = rv_shape[-2]
        keys = jax.random.split(key, num_samples)

        def bc(a):
            return jnp.broadcast_to(a, (num_samples,) + a.shape[1:])

        def one(k, A1, H1, Q1, R1, m01, P01):
            _, y = lgssm_sample(k, T, A1, H1, Q1, R1, m01, P01,
                                dtype=self.dtype)
            return y

        return jax.vmap(one)(keys, bc(A), bc(H), bc(trans_cov),
                             bc(obs_cov), bc(initial_mean),
                             bc(initial_cov))

    def _generate_outputs(self, shape):
        if shape is None or len(shape) < 2:
            raise ValueError(
                "LinearGaussianSSM requires an explicit (T, E) shape.")
        self.set_outputs([Variable(shape=shape)])

    @classmethod
    def define_variable(cls, A, H, trans_cov, obs_cov, initial_mean,
                        initial_cov, shape=None, observation_mask=None,
                        parallel_filter=False, rand_gen=None,
                        dtype=None):
        dist = cls(A=A, H=H, trans_cov=trans_cov, obs_cov=obs_cov,
                   initial_mean=initial_mean, initial_cov=initial_cov,
                   observation_mask=observation_mask,
                   parallel_filter=parallel_filter, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
