"""Categorical distribution.

Reference: /root/reference/mxfusion/components/distributions/categorical.py:20-169.
Parameterized by unnormalized ``log_prob`` over the last axis; supports
one-hot or index encodings and optional log-softmax normalization. The
one-hot log-pdf is a contraction that XLA fuses into a single reduction.
"""
import jax
import jax.numpy as jnp

from .distribution import UnivariateDistribution
from ..variables.variable import Variable


class Categorical(UnivariateDistribution):
    def __init__(self, log_prob, num_classes, one_hot_encoding=False,
                 normalization=True, axis=-1, rand_gen=None, dtype=None):
        super().__init__(
            inputs=[("log_prob", log_prob)], outputs=None,
            input_names=["log_prob"], output_names=["random_variable"],
            rand_gen=rand_gen, dtype=dtype)
        self.num_classes = num_classes
        self.one_hot_encoding = one_hot_encoding
        self.normalization = normalization
        self.axis = axis

    def log_pdf_impl(self, random_variable, log_prob):
        logp = (jax.nn.log_softmax(log_prob, axis=self.axis)
                if self.normalization else log_prob)
        if self.one_hot_encoding:
            return jnp.sum(random_variable * logp, axis=self.axis)
        idx = random_variable.astype(jnp.int32)
        if idx.shape[-1] == 1:
            idx = idx[..., 0]
        return jnp.take_along_axis(logp, idx[..., None],
                                   axis=self.axis)[..., 0]

    def draw_samples_impl(self, rv_shape, num_samples, key, log_prob):
        logp = (jax.nn.log_softmax(log_prob, axis=self.axis)
                if self.normalization else log_prob)
        probs = jnp.exp(logp)
        probs = jnp.broadcast_to(
            probs, (num_samples,) + probs.shape[1:])
        idx = self._rand_gen.sample_multinomial(key, probs)
        if self.one_hot_encoding:
            return jax.nn.one_hot(idx, self.num_classes, dtype=self.dtype)
        out = idx.astype(self.dtype)
        if len(rv_shape) > 0 and rv_shape[-1] == 1 and out.ndim < 1 + len(rv_shape):
            out = out[..., None]
        return out

    def replicate_self(self, attribute_map=None):
        replica = super().replicate_self(attribute_map)
        replica.num_classes = self.num_classes
        replica.one_hot_encoding = self.one_hot_encoding
        replica.normalization = self.normalization
        replica.axis = self.axis
        return replica

    def _generate_outputs(self, shape):
        self.set_outputs([Variable(shape=shape if shape is not None else (1,))])

    @classmethod
    def define_variable(cls, log_prob, num_classes, shape=None,
                        one_hot_encoding=False, normalization=True, axis=-1,
                        rand_gen=None, dtype=None):
        dist = cls(log_prob=log_prob, num_classes=num_classes,
                   one_hot_encoding=one_hot_encoding,
                   normalization=normalization, axis=axis, rand_gen=rand_gen,
                   dtype=dtype)
        dist._generate_outputs(shape=shape)
        return dist.random_variable
