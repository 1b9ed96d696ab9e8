"""Serving-oriented batched prediction.

``TransferInference(ModulePredictionAlgorithm...).run`` rebuilds and
re-jits its executor per call and recompiles whenever the number of
test points changes — fine for notebooks, wrong for a serving loop.
``BatchedPredictor`` compiles the prediction executor ONCE at a fixed
chunk size and streams arbitrary-length inputs through it (the tail
chunk is padded and the padding stripped from the outputs), so every
request after the first runs at device speed with zero recompilation.

No reference counterpart (the reference has no serving story; its
prediction path is /root/reference/mxfusion/inference/prediction.py).
"""
import jax
import numpy as np

from .inference import TransferInference
from .inference_alg import create_sampling_executor
from .prediction import ModulePredictionAlgorithm


class BatchedPredictor:
    """Fixed-shape chunked prediction over a trained model.

    Works with diagonal-variance module predictions (the serving case).
    Output leaves carry the data axis at -2 (means/samples: (s, N, D))
    or -1 (diagonal variances: (s, N)); chunks are unpadded and
    concatenated on whichever of those matches the chunk size.

    Example::

        pred = BatchedPredictor(model=m, infr_params=infr.params,
                                observed=[m.X], chunk_size=4096,
                                target_variables=[m.Y.uuid])
        mu, var = pred.predict(X=X_test)[0]
    """

    def __init__(self, model, infr_params, observed, target_variables=None,
                 chunk_size=1024, num_samples=1):
        self.chunk_size = chunk_size
        alg = ModulePredictionAlgorithm(
            model=model, observed=observed,
            target_variables=target_variables, num_samples=num_samples)
        self._infr = TransferInference(alg, infr_params=infr_params)
        self._jitted = None
        self._chunk = None

    def _compile(self, names, chunk0):
        self._infr.initialize(**{n: c for n, c in zip(names, chunk0)})
        executor = create_sampling_executor(
            self._infr.inference_algorithm, self._infr.params)
        self._jitted = jax.jit(executor)

    def predict(self, key=None, **kwargs):
        """Predict for the named observed inputs; any leading-axis
        length. Returns the same structure as the prediction algorithm
        (tuples of (mean, variance) per target by default), with chunk
        results concatenated on the data axis as numpy arrays."""
        names = self._infr.observed_variable_names
        data = [np.asarray(kwargs[n]) for n in names]
        N = data[0].shape[0]
        C = min(self.chunk_size, N) if self._chunk is None else self._chunk
        if self._jitted is None:
            self._chunk = C
            self._compile(names, [d[:C] for d in data])
        C = self._chunk
        if key is None:
            key = jax.random.PRNGKey(0)
        # live views: pick up any training that happened through the
        # same infr_params since compile (params are jit ARGUMENTS, so
        # no recompilation; r2 advisor finding on stale snapshots)
        trainable = self._infr.params.trainable_params()
        fixed = self._infr.params.fixed_params()

        def data_axis(x):
            if x.ndim >= 2 and x.shape[-2] == C and x.shape[-1] == C:
                # e.g. a full predictive covariance (s, C, C): no way to
                # tell the data axis apart — out of scope for this class
                raise ValueError(
                    "ambiguous output leaf of shape {} (two axes match "
                    "the chunk size {}): BatchedPredictor supports "
                    "diagonal-variance predictions only — use "
                    "diagonal_variance=True on the module's prediction "
                    "algorithm.".format(x.shape, C))
            if x.ndim >= 2 and x.shape[-2] == C:
                return x.ndim - 2
            if x.shape[-1] == C:
                return x.ndim - 1
            raise ValueError(
                "cannot locate the data axis (chunk {}) in output leaf "
                "of shape {}".format(C, x.shape))

        chunks = []      # (pad, flat leaves) per chunk
        treedef = None
        for i in range(0, N, C):
            chunk = [d[i:i + C] for d in data]
            pad = C - chunk[0].shape[0]
            if pad:
                chunk = [np.concatenate(
                    [c, np.repeat(c[-1:], pad, axis=0)]) for c in chunk]
            key, subkey = jax.random.split(key)
            out = self._jitted(trainable, fixed, chunk, subkey)
            leaves, treedef = jax.tree_util.tree_flatten(out)
            chunks.append((pad, [np.asarray(x) for x in leaves]))

        axes = [data_axis(x) for x in chunks[0][1]]
        merged = []
        for j, ax in enumerate(axes):
            pieces = []
            for pad, leaves in chunks:
                x = leaves[j]
                if pad:
                    x = np.take(x, np.arange(C - pad), axis=ax)
                pieces.append(x)
            merged.append(pieces[0] if len(pieces) == 1
                          else np.concatenate(pieces, axis=ax))
        return jax.tree_util.tree_unflatten(treedef, merged)
