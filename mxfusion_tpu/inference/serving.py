"""Serving-oriented batched prediction.

``TransferInference(ModulePredictionAlgorithm...).run`` rebuilds and
re-jits its executor per call and recompiles whenever the number of
test points changes — fine for notebooks, wrong for a serving loop.
``BatchedPredictor`` compiles the prediction executor ONCE at a fixed
chunk size and streams arbitrary-length inputs through it (the tail
chunk is padded and the padding stripped from the outputs), so every
request after the first runs at device speed with zero recompilation.

``BatchedPredictor.export(path)`` serializes the traced prediction
function (``jax.export`` / StableHLO) together with a parameter
snapshot; ``load_exported_predictor(path)`` serves it WITHOUT the
model-definition code or graph rebuild — the AOT deployment artifact
the reference cannot produce (its load path requires re-running model
construction, docs/serialization.md:28-54 there).

No reference counterpart (the reference has no serving story; its
prediction path is /root/reference/mxfusion/inference/prediction.py).
"""
import io
import json
import zipfile

import jax
import numpy as np

from .inference import TransferInference
from .inference_alg import create_sampling_executor
from .prediction import ModulePredictionAlgorithm


def _chunked_predict(call, C, data, key):
    """Shared chunk/pad/merge loop.

    ``call(chunk_list, subkey)`` returns the output pytree for one
    C-row chunk; outputs carry the data axis at -2 (means/samples:
    (s, C, D)) or -1 (diagonal variances: (s, C))."""
    N = data[0].shape[0]

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
        out = call(chunk, subkey)
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
        self._chunk_specs = [(tuple(np.shape(c)), np.asarray(c).dtype)
                             for c in chunk0]

    def _ensure_compiled(self, names, data):
        N = data[0].shape[0]
        if self._jitted is None:
            self._chunk = min(self.chunk_size, N)
            self._compile(names, [d[:self._chunk] for d in data])

    def predict(self, key=None, **kwargs):
        """Predict for the named observed inputs; any leading-axis
        length. Returns the same structure as the prediction algorithm
        (tuples of (mean, variance) per target by default), with chunk
        results concatenated on the data axis as numpy arrays."""
        names = self._infr.observed_variable_names
        data = [np.asarray(kwargs[n]) for n in names]
        self._ensure_compiled(names, data)
        if key is None:
            key = jax.random.PRNGKey(0)
        # live views: pick up any training that happened through the
        # same infr_params since compile (params are jit ARGUMENTS, so
        # no recompilation; r2 advisor finding on stale snapshots)
        trainable = self._infr.params.trainable_params()
        fixed = self._infr.params.fixed_params()
        return _chunked_predict(
            lambda chunk, k: self._jitted(trainable, fixed, chunk, k),
            self._chunk, data, key)

    # ------------------------------------------------------------------
    def export(self, path, **example_data):
        """Serialize the compiled prediction function + a parameter
        snapshot to ``path`` (zip). If not yet compiled, ``example_data``
        (same kwargs as ``predict``) fixes the chunk shapes.

        The artifact is self-contained: ``load_exported_predictor``
        serves it without the model-definition code. Platform
        compatibility follows ``jax.export`` rules (an artifact
        exported on TPU runs on TPU, etc.)."""
        names = self._infr.observed_variable_names
        if self._jitted is None:
            if not example_data:
                raise ValueError(
                    "export() before the first predict(): pass example "
                    "data kwargs to fix the chunk shapes.")
            data = [np.asarray(example_data[n]) for n in names]
            self._ensure_compiled(names, data)
        trainable = {k: np.asarray(v) for k, v in
                     self._infr.params.trainable_params().items()}
        fixed = {k: np.asarray(v) for k, v in
                 self._infr.params.fixed_params().items()}
        C = self._chunk
        chunk0 = [np.zeros(shape, dtype=dtype)
                  for shape, dtype in self._chunk_specs]
        key = jax.random.PRNGKey(0)
        exported = jax.export.export(self._jitted)(
            trainable, fixed, [jax.numpy.asarray(c) for c in chunk0],
            key)
        payload = io.BytesIO()
        np_payload = {}
        for k, v in trainable.items():
            np_payload["t::" + k] = v
        for k, v in fixed.items():
            np_payload["f::" + k] = v
        np.savez(payload, **np_payload)
        meta = {"names": list(names), "chunk": int(C),
                "format_version": "1.0"}
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("function.bin", exported.serialize())
            zf.writestr("params.npz", payload.getvalue())
            zf.writestr("meta.json", json.dumps(meta))
        return path


class ExportedPredictor:
    """Serves a ``BatchedPredictor.export`` artifact: same ``predict``
    contract, no model rebuild, no framework graph machinery."""

    def __init__(self, exported, trainable, fixed, names, chunk):
        self._exported = exported
        self._trainable = trainable
        self._fixed = fixed
        self._names = names
        self._chunk = chunk
        self._call = jax.jit(exported.call)

    def predict(self, key=None, **kwargs):
        data = [np.asarray(kwargs[n]) for n in self._names]
        if key is None:
            key = jax.random.PRNGKey(0)
        return _chunked_predict(
            lambda chunk, k: self._call(
                self._trainable, self._fixed,
                [jax.numpy.asarray(c) for c in chunk], k),
            self._chunk, data, key)


def load_exported_predictor(path):
    """Load a ``BatchedPredictor.export`` artifact."""
    with zipfile.ZipFile(path) as zf:
        exported = jax.export.deserialize(zf.read("function.bin"))
        meta = json.loads(zf.read("meta.json"))
        if meta.get("format_version") != "1.0":
            raise ValueError("unsupported predictor artifact version: "
                             "{}".format(meta.get("format_version")))
        arrays = np.load(io.BytesIO(zf.read("params.npz")))
        trainable = {k[3:]: jax.numpy.asarray(arrays[k])
                     for k in arrays.files if k.startswith("t::")}
        fixed = {k[3:]: jax.numpy.asarray(arrays[k])
                 for k in arrays.files if k.startswith("f::")}
    return ExportedPredictor(exported, trainable, fixed,
                             meta["names"], meta["chunk"])
