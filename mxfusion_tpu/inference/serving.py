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


def _leaf_data_axes(shape, C, spec=None, legacy_assume_cov=False):
    """Data axes of one output leaf of ``shape`` for chunk size ``C``.

    ``spec`` (a tuple/list of axis indices, from the caller's
    ``output_spec``) overrides the inference. Inferred cases:

    * exactly one axis of size C              -> concatenate there
    * trailing square (C, C), no other C axis -> full covariance:
      both trailing axes are data axes (block-diagonal merge)
    * anything else                           -> ambiguous; raise and
      ask for an explicit ``output_spec``

    ``legacy_assume_cov``: pre-0.5 exported artifacts carry no
    output_spec and cannot be retrofitted with one — for them the
    trailing-(C, C) ambiguity keeps the old warn-and-assume-covariance
    behavior instead of the hard error (re-export to get the declared
    spec and silence the warning).
    """
    if spec is not None:
        return tuple(ax % len(shape) for ax in spec)
    hits = [i for i, s in enumerate(shape) if s == C]
    if len(hits) == 1:
        return (hits[0],)
    if (len(shape) >= 2 and len(hits) == 2
            and hits == [len(shape) - 2, len(shape) - 1]):
        # a trailing (C, C) pair COULD be a full predictive covariance
        # OR (rows, features) with a feature dim that happens to equal
        # the chunk size — guessing silently mangles one of them (r4
        # advisor finding), so the ambiguity is an error. Module
        # prediction algorithms avoid it by declaring
        # ``serving_data_axes`` (picked up automatically).
        if legacy_assume_cov:
            import warnings
            warnings.warn(
                "output leaf shape {} at chunk size {} is ambiguous; "
                "assuming a full predictive covariance (legacy "
                "artifact without an output_spec — re-export with "
                "0.5+ to declare the axes).".format(shape, C),
                RuntimeWarning)
            return (len(shape) - 2, len(shape) - 1)
        raise ValueError(
            "ambiguous output leaf shape {} at chunk size {}: the "
            "trailing (C, C) pair is either a full predictive "
            "covariance (data axes ({}, {})) or (rows, features) with "
            "features == chunk_size (data axis ({},)). Pass "
            "output_spec=[...] to declare which.".format(
                shape, C, len(shape) - 2, len(shape) - 1,
                len(shape) - 2))
    raise ValueError(
        "cannot infer the data axes of output leaf shape {} at chunk "
        "size {} ({} axes match); pass output_spec=[...] with one "
        "tuple of data-axis indices per flattened output leaf (e.g. "
        "[(1,), (1, 2)] for a (s, C, D) mean and a (s, C, C) full "
        "covariance).".format(shape, C, len(hits)))


class _DerivedSpec(list):
    """An output_spec derived from a module's declared
    ``serving_data_axes`` (vs user-supplied): on a leaf-count mismatch
    the merge quietly falls back to per-leaf inference instead of
    raising, since the user never wrote it."""


def _pad_chunk(c, C):
    """Pad a short chunk to exactly C rows by repeating the last row
    (stripped from the outputs by the merge)."""
    pad = C - c.shape[0]
    if pad:
        c = np.concatenate([c, np.repeat(c[-1:], pad, axis=0)])
    return c


def _resolve_mesh_serving(mesh, data_axis, chunk):
    """Validate a sharded-serving request; returns the data axis name.

    Serving chunks are host-local numpy arrays in and numpy arrays out,
    so the mesh must be fully addressable (single host); the chunk size
    is fixed (at construction or export), so it must divide the axis.
    """
    axis = data_axis if data_axis is not None else mesh.axis_names[0]
    if axis not in mesh.shape:
        raise ValueError(
            "data_axis {!r} is not an axis of the mesh (axes: {})."
            .format(axis, tuple(mesh.axis_names)))
    if any(d.process_index != jax.process_index()
           for d in mesh.devices.flat):
        raise ValueError(
            "mesh-sharded serving is single-host: chunk inputs are "
            "host-local numpy arrays and outputs are fetched with "
            "np.asarray, neither of which works on a multi-process "
            "mesh. Serve on each host's local mesh, or use the "
            "data-parallel training loops for multi-host work.")
    n_shards = mesh.shape[axis]
    if chunk % n_shards:
        raise ValueError(
            "chunk size ({}) must be divisible by the '{}' mesh axis "
            "size ({}) for sharded serving.".format(
                chunk, axis, n_shards))
    return axis


def _sharded_chunk_jit(fn, mesh, axis, n_inputs):
    """jit ``fn(trainable, fixed, chunk_list, key)`` data-parallel:
    params + key replicated, each chunk leaf split on its leading (row)
    axis; XLA/GSPMD partitions the prediction math and inserts the
    collectives."""
    from jax.sharding import NamedSharding, PartitionSpec
    repl = NamedSharding(mesh, PartitionSpec())
    shard = NamedSharding(mesh, PartitionSpec(axis))
    return jax.jit(fn,
                   in_shardings=(repl, repl, [shard] * n_inputs, repl))


def _merge_leaf(pieces_with_pad, axes, C, N):
    """Merge per-chunk arrays into the full-N output.

    One data axis: strip padding and concatenate. Two data axes (full
    predictive covariance): assemble the BLOCK-DIAGONAL (..., N, N)
    covariance — each chunk contributes its own (C, C) block and
    cross-chunk covariances are zero (they are never computed; chunked
    serving is exact within a chunk and independent across chunks)."""
    if len(axes) == 1:
        ax = axes[0]
        pieces = []
        for pad, x in pieces_with_pad:
            if pad:
                x = np.take(x, np.arange(C - pad), axis=ax)
            pieces.append(x)
        return pieces[0] if len(pieces) == 1 \
            else np.concatenate(pieces, axis=ax)
    ax0, ax1 = axes
    first = pieces_with_pad[0][1]
    out_shape = list(first.shape)
    out_shape[ax0] = N
    out_shape[ax1] = N
    out = np.zeros(out_shape, dtype=first.dtype)
    off = 0
    for pad, x in pieces_with_pad:
        rows = C - pad
        idx = [slice(None)] * out.ndim
        idx[ax0] = slice(off, off + rows)
        idx[ax1] = slice(off, off + rows)
        blk = [slice(None)] * x.ndim
        blk[ax0] = slice(0, rows)
        blk[ax1] = slice(0, rows)
        out[tuple(idx)] = x[tuple(blk)]
        off += rows
    return out


def _chunked_predict(call, C, data, key, output_spec=None, dtypes=None,
                     legacy_assume_cov=False):
    """Shared chunk/pad/merge loop.

    ``call(chunk_list, subkey)`` returns the output pytree for one
    C-row chunk. ``output_spec``: optional per-flattened-leaf tuples
    of data-axis indices (see :func:`_leaf_data_axes`). ``dtypes``:
    optional per-input dtypes the compiled function was traced with —
    chunks are cast to them (a float64 request against a
    float32-compiled function must not error or retrace)."""
    if dtypes is not None:
        data = [d.astype(dt, copy=False)
                for d, dt in zip(data, dtypes)]
    N = data[0].shape[0]
    if N == 0:
        # an all-padding chunk cannot be synthesized from zero rows
        # (there is no row to repeat), so the output structure is
        # unknowable here — fail loudly instead of IndexError below
        raise ValueError(
            "predict() called with zero rows; chunked serving needs at "
            "least one input row.")
    chunks = []      # (pad, flat leaves) per chunk
    treedef = None
    for i in range(0, N, C):
        chunk = [d[i:i + C] for d in data]
        pad = C - chunk[0].shape[0]
        if pad:
            chunk = [_pad_chunk(c, C) for c in chunk]
        key, subkey = jax.random.split(key)
        out = call(chunk, subkey)
        leaves, treedef = jax.tree_util.tree_flatten(out)
        chunks.append((pad, [np.asarray(x) for x in leaves]))

    first = chunks[0][1]
    if output_spec is not None and len(output_spec) != len(first):
        if isinstance(output_spec, _DerivedSpec):
            output_spec = None  # derived guess wrong: infer per leaf
        else:
            raise ValueError(
                "output_spec has {} entries but the prediction has {} "
                "output leaves.".format(len(output_spec), len(first)))
    merged = []
    for j, x0 in enumerate(first):
        spec = output_spec[j] if output_spec is not None else None
        if spec is not None and isinstance(output_spec, _DerivedSpec):
            # a DERIVED spec is a structural guess (one target's
            # declared axes replicated across targets) — trust it only
            # where the leaf's actual shape is consistent with it
            # (every declared data axis must have size C); otherwise
            # infer that leaf, which raises on true ambiguity instead
            # of silently merging a (rows, features) leaf as a
            # covariance
            ok = all(-x0.ndim <= ax < x0.ndim
                     and x0.shape[ax % x0.ndim] == C for ax in spec)
            if not ok:
                spec = None
        axes = _leaf_data_axes(x0.shape, C, spec,
                               legacy_assume_cov=legacy_assume_cov)
        merged.append(_merge_leaf(
            [(pad, leaves[j]) for pad, leaves in chunks], axes, C, N))
    return jax.tree_util.tree_unflatten(treedef, merged)


class BatchedPredictor:
    """Fixed-shape chunked prediction over a trained model.

    Diagonal-variance outputs concatenate on their data axis; FULL
    predictive covariances (two data axes, e.g. a (s, C, C) leaf or
    the LMC cross-output case) merge block-diagonally across chunks.
    Axes are inferred per leaf, or declared with ``output_spec``.

    Example::

        pred = BatchedPredictor(model=m, infr_params=infr.params,
                                observed=[m.X], chunk_size=4096,
                                target_variables=[m.Y.uuid])
        mu, var = pred.predict(X=X_test)[0]
    """

    def __init__(self, model, infr_params, observed, target_variables=None,
                 chunk_size=1024, num_samples=None, output_spec=None,
                 mesh=None, data_axis=None):
        """``output_spec``: optional explicit data-axis declaration,
        one tuple of axis indices per flattened output leaf (e.g.
        ``[(1,), (1, 2)]`` for a (s, C, D) mean plus a (s, C, C) full
        covariance). Without it the axes are inferred per leaf; truly
        ambiguous shapes raise with instructions. Two data axes on a
        leaf mean a full predictive covariance, merged
        BLOCK-DIAGONALLY across chunks (cross-chunk covariance is not
        computed).

        ``num_samples``: sample count handed to the prediction
        algorithm; the default ``None`` means "unset" — moment-based
        algorithms read it as 1 while algorithms with their own
        serving-appropriate default (the deep GP's mixture prediction)
        apply theirs. Pass an explicit integer to override either way.

        ``mesh``: optional ``jax.sharding.Mesh`` — each chunk is
        data-parallel over ``data_axis`` (default: the mesh's first
        axis) with parameters replicated, so bulk prediction scales
        across chips via GSPMD with zero model changes. ``chunk_size``
        must then divide evenly by the axis size (every chunk,
        including the padded tail, is exactly ``chunk_size`` rows)."""
        self.chunk_size = chunk_size
        self.output_spec = output_spec
        self._mesh = mesh
        if mesh is not None:
            self._data_axis = _resolve_mesh_serving(mesh, data_axis,
                                                    chunk_size)
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
        if self._mesh is not None:
            self._jitted = _sharded_chunk_jit(
                executor, self._mesh, self._data_axis, len(chunk0))
        else:
            self._jitted = jax.jit(executor)
        self._chunk_specs = [(tuple(np.shape(c)), np.asarray(c).dtype)
                             for c in chunk0]

    def _ensure_compiled(self, names, data):
        N = data[0].shape[0] if data else 0
        if N == 0:
            # the compile example (and any chunk) is padded by
            # repeating the last row — impossible from zero rows
            raise ValueError(
                "zero input rows; chunked serving needs at least one "
                "row to fix the chunk shapes.")
        if self._jitted is None:
            if self._mesh is not None:
                # sharded chunks are always full-size (the row axis
                # must keep dividing the mesh axis); short inputs ride
                # the pad-and-strip path like any tail chunk
                self._chunk = self.chunk_size
                chunk0 = [_pad_chunk(d[:self._chunk], self._chunk)
                          for d in data]
            else:
                self._chunk = min(self.chunk_size, N)
                chunk0 = [d[:self._chunk] for d in data]
            self._compile(names, chunk0)
            if self.output_spec is None:
                self.output_spec = self._declared_output_spec()

    def _declared_output_spec(self):
        """Ask the model's module prediction algorithm for its declared
        ``serving_data_axes`` so full-covariance/multi-output leaves
        never rely on shape guessing. Covers the common serving case —
        the prediction targets are the outputs of a single module whose
        dispatched algorithm declares its axes; anything else returns
        None (per-leaf inference, which raises on truly ambiguous
        shapes). The derived spec is SOFT: if its leaf count turns out
        not to match the prediction output, the merge falls back to
        inference rather than erroring."""
        from ..modules.module import Module
        alg = self._infr.inference_algorithm
        targets = alg.target_variables
        model = alg.model
        modules = [f for f in model.ordered_factors
                   if isinstance(f, Module)]
        if len(modules) != 1:
            return None
        mod = modules[0]
        mod_targets = [v.uuid for _, v in mod.outputs]
        if targets is not None and set(targets) != set(mod_targets):
            return None
        try:
            env = {v.uuid: None for _, v in mod.inputs}
            mod_alg = mod._get_algorithm(
                mod._prediction_algorithms, mod_targets, env,
                exact_match=True)
            axes = mod_alg.serving_data_axes
        except Exception:
            return None
        if axes is None:
            return None
        return _DerivedSpec(tuple(axes) * len(mod_targets))

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
            self._chunk, data, key, output_spec=self.output_spec,
            dtypes=[dt for _, dt in self._chunk_specs])

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
        if self._mesh is not None:
            raise ValueError(
                "export() of a mesh-sharded predictor is not supported: "
                "the serialized function would be pinned to this exact "
                "device topology. Export an unsharded BatchedPredictor "
                "and shard at load time instead.")
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
                "input_dtypes": [np.dtype(dt).name
                                 for _, dt in self._chunk_specs],
                "output_spec": ([list(t) for t in self.output_spec]
                                if self.output_spec is not None
                                else None),
                # a spec derived from serving_data_axes is a structural
                # guess (and may never have been validated if export()
                # ran before any predict) — record that so the loader
                # restores the SOFT per-leaf-validated semantics
                # instead of treating it as a user declaration
                "output_spec_derived": isinstance(self.output_spec,
                                                  _DerivedSpec),
                "format_version": "1.2"}
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("function.bin", exported.serialize())
            zf.writestr("params.npz", payload.getvalue())
            zf.writestr("meta.json", json.dumps(meta))
        return path


class ExportedPredictor:
    """Serves a ``BatchedPredictor.export`` artifact: same ``predict``
    contract, no model rebuild, no framework graph machinery."""

    def __init__(self, exported, trainable, fixed, names, chunk,
                 dtypes=None, output_spec=None, legacy_assume_cov=False,
                 mesh=None, data_axis=None):
        self._exported = exported
        self._trainable = trainable
        self._fixed = fixed
        self._names = names
        self._chunk = chunk
        self._dtypes = dtypes
        self._output_spec = output_spec
        self._legacy_assume_cov = legacy_assume_cov
        if mesh is not None:
            # single-device artifacts CAN be served sharded: the
            # deserialized StableHLO inlines into the outer jit and
            # GSPMD partitions it like any traced computation (probed:
            # per-device block shapes, no entry all-gather). The chunk
            # is fixed at export time, so it must divide the axis.
            axis = _resolve_mesh_serving(mesh, data_axis, chunk)
            self._call = _sharded_chunk_jit(exported.call, mesh, axis,
                                            len(names))
        else:
            self._call = jax.jit(exported.call)

    def predict(self, key=None, **kwargs):
        data = [np.asarray(kwargs[n]) for n in self._names]
        if key is None:
            key = jax.random.PRNGKey(0)
        # legacy_assume_cov is set by the loader ONLY for format 1.0
        # artifacts: those predate output_spec and cannot be
        # retrofitted with one (the model code is gone), so their
        # ambiguous leaves keep the pre-0.5 warn-and-assume behavior.
        # A 1.1+ artifact without a derivable spec raises on ambiguity
        # exactly like the live BatchedPredictor (keying legacy mode on
        # spec-is-None would silently regress new exports to guessing).
        return _chunked_predict(
            lambda chunk, k: self._call(
                self._trainable, self._fixed,
                [jax.numpy.asarray(c) for c in chunk], k),
            self._chunk, data, key, output_spec=self._output_spec,
            dtypes=self._dtypes,
            legacy_assume_cov=self._legacy_assume_cov)


def load_exported_predictor(path, mesh=None, data_axis=None):
    """Load a ``BatchedPredictor.export`` artifact.

    ``mesh``: optional ``jax.sharding.Mesh`` — serve the artifact
    data-parallel, chunk rows split over ``data_axis`` (default: the
    mesh's first axis) with parameters replicated. Artifacts export
    single-device; sharding is applied here at load time (GSPMD
    partitions the inlined exported computation)."""
    with zipfile.ZipFile(path) as zf:
        exported = jax.export.deserialize(zf.read("function.bin"))
        meta = json.loads(zf.read("meta.json"))
        version = meta.get("format_version")
        if version not in ("1.0", "1.1", "1.2"):
            raise ValueError("unsupported predictor artifact version: "
                             "{}".format(version))
        arrays = np.load(io.BytesIO(zf.read("params.npz")))
        trainable = {k[3:]: jax.numpy.asarray(arrays[k])
                     for k in arrays.files if k.startswith("t::")}
        fixed = {k[3:]: jax.numpy.asarray(arrays[k])
                 for k in arrays.files if k.startswith("f::")}
    dtypes = [np.dtype(d) for d in meta["input_dtypes"]] \
        if meta.get("input_dtypes") else None
    spec = [tuple(t) for t in meta["output_spec"]] \
        if meta.get("output_spec") else None
    if spec is not None and meta.get("output_spec_derived"):
        # restore the derived spec's SOFT semantics: per-leaf shape
        # validation with fallback to inference, exactly as the live
        # BatchedPredictor treats it (1.2+ artifacts record the flag)
        spec = _DerivedSpec(spec)
    return ExportedPredictor(exported, trainable, fixed,
                             meta["names"], meta["chunk"],
                             dtypes=dtypes, output_spec=spec,
                             legacy_assume_cov=(spec is None
                                                and version == "1.0"),
                             mesh=mesh, data_axis=data_axis)
