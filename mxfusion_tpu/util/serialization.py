"""Serialization helpers.

Reference: /root/reference/mxfusion/util/serialization.py:25-135. The
on-disk layout is a zip of six entries (version, graph skeletons,
parameter arrays, array constants, primitive constants, configuration);
arrays are stored as an embedded npz.
"""
import io

import numpy as np

SERIALIZATION_VERSION = "1.0"
GRAPH_JSON_VERSION = "1.0"

FILENAMES = {
    "version": "version.json",
    "graphs": "graphs.json",
    "params": "parameters.npz",
    "array_constants": "array_constants.npz",
    "prim_constants": "variable_constants.json",
    "configuration": "configuration.json",
}


def make_numpy_zip_bytes(arrays):
    """Serialize {name: np array} to npz bytes."""
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in arrays.items()})
    return buf.getvalue()


def read_numpy_zip_bytes(data):
    """Inverse of :func:`make_numpy_zip_bytes`."""
    buf = io.BytesIO(data)
    loaded = np.load(buf, allow_pickle=False)
    return {k: loaded[k] for k in loaded.files}
