"""Device mesh helpers.

The reference has no distributed layer at all (SURVEY §2.11: no
NCCL/MPI/KVStore anywhere). This package is the TPU-native scaling
component: a ``jax.sharding.Mesh`` over ICI, data sharded by
``NamedSharding`` annotations, and XLA/GSPMD inserting the collectives
(psum over gradients and reductions) — the "annotate shardings, let the
compiler partition" recipe.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=None, axis_name=DATA_AXIS, devices=None):
    """1-D mesh over the first ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(data_size, model_size, data_axis=DATA_AXIS,
                 model_axis="model", devices=None):
    """2-D (data × model) mesh for combined data/model sharding.

    Guidance (measured, benchmarks/model_axis_2d.py + NOTES.md r3):
    sharding the M-inducing axis of q(U)/Z over ``model`` is a
    MEMORY-CAPACITY lever, not a speed lever — it divides the M² q(U)
    parameters + optimizer state across devices (48.4 -> 12.1 MB per
    device at M=2048 on a x4 model axis) but adds ~100 collectives per
    step and no compute-rate benefit (Kuu's Cholesky is gathered
    regardless). Replicate q(U) (``model_size=1``) unless its
    parameters + adam state approach per-device HBM (M ≳ 16k at f32).
    """
    if devices is None:
        devices = jax.devices()
    need = data_size * model_size
    grid = np.asarray(devices[:need]).reshape(data_size, model_size)
    return Mesh(grid, (data_axis, model_axis))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host (DCN) runtime init: thin wrapper over
    ``jax.distributed.initialize``. On single-host this is a no-op; on a
    multi-host TPU slice, call before any jax computation, then build
    meshes over ``jax.devices()`` (all hosts' devices) as usual.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def batch_sharding(mesh, ndim, axis_name=DATA_AXIS):
    """Shard axis 0 (the data/batch axis) over the mesh; replicate rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_data(mesh, arrays, axis_name=DATA_AXIS):
    """Place a list of host arrays on the mesh, batch axis sharded.

    Arrays whose leading dim does not divide the ``axis_name`` axis
    size are replicated instead (meant for scalars / small side
    inputs). A LARGE array falling back to replication defeats the
    data parallelism the caller asked for, so that case warns: pad or
    trim the data to a multiple of the axis size to silence it.
    """
    n = mesh.shape[axis_name]
    out = []
    for a in arrays:
        a = np.asarray(a)
        if a.ndim >= 1 and a.shape[0] % n == 0:
            out.append(jax.device_put(
                a, batch_sharding(mesh, a.ndim, axis_name)))
        else:
            if a.ndim >= 1 and a.shape[0] >= n:
                import warnings
                warnings.warn(
                    "shard_data: array with leading dim {} does not "
                    "divide the '{}' mesh axis (size {}); REPLICATING "
                    "it on every device — the step stays correct but "
                    "this input is not data-parallel. Pad or trim to "
                    "a multiple of {} to shard it.".format(
                        a.shape[0], axis_name, n, n), RuntimeWarning)
            out.append(jax.device_put(a, replicated_sharding(mesh)))
    return out


def replicate_tree(mesh, tree):
    """Replicate a pytree of arrays across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)
