"""Device mesh & sharding helpers.

The reference's only parallelism is single-host joblib process fan-out
(searchlight.py:130-148, GridSearchCV n_jobs).  Here the equivalents are:

* ``vertex_mesh``: a 1-D mesh over all devices with axis ``"v"`` — the vertex
  dimension (~327k) is this project's "sequence" axis (SURVEY.md §5); the
  searchlight batch, permutation tensors and score maps shard over it.
* ``feature_mesh`` axis ``"f"``: the voxel/feature dimension of the
  whole-brain gram matrix, reduced with a psum (replaces nothing in the
  reference — it simply runs out of one process's RAM instead).

Collectives ride ICI via jax.shard_map/pjit; there is no NCCL/MPI shim.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VERTEX_AXIS = "v"
FEATURE_AXIS = "f"


def vertex_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (VERTEX_AXIS,))


def feature_mesh(devices=None) -> Mesh:
    """1-D mesh over the voxel/feature axis (whole-brain gram sharding)."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (FEATURE_AXIS,))


def shard_vertices(mesh: Mesh) -> NamedSharding:
    """[B, ...] arrays sharded along the leading (vertex-block) axis."""
    return NamedSharding(mesh, P(VERTEX_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0, fill=None):
    """Pad ``axis`` up to a multiple; returns (padded, original_length).

    fill=None repeats the first slice (safe for index arrays: padded vertices
    recompute vertex 0 and are dropped on host).
    """
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    pad_n = target - n
    if fill is None:
        filler = np.repeat(np.take(arr, [0], axis=axis), pad_n, axis=axis)
    else:
        shape = list(arr.shape)
        shape[axis] = pad_n
        filler = np.full(shape, fill, dtype=arr.dtype)
    return np.concatenate([arr, filler], axis=axis), n
