"""Multi-host input pipeline: per-host beta shards -> on-device assembly.

The reference loads every beta file in one process (data.py:448-503); on a
multi-host TPU slice that would funnel ~GBs through a single host NIC and
replicate the I/O wait across the pod.  Here each host reads only its slice
of the beta FILES (one stimulus per file — the natural shard granularity),
places its rows on its local devices as a stimulus-sharded global array, and
one XLA all-gather (ICI within a slice, DCN across slices) materialises the
replicated [N, V] matrix the searchlight runner consumes.  No host ever
holds more than N/n_hosts rows.

Flow (per subject/hemi):

    paths = get_fmri_data_paths(...)                       # metadata only
    lo, hi = host_shard_bounds(len(paths), process_idx, process_count)
    local = load_beta_rows(paths[lo:hi])                   # this host's I/O
    x_rows = global_from_host_shards(local, lo, n, mesh)   # row-sharded
    X = replicate_rows(x_rows, mesh)                       # all-gather

Validated on the 8-virtual-device CPU mesh (tests/test_multihost.py) by
treating each device as a "host": shards are placed per device and the
replication collective is checked against the dense concatenation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_decoding_tpu.io.gifti import read_gifti
from multimodal_decoding_tpu.parallel.mesh import VERTEX_AXIS


def host_shard_bounds(n_rows: int, host_idx: int, n_hosts: int) -> tuple:
    """Contiguous balanced [lo, hi) stimulus-row range for one host.

    The first ``n_rows % n_hosts`` hosts take one extra row, so every row is
    owned exactly once for any (n_rows, n_hosts).
    """
    if not 0 <= host_idx < n_hosts:
        raise ValueError(f"host_idx {host_idx} out of range for {n_hosts} hosts")
    base, extra = divmod(n_rows, n_hosts)
    lo = host_idx * base + min(host_idx, extra)
    return lo, lo + base + (1 if host_idx < extra else 0)


def load_beta_rows(paths) -> np.ndarray:
    """Read a shard of surface beta files -> [len(paths), V] float32.

    Same per-file contract as the full loader (data.py:452-455: first darray
    of each GIfTI), restricted to this host's paths.
    """
    return np.array([read_gifti(p).darrays[0].data for p in paths], dtype=np.float32)


def global_from_host_shards(
    local_rows: np.ndarray, row_start: int, n_total: int, mesh: Mesh
) -> jax.Array:
    """Assemble a row-sharded global [n_total, V] array from per-host rows.

    Multi-process (real pod): every process passes its own contiguous shard;
    ``jax.make_array_from_process_local_data`` builds the global array with
    zero cross-host traffic.  Single-process (tests / one host): the rows are
    distributed across the mesh's devices so the collective path downstream
    is identical.
    """
    n_dev = mesh.devices.size
    if n_total % n_dev != 0:
        raise ValueError(
            f"n_total={n_total} must be divisible by the {n_dev}-device mesh; "
            "pad the stimulus axis first (pad_to_multiple)"
        )
    sharding = NamedSharding(mesh, P(VERTEX_AXIS))
    if jax.process_count() > 1:
        expected = host_shard_bounds(n_total, jax.process_index(), jax.process_count())
        if (row_start, row_start + len(local_rows)) != expected:
            raise ValueError(
                f"process {jax.process_index()} passed rows "
                f"[{row_start}, {row_start + len(local_rows)}), expected {expected}"
            )
        global_shape = (n_total,) + local_rows.shape[1:]
        return jax.make_array_from_process_local_data(sharding, local_rows, global_shape)

    # single process: emulate hosts at device granularity
    if len(local_rows) != n_total or row_start != 0:
        raise ValueError("single-process assembly expects the full row set")
    per_dev = n_total // n_dev
    devices = mesh.devices.flatten()
    shards = [
        jax.device_put(local_rows[d * per_dev : (d + 1) * per_dev], devices[d])
        for d in range(n_dev)
    ]
    return jax.make_array_from_single_device_arrays(
        (n_total,) + local_rows.shape[1:], sharding, shards
    )


def replicate_rows(x_row_sharded: jax.Array, mesh: Mesh) -> jax.Array:
    """Row-sharded [N, V] -> replicated: one XLA all-gather over the mesh.

    Within a v5e slice this rides ICI; across slices XLA routes it over DCN.
    The result satisfies the searchlight runner's replicated-X contract
    (searchlight_runner.py device placement).
    """
    rep = NamedSharding(mesh, P())
    return jax.jit(lambda x: x, out_shardings=rep)(x_row_sharded)


def replicated_from_host(arr: np.ndarray, mesh: Mesh) -> jax.Array:
    """Host array (same value on every host) -> fully replicated global array.

    Single-process: a plain replicated device_put.  Multi-process: every
    process contributes its full local copy per local device
    (make_array_from_process_local_data with a replicated spec) — zero
    cross-host traffic, and the result is fully addressable everywhere, so
    downstream np.asarray conversions are legal on every host.
    """
    arr = np.asarray(arr)
    rep = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(rep, arr, arr.shape)
    return jax.device_put(arr, rep)


def shard_rows_from_host(arr: np.ndarray, mesh: Mesh) -> jax.Array:
    """Host array (same value on every host) -> row-sharded global array.

    For per-block index/derangement tensors the searchlight runner shards
    over the ``"v"`` axis: every host already holds the full array (it is
    derived from the adjacency / a shared PRNG stream), so each process
    just places its OWN rows — ``make_array_from_callback`` hands every
    addressable shard its global index, zero cross-host traffic.
    Single-process this degenerates to a sharded device_put.
    """
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, P(VERTEX_AXIS))
    if jax.process_count() > 1:
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(arr, sharding)


def host_numpy(x, mesh: Mesh | None = None) -> np.ndarray:
    """Device array -> host numpy, legal under multi-process execution.

    ``np.asarray`` on a global array whose shards live on other hosts
    raises; replicating through a jitted identity first (one all-gather
    over ICI/DCN) makes every shard addressable everywhere.  Single-process
    arrays convert directly.
    """
    if isinstance(x, np.ndarray) or jax.process_count() == 1:
        return np.asarray(x)
    rep = NamedSharding(mesh if mesh is not None else x.sharding.mesh, P())
    return np.asarray(jax.jit(lambda a: a, out_shardings=rep)(x))


def replicate_host_filled(fills, mesh: Mesh) -> jax.Array:
    """Union of disjointly-filled per-host tensors via one on-device reduce.

    For artifacts whose natural shard axis does NOT divide the mesh (e.g. the
    [S=6 subjects, P_within, V] null score tensors of the permutation
    pipeline): each host loads only the rows it owns and fills the rest with
    EXACT zeros; stacking the per-host copies on a device-sharded leading
    axis and summing it away (one psum over ICI/DCN) replicates the union.
    NaN entries are fine — each is owned by exactly one host, the others
    contribute 0.0 there.

    ``fills``: multi-process — this process's [..] fill (every process passes
    its own); single-process — a list of per-"host" fills (device-granular
    emulation, like the rest of this module).  Returns the replicated union.
    """
    n_dev = mesh.devices.size
    sharding = NamedSharding(mesh, P(VERTEX_AXIS))
    if jax.process_count() > 1:
        fill = np.asarray(fills, dtype=np.float32)
        # contribute on the first local device, exact zeros on the rest
        n_local = len(mesh.local_devices)
        local = np.zeros((n_local,) + fill.shape, np.float32)
        local[0] = fill
        stacked = jax.make_array_from_process_local_data(
            sharding, local, (n_dev,) + fill.shape
        )
    else:
        fills = [np.asarray(f, dtype=np.float32) for f in fills]
        if len(fills) != n_dev:
            raise ValueError(
                f"single-process emulation needs one fill per device "
                f"({n_dev}), got {len(fills)}"
            )
        devices = mesh.devices.flatten()
        shards = [jax.device_put(f[None], devices[d]) for d, f in enumerate(fills)]
        stacked = jax.make_array_from_single_device_arrays(
            (n_dev,) + fills[0].shape, sharding, shards
        )
    rep = NamedSharding(mesh, P())
    return jax.jit(lambda x: x.sum(axis=0), out_shardings=rep)(stacked)


def distributed_beta_matrix(paths, mesh: Mesh, pad_value: float = 0.0):
    """End-to-end per-host load + assembly + replication.

    Returns (X_replicated [n_padded, V], n_original).  Rows are padded to a
    device multiple with ``pad_value`` (padded rows are dropped by callers
    via the returned count).  In a multi-process run each process only reads
    its host_shard_bounds slice of ``paths``.
    """
    n = len(paths)
    n_dev = mesh.devices.size
    n_padded = ((n + n_dev - 1) // n_dev) * n_dev
    if jax.process_count() > 1:
        lo, hi = host_shard_bounds(n_padded, jax.process_index(), jax.process_count())
        if min(hi, n) <= lo:
            raise ValueError(
                f"host {jax.process_index()} owns only padding rows "
                f"([{lo}, {hi}) of {n} real) — more hosts than beta files; "
                "reduce process count or shard a larger file set"
            )
        rows = load_beta_rows(paths[lo : min(hi, n)])
        n_pad_here = (hi - lo) - len(rows)
        if n_pad_here:
            rows = np.concatenate(
                [rows, np.full((n_pad_here,) + rows.shape[1:], pad_value, rows.dtype)]
            )
        x = global_from_host_shards(rows, lo, n_padded, mesh)
    else:
        rows = load_beta_rows(paths)
        if n_padded != n:
            rows = np.concatenate(
                [rows, np.full((n_padded - n,) + rows.shape[1:], pad_value, rows.dtype)]
            )
        x = global_from_host_shards(rows, 0, n_padded, mesh)
    return replicate_rows(x, mesh), n
