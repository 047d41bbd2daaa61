"""Host-RAM-bounded streaming ingestion: betas cache -> device X_all.

The eager searchlight ingestion (decoding/searchlight.py run() ->
data/preprocess.standardize_fmri_betas -> searchlight_runner concatenate)
materializes ~3x the train-betas bytes in fresh host pages at fsaverage7
scale: the np.load copy, the NaN-column-drop copy, and the
concatenate+astype copy (~16 GB for the BASELINE [8192, 163842] subject).
On healthy hosts that is only wasted RAM; on memory-ballooned VMs (this
dev box instantiates fresh pages at ~6 MB/s while file reads run at
~250 MB/s — docs/PERF_NOTES.md round-4/round-5 first-touch entries) it is
hours of wall clock.  This module streams row chunks from the
uncompressed ``.npz`` betas cache (data/betas.py ``get_fmri_surface_data``
writes it with ``np.savez`` = ZIP_STORED) through a small reused buffer
pair, so peak host memory is O(chunk) instead of O(3 * n_rows * V):

  pass 1  sequential f64 moment accumulation in numpy's axis-0 reduction
          order -> statistics match ``standardize_fmri_betas`` bitwise
          (asserted in tests/test_ingest.py)
  pass 2  per-chunk NaN-column drop (np.compress into the reused buffer)
          + the same in-place f32 ``(x - mean32) / scale32`` transform
          -> device_put -> donated dynamic_update_slice into the
          preallocated device X_all.  A scalar readback after each chunk
          fences the transfer so the host buffer can be reused.

The device result is the replicated [n_rows, V_kept] matrix the
searchlight runner consumes (searchlight_runner.py device placement),
element-wise equal to the eager path.  Reference ingestion contract:
/root/reference/analyses/decoding/searchlight/searchlight.py:219-248 +
data.py:506-537 (load + float cast + StandardScaler), which loads
everything eagerly in one process.
"""

from __future__ import annotations

import zipfile
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


class NpzMemberReader:
    """Row-chunk reader over one 2-D array member of an UNCOMPRESSED .npz.

    ``np.savez`` stores members with ZIP_STORED, so a member is a plain
    .npy byte range inside the archive: after the header, rows of a
    C-order [n_rows, n_cols] array are contiguous and can be streamed
    with ``readinto`` at file-read speed into a caller-owned buffer.
    """

    def __init__(self, path: str, member: str = "betas"):
        self.path = path
        self.member = member + ".npy"
        zf = zipfile.ZipFile(path)
        try:
            info = zf.getinfo(self.member)
        except KeyError:
            raise ValueError(f"{path} has no member {self.member!r}") from None
        if info.compress_type != zipfile.ZIP_STORED:
            raise ValueError(
                f"{path}:{self.member} is compressed; streaming ingestion "
                "needs the uncompressed np.savez cache"
            )
        self._zf = zf
        with zf.open(self.member) as f:
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
            else:
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
        if len(shape) != 2 or fortran:
            raise ValueError(f"{path}:{self.member}: need a C-order 2-D array, got {shape}")
        if dtype.hasobject:
            raise ValueError("object arrays are not streamable")
        self.shape = shape
        self.dtype = dtype
        self.n_rows, self.n_cols = shape
        self._row_bytes = self.n_cols * dtype.itemsize

    def read_row(self, i: int) -> np.ndarray:
        """One row (fresh small array) — used for the NaN-column mask."""
        if not 0 <= i < self.n_rows:
            raise IndexError(i)
        out = np.empty(self.n_cols, self.dtype)
        with self._zf.open(self.member) as f:
            version = np.lib.format.read_magic(f)
            (np.lib.format.read_array_header_1_0 if version == (1, 0)
             else np.lib.format.read_array_header_2_0)(f)
            # ZipExtFile.seek on a stored member re-reads from the start;
            # for row 0 (the common case: the NaN mask) this is free
            f.seek(i * self._row_bytes, 1)
            self._readinto(f, memoryview(out).cast("B"))
        return out

    @staticmethod
    def _readinto(f, mv) -> None:
        n = 0
        while n < len(mv):
            got = f.readinto(mv[n:])
            if not got:
                raise EOFError("truncated npz member")
            n += got

    def iter_row_chunks(self, chunk_rows: int, buf: np.ndarray | None = None):
        """Yield ``(row0, view)`` where view is [rows, n_cols] into ``buf``.

        The SAME buffer backs every yielded view — consumers must finish
        with a chunk before advancing the iterator.
        """
        if buf is None:
            buf = np.empty((chunk_rows, self.n_cols), self.dtype)
        if buf.shape[1] != self.n_cols or buf.dtype != self.dtype or len(buf) < chunk_rows:
            raise ValueError("buffer mismatch")
        with self._zf.open(self.member) as f:
            version = np.lib.format.read_magic(f)
            (np.lib.format.read_array_header_1_0 if version == (1, 0)
             else np.lib.format.read_array_header_2_0)(f)
            for row0 in range(0, self.n_rows, chunk_rows):
                rows = min(chunk_rows, self.n_rows - row0)
                view = buf[:rows]
                self._readinto(f, memoryview(view).cast("B"))
                yield row0, view


def default_chunk_rows(n_cols: int, itemsize: int = 4, target_bytes: int = 64 << 20) -> int:
    return max(1, target_bytes // max(1, n_cols * itemsize))


def streamed_scaler_fit(reader: NpzMemberReader, keep: np.ndarray,
                        chunk_rows: int | None = None):
    """Streamed train-fit scaler == ``preprocess._fit_scaler`` semantics.

    Accumulates row-sequentially in float64 — the same per-element
    operation order as ``train.mean(axis=0, dtype=np.float64)`` /
    ``np.var(train, axis=0, dtype=np.float64)`` on a C-order array (numpy
    reduces strided axis-0 sequentially; pairwise summation only applies
    to the contiguous inner axis), so the f32-rounded statistics are
    bitwise those of the eager path.  Two passes over the file; O(chunk)
    host memory.
    """
    keep = np.asarray(keep, bool)
    n_keep = int(keep.sum())
    n = reader.n_rows
    chunk_rows = chunk_rows or default_chunk_rows(reader.n_cols, reader.dtype.itemsize)
    raw = np.empty((chunk_rows, reader.n_cols), reader.dtype)
    kept = np.empty((chunk_rows, n_keep), np.float32)

    acc = np.zeros(n_keep, np.float64)
    for _, view in reader.iter_row_chunks(chunk_rows, raw):
        k = np.compress(keep, view, axis=1, out=kept[: len(view)])
        for row in k:
            acc += row  # f32 row cast-added into the f64 accumulator
    mean64 = acc / n

    acc2 = np.zeros(n_keep, np.float64)
    dev = np.empty(n_keep, np.float64)
    for _, view in reader.iter_row_chunks(chunk_rows, raw):
        k = np.compress(keep, view, axis=1, out=kept[: len(view)])
        for row in k:
            np.subtract(row, mean64, out=dev)
            np.multiply(dev, dev, out=dev)
            acc2 += dev
    std64 = np.sqrt(acc2 / n)
    scale64 = np.where(std64 == 0.0, 1.0, std64)
    return mean64.astype(np.float32), scale64.astype(np.float32)


@partial(jax.jit, donate_argnums=0)
def _update_rows(X, chunk, row0):
    return jax.lax.dynamic_update_slice(X, chunk, (row0, 0))


def streamed_x_all_device(
    readers,
    keep: np.ndarray,
    mean32: np.ndarray,
    scale32: np.ndarray,
    mesh,
    dtype=np.float32,
    chunk_rows: int | None = None,
):
    """Stream standardized rows of all splits into one replicated device
    [sum(n_rows), V_kept] matrix (the runner's X_all), O(chunk) host RAM.

    ``readers``: sequence of NpzMemberReader (train, test, imagery) in the
    eager concatenation order.  Single-process meshes only — the
    multi-process path keeps the per-host-shard ingestion (multihost.py).
    """
    if jax.process_count() > 1:
        raise ValueError("streamed ingestion is single-process; use multihost.py shards")
    keep = np.asarray(keep, bool)
    n_keep = int(keep.sum())
    n_cols = readers[0].n_cols
    if any(r.n_cols != n_cols for r in readers):
        raise ValueError("split column counts differ")
    n_rows = sum(r.n_rows for r in readers)
    chunk_rows = chunk_rows or default_chunk_rows(n_cols)

    rep = NamedSharding(mesh, P())
    X = jax.jit(lambda: jnp.zeros((n_rows, n_keep), dtype), out_shardings=rep)()

    raw = np.empty((chunk_rows, n_cols), readers[0].dtype)
    std = np.empty((chunk_rows, n_keep), np.float32)
    offset = 0
    for reader in readers:
        for row0, view in reader.iter_row_chunks(chunk_rows, raw):
            k = np.compress(keep, view, axis=1, out=std[: len(view)])
            k -= mean32
            k /= scale32
            chunk = k.astype(dtype, copy=False)
            X = _update_rows(X, jax.device_put(chunk, rep),
                             jnp.asarray(offset + row0, jnp.int32))
            # transfer fence: the scalar readback forces the chunk's
            # device_put + update to complete before the host buffer is
            # mutated by the next iteration (block_until_ready does not
            # synchronise through this box's relay; a readback does)
            np.asarray(jax.device_get(X[0, 0]))
        offset += reader.n_rows
    return X
