"""Vertex-sharded searchlight runner: blocks x mesh -> score maps.

Replaces the reference's joblib GroupIterator fan-out
(/root/reference/analyses/decoding/searchlight/searchlight.py:117-149) with a
block loop over a device mesh: every block of B vertices is sharded across
the ``"v"`` mesh axis, the fused block step (gather/fit/predict/score) runs
under jit with sharded batch dims, and per-block score vectors stream back to
host numpy.  JAX's async dispatch double-buffers host->device index transfer
against compute automatically.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_decoding_tpu.decoding.searchlight_engine import (
    N_NULL_METRICS,
    TestLayout,
    searchlight_block,
    searchlight_block_cv,
    searchlight_block_cv_with_null,
    searchlight_block_with_null,
)
from multimodal_decoding_tpu.parallel.mesh import (
    pad_to_multiple,
    vertex_mesh,
)
from multimodal_decoding_tpu.parallel.multihost import (
    host_numpy,
    replicated_from_host,
    shard_rows_from_host,
)


def _auto_block_size(n_rows: int, k: int, n_devices: int, budget_bytes: int = 2 << 30) -> int:
    """Pick a vertex block size so the gathered patch tensor fits the budget."""
    per_vertex = n_rows * k * 4
    b = max(1, budget_bytes // per_vertex)
    # round down to a multiple of n_devices (shardability), at least n_devices
    b = max(n_devices, (b // n_devices) * n_devices)
    return int(min(b, 4096))


# Live device memory allowed for not-yet-materialised block outputs.  Null
# mode emits {metric: [B, P]} per block (6 null metrics); at fsaverage7 scale
# (B=256, P=1000) that is ~6 MB/block, so without a bound the 640-block loop
# would park ~4 GB of outputs in HBM on top of the replicated X — OOM
# territory on a 16 GB chip.
_FLUSH_BUDGET_BYTES = 256 << 20


def _flush_cadence(block_size: int, n_perms: int | None,
                   budget_bytes: int = _FLUSH_BUDGET_BYTES) -> int:
    """How many blocks may stay device-resident before a host materialise.

    Main-mode outputs are ~KB/block, so the cadence is only about keeping
    JAX's async dispatch pipelined (8).  Null-mode outputs are
    ``block_size * n_perms * 4`` bytes per metric per block; the cadence is
    sized so pending outputs stay under ``budget_bytes``.
    """
    if not n_perms:
        return 8
    per_block = block_size * n_perms * 4 * N_NULL_METRICS
    return max(1, min(8, budget_bytes // max(per_block, 1)))


def _materialize_pending(lists: list[list], n_hosted: int, mesh=None) -> int:
    """Convert every not-yet-hosted block dict in each list to host numpy.

    ``lists`` are parallel per-block result lists (main, null); entries at
    index >= n_hosted are device dicts.  Returns the new hosted count.
    Materialising ALL pending blocks (not just the newest) is what bounds
    live device memory.  Under multi-process execution the conversion
    replicates each sharded block first (host_numpy — a collective), so
    every process MUST reach these calls in the same order.
    """
    n = max((len(lst) for lst in lists), default=0)
    for lst in lists:
        for i in range(min(n_hosted, len(lst)), len(lst)):
            lst[i] = {k: host_numpy(v, mesh) for k, v in lst[i].items()}
    return n


def run_searchlight(
    X_train: np.ndarray,
    X_test: np.ndarray,
    X_imag: np.ndarray,
    Y_train: np.ndarray,
    Y_test: np.ndarray,
    Y_imag: np.ndarray,
    adjacency: np.ndarray,
    stim_types_test,
    alpha: float | None = 1.0,
    alphas_cv=None,
    adjacency_mask: np.ndarray | None = None,
    shuffles: np.ndarray | None = None,
    null_seed: int = 0,
    block_size: int | None = None,
    mesh=None,
    dtype=np.float32,
    precision=jax.lax.Precision.HIGHEST,
    cv_precision=None,
    cv_solver: str | None = None,
    cv_scorer: str = "xla",
    cv_dtype=None,
    null_gather: str | None = None,
    progress: bool = True,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 64,
    resume: bool = True,
    x_all_device=None,
    n_rows_split: tuple | None = None,
):
    """Run the full searchlight on device.

    Returns ``(scores, aux)`` where ``scores`` is {metric: [V] float32} and
    ``aux`` carries timing + optional null scores {metric: [V, P]} and
    per-vertex best alphas (CV mode).

    Parameters mirror the reference driver (searchlight.py:181-296): X_* are
    the standardized betas (NaN columns already dropped), adjacency is the
    [V, K] neighbour-index matrix, ``shuffles`` the pre-generated null
    permutations (data.py:540-561).

    ``x_all_device`` + ``n_rows_split=(n_train, n_test, n_imag)``: the
    caller already placed the replicated standardized [n_rows, V'] matrix
    on the mesh (parallel/ingest.py streaming path); X_train/X_test/X_imag
    may then be None and no host concatenation happens.
    """
    mesh = mesh or vertex_mesh()
    n_dev = len(mesh.devices.flatten())
    layout = TestLayout.from_stim_types(stim_types_test)

    if x_all_device is not None:
        if n_rows_split is None:
            raise ValueError("x_all_device requires n_rows_split=(n_train, n_test, n_imag)")
        n_train, n_test, n_imag = n_rows_split
        n_rows = n_train + n_test + n_imag
        if x_all_device.shape[0] != n_rows:
            raise ValueError(
                f"x_all_device has {x_all_device.shape[0]} rows, n_rows_split sums to {n_rows}"
            )
    else:
        n_train, n_test, n_imag = len(X_train), len(X_test), len(X_imag)
        X_all = np.concatenate([X_train, X_test, X_imag]).astype(dtype)
        n_rows = X_all.shape[0]
    v_total, k = adjacency.shape

    if block_size is None:
        block_size = _auto_block_size(n_rows, k, n_dev)

    idx_padded, v_orig = pad_to_multiple(np.asarray(adjacency, dtype=np.int32), block_size)
    mask_padded = None
    if adjacency_mask is not None:
        mask_padded, _ = pad_to_multiple(np.asarray(adjacency_mask), block_size)

    # device placement: X/Y replicated, per-block index shards over "v".
    # replicated_from_host handles multi-process meshes (every host holds the
    # full standardized betas after ingestion; see multihost.py for the
    # per-host-shard ingestion that feeds this).
    multi = jax.process_count() > 1
    X_all_d = x_all_device if x_all_device is not None else replicated_from_host(X_all, mesh)
    Y_train_d = replicated_from_host(np.asarray(Y_train, np.float32), mesh)
    Y_test_d = replicated_from_host(np.asarray(Y_test, np.float32), mesh)
    Y_imag_d = replicated_from_host(np.asarray(Y_imag, np.float32), mesh)

    use_null = shuffles is not None
    use_cv = alphas_cv is not None
    # Note: the reference's null runs always use a fixed alpha
    # (searchlight.py:240,345); combining CV with null scoring is an
    # extension so the BASELINE "alpha CV" config can emit null
    # distributions (searchlight_block_cv_with_null).
    if use_null:
        shuffles_d = replicated_from_host(np.asarray(shuffles, np.int32), mesh)
        n_perms = len(shuffles)
        rng = jax.random.PRNGKey(null_seed)
        if null_gather is None:
            from multimodal_decoding_tpu.decoding.searchlight import (
                default_null_gather,
            )

            null_gather = default_null_gather()

    results: list[dict] = []
    null_results: list[dict] = []
    n_blocks = len(idx_padded) // block_size
    # Materialise outputs to host every few blocks: keeps JAX's async dispatch
    # pipelining compute while bounding live device memory (null-mode outputs
    # are [B, P] per metric and would otherwise accumulate on device).
    flush_every = _flush_cadence(block_size, n_perms if use_null else None)
    n_hosted = 0  # results[:n_hosted] (and null_results[:n_hosted]) are host numpy

    # Shard-granular checkpointing: a killed run loses at most
    # ``checkpoint_every`` blocks instead of the whole (subject, hemi) shard
    # (the reference loses everything, SURVEY.md §5 failure-detection row).
    ckpt_done = -1
    if checkpoint_path is not None and os.path.isfile(checkpoint_path):
        if not resume:
            # overwrite semantics: start from scratch — silently resuming a
            # stale mid-run checkpoint would also inflate the reported
            # vertices_per_sec (every process sees the same ``resume`` flag,
            # so no cross-process filesystem race on the decision)
            if jax.process_index() == 0:
                os.remove(checkpoint_path)
        else:
            ck = np.load(checkpoint_path, allow_pickle=True)
            ckpt_done = int(ck["done_blocks"])
            results = list(ck["results"])
            null_results = list(ck["null_results"])
            n_hosted = len(results)  # checkpointed blocks are already host numpy
            print(f"resuming searchlight from block {ckpt_done + 1}/{n_blocks}")

    def _save_ckpt(done):
        nonlocal n_hosted
        if checkpoint_path is None:
            return
        # entries below n_hosted are already host numpy — convert only the
        # device-resident tail so checkpointing stays O(new blocks), not
        # O(total blocks).  Under multi-process this is a collective, so
        # EVERY process materialises; only process 0 publishes the file
        # (checkpoint_path must live on a filesystem all hosts can read
        # for resume — same contract as the permutation cache publish).
        n_hosted = _materialize_pending([results, null_results], n_hosted, mesh)
        if jax.process_index() != 0:
            return
        os.makedirs(os.path.dirname(checkpoint_path) or ".", exist_ok=True)
        tmp = checkpoint_path + ".tmp.npz"
        np.savez(
            tmp.removesuffix(".npz"),
            done_blocks=done,
            results=np.array(results, dtype=object),
            null_results=np.array(null_results, dtype=object),
        )
        os.replace(tmp, checkpoint_path)

    t0 = time.time()
    for b in range(n_blocks):
        if b <= ckpt_done:
            continue
        sl = slice(b * block_size, (b + 1) * block_size)
        idx_b = shard_rows_from_host(idx_padded[sl], mesh)
        mask_b = (
            shard_rows_from_host(mask_padded[sl], mesh) if mask_padded is not None else None
        )
        if use_null:
            # one derangement stream shared by both null branches: the
            # CV+null == fixed-alpha+null equivalence test depends on it
            der = jax.random.randint(
                jax.random.fold_in(rng, b), (block_size, n_perms), 0, 2, dtype=jnp.int32
            )
            if multi:
                # the PRNG stream is deterministic, so every host computed the
                # identical tensor locally; lift it to the global "v" sharding
                der = shard_rows_from_host(np.asarray(der), mesh)
        if use_cv and use_null:
            main, null = searchlight_block_cv_with_null(
                X_all_d, Y_train_d, Y_test_d, Y_imag_d, idx_b, mask_b,
                jnp.asarray(alphas_cv, dtype=jnp.float32), shuffles_d, der,
                layout=layout, n_train=n_train, n_test=n_test, precision=precision,
                cv_precision=cv_precision, cv_solver=cv_solver, cv_scorer=cv_scorer,
                cv_dtype=cv_dtype, null_gather=null_gather,
            )
            results.append(main)
            null_results.append(null)
        elif use_cv:
            out = searchlight_block_cv(
                X_all_d, Y_train_d, Y_test_d, Y_imag_d, idx_b, mask_b,
                jnp.asarray(alphas_cv, dtype=jnp.float32),
                layout=layout, n_train=n_train, n_test=n_test, precision=precision,
                cv_precision=cv_precision, cv_solver=cv_solver, cv_scorer=cv_scorer,
                cv_dtype=cv_dtype,
            )
            results.append(out)
        elif use_null:
            main, null = searchlight_block_with_null(
                X_all_d, Y_train_d, Y_test_d, Y_imag_d, idx_b, mask_b, alpha,
                shuffles_d, der,
                layout=layout, n_train=n_train, n_test=n_test, precision=precision,
                null_gather=null_gather,
            )
            results.append(main)
            null_results.append(null)
        else:
            out = searchlight_block(
                X_all_d, Y_train_d, Y_test_d, Y_imag_d, idx_b, mask_b, alpha,
                layout=layout, n_train=n_train, n_test=n_test, precision=precision,
            )
            results.append(out)
        if (b + 1) % flush_every == 0:
            n_hosted = _materialize_pending([results, null_results], n_hosted, mesh)
        if checkpoint_every and (b + 1) % checkpoint_every == 0:
            _save_ckpt(b)
        if progress and (b % 10 == 0 or b == n_blocks - 1):
            print(f"searchlight block {b + 1}/{n_blocks}", flush=True)

    # materialise + trim padding (host_numpy: multi-process-legal conversion)
    def collect(blocks):
        keys = blocks[0].keys()
        return {
            m: np.concatenate([host_numpy(blk[m], mesh) for blk in blocks])[:v_orig]
            for m in keys
        }

    scores = collect(results)
    elapsed = time.time() - t0
    # rate over the vertices THIS call computed: a resumed run must not
    # claim the checkpointed blocks' work in its vertices_per_sec
    done_before = min((ckpt_done + 1) * block_size, v_orig)
    aux = {
        "elapsed_s": elapsed,
        "vertices_per_sec": (v_orig - done_before) / elapsed,
        "block_size": block_size,
        "n_blocks": n_blocks,
    }
    if ckpt_done >= 0:
        aux["resumed_at_block"] = ckpt_done + 1
    if use_null:
        aux["null_scores"] = collect(null_results)
    if use_cv:
        aux["best_alpha"] = scores.pop("best_alpha")
    if (checkpoint_path is not None and jax.process_index() == 0
            and os.path.isfile(checkpoint_path)):
        os.remove(checkpoint_path)
    return scores, aux
