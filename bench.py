"""Benchmark: searchlight vertices/sec on real hardware.

Measures the BASELINE.json north-star workload — the 750-neighbour surface
searchlight at ImageBind scale (latent dim 1024) over fsaverage7 vertices —
on the available accelerator, and compares against the reference's compute
path (per-vertex sklearn Ridge + scipy scoring) measured on this machine's
CPU and extrapolated to the reference's documented ``--n-jobs 15`` process
fan-out (README.md:18-24).

All benchmark tensors are generated ON DEVICE (jax.random): this dev
environment reaches its chip through a ~25 MB/s tunnel, which would otherwise
measure the tunnel, not the machine.  Production v5e hosts feed betas over
PCIe at GB/s; the engine streams them once per subject.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
All diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cpu_reference_rate(n_train, k, d, alpha, n_sample=3) -> float:
    """Single-core sklearn rate (vertices/sec) on the same per-vertex problem."""
    from scipy.spatial.distance import cdist
    from sklearn.linear_model import Ridge
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(0)
    Xtr = rng.standard_normal((n_train, k), dtype=np.float32)
    Xte = rng.standard_normal((140, k), dtype=np.float32)
    Xim = rng.standard_normal((3, k), dtype=np.float32)
    Y_train = rng.standard_normal((n_train, d), dtype=np.float32)
    Y_test = rng.standard_normal((140, d), dtype=np.float32)
    Y_imag = rng.standard_normal((3, d), dtype=np.float32)
    cap = np.arange(140) < 70
    img = ~cap

    def acc(latents, preds, std=False):
        if std:
            preds = StandardScaler().fit_transform(preds)
        dist = cdist(preds, latents, metric="cosine")
        diag = dist.diagonal().reshape(-1, 1)
        return (diag < dist).sum() / (dist.size - diag.size)

    t0 = time.time()
    for _ in range(n_sample):
        model = Ridge(alpha=alpha, fit_intercept=False)
        model.fit(Xtr, Y_train)
        pt = model.predict(Xte)
        pi = model.predict(Xim)
        acc(Y_test[cap], pt[cap], std=True)
        acc(Y_test[img], pt[img], std=True)
        acc(Y_test[img], pt[cap], std=True)
        acc(Y_test[cap], pt[img], std=True)
        acc(Y_imag, pi, std=True)
        acc(np.concatenate((Y_imag, Y_test)), pi, std=True)
        acc(Y_imag, pi)
        acc(np.concatenate((Y_imag, Y_test)), pi)
    return n_sample / (time.time() - t0)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.decoding.searchlight_engine import (
        TestLayout,
        searchlight_block,
    )

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    log(f"devices: {jax.devices()} (platform={platform})")

    # ImageBind-searchlight scale (BASELINE.json config); trimmed on CPU dev runs
    if on_accel:
        n_train, v_total, k, d, block = 4000, 163842, 750, 1024, 256
        max_seconds = 120.0
    else:
        n_train, v_total, k, d, block = 200, 2048, 50, 64, 128
        max_seconds = 30.0

    n_test, n_imag = 140, 3
    alpha = 1.0

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3 = jax.random.split(key, 4)
    X_all = jax.random.normal(kx, (n_train + n_test + n_imag, v_total), dtype=jnp.float32)
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    X_all.block_until_ready()
    log(f"on-device data ready: N={n_train}, V={v_total}, K={k}, D={d}")

    stim_types = np.array(["caption"] * 70 + ["image"] * 70)
    layout = TestLayout.from_stim_types(stim_types)

    # ring-topology neighbourhoods computed on device (identical compute
    # profile to mesh kNN — the engine only sees an index matrix)
    @jax.jit
    def block_idx(start):
        return (start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :]) % v_total

    @jax.jit
    def run_block(xa, ytr, yte, yim, start, acc):
        scores = searchlight_block(
            xa, ytr, yte, yim, block_idx(start).astype(jnp.int32), None,
            alpha, layout=layout, n_train=n_train, n_test=n_test,
        )
        # fold the block's scores into a running checksum: chains the blocks
        # and lets a single 4-byte host readback act as a true barrier
        # (block_until_ready is not a reliable sync through relay transports)
        return acc + sum(s.sum() for s in scores.values())

    # compile + warm (host readback = real synchronisation)
    checksum = run_block(X_all, Y_train, Y_test, Y_imag, 0, jnp.float32(0.0))
    _ = float(checksum)
    log("compiled; running timed blocks ...")

    n_blocks_total = v_total // block
    t0 = time.time()
    done = 0
    checksum = jnp.float32(0.0)
    for b in range(n_blocks_total):
        checksum = run_block(X_all, Y_train, Y_test, Y_imag, b * block, checksum)
        done += 1
        if done % 40 == 0:
            _ = float(checksum)  # sync point
            if time.time() - t0 > max_seconds:
                break
    final = float(checksum)  # full barrier
    elapsed = time.time() - t0
    assert np.isfinite(final)
    vertices_done = done * block
    rate = vertices_done / elapsed
    log(f"searchlight: {vertices_done} vertices in {elapsed:.1f}s -> {rate:.0f} vertices/s "
        f"(block={block})")

    cpu_rate_1core = cpu_reference_rate(n_train, k, d, alpha)
    cpu_rate_ref = cpu_rate_1core * 15  # reference --n-jobs 15 (README.md:18-24)
    log(f"sklearn reference: {cpu_rate_1core:.2f} vertices/s single-core "
        f"-> {cpu_rate_ref:.1f} at n_jobs=15")

    full_subject_s = 2 * 163842 / rate
    log(f"projected full-subject (2 hemis, single chip) wall-clock: {full_subject_s:.0f}s; "
        f"target <300s on v5e-8 (8 chips)")

    print(json.dumps({
        "metric": "searchlight_vertices_per_sec",
        "value": round(float(rate), 2),
        "unit": "vertices/s (N=4000, K=750, D=1024, f32-highest, incl. scoring)",
        "vs_baseline": round(float(rate / cpu_rate_ref), 2),
    }))


if __name__ == "__main__":
    main()
