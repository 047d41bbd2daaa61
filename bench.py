"""Benchmark: searchlight vertices/sec on real hardware.

Measures the BASELINE.json north-star workload — the 750-neighbour surface
searchlight at ImageBind scale (latent dim 1024) over an fsaverage7
hemisphere — on the available accelerator, and compares against the
reference's compute path (per-vertex sklearn Ridge + scipy scoring) measured
on this machine's CPU and extrapolated to the reference's documented
``--n-jobs 15`` process fan-out (README.md:18-24).

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


def cpu_reference_rate(X_all, Y_train, Y_test, Y_imag, adjacency, stim_types,
                       n_train, alpha, n_sample=4) -> float:
    """Single-core sklearn rate (vertices/sec) on the same problem."""
    from scipy.spatial.distance import cdist
    from sklearn.linear_model import Ridge
    from sklearn.preprocessing import StandardScaler

    def acc(latents, preds, std=False):
        if std:
            preds = StandardScaler().fit_transform(preds)
        dist = cdist(preds, latents, metric="cosine")
        diag = dist.diagonal().reshape(-1, 1)
        return (diag < dist).sum() / (dist.size - diag.size)

    cap = stim_types == "caption"
    img = stim_types == "image"
    Xtr = X_all[:n_train]
    Xte = X_all[n_train : n_train + len(Y_test)]
    Xim = X_all[n_train + len(Y_test) :]

    t0 = time.time()
    for v in range(n_sample):
        nb = adjacency[v]
        model = Ridge(alpha=alpha, fit_intercept=False)
        model.fit(Xtr[:, nb], Y_train)
        pt = model.predict(Xte[:, nb])
        pi = model.predict(Xim[:, nb])
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

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    log(f"devices: {jax.devices()} (platform={platform})")

    # ImageBind-searchlight scale (BASELINE.json config); trimmed on CPU dev runs
    if on_accel:
        n_train, v_total, k, d = 4000, 163842, 750, 1024
        block = None
    else:
        n_train, v_total, k, d = 200, 512, 50, 64
        block = 64

    n_test, n_imag = 140, 3
    alpha = 1.0
    rng = np.random.default_rng(0)

    t_gen = time.time()
    log(f"generating synthetic problem: N={n_train}, V={v_total}, K={k}, D={d}")
    X_train = rng.standard_normal((n_train, v_total), dtype=np.float32)
    X_test = rng.standard_normal((n_test, v_total), dtype=np.float32)
    X_imag = rng.standard_normal((n_imag, v_total), dtype=np.float32)
    Y_train = rng.standard_normal((n_train, d), dtype=np.float32)
    Y_test = rng.standard_normal((n_test, d), dtype=np.float32)
    Y_imag = rng.standard_normal((n_imag, d), dtype=np.float32)
    log(f"data generated in {time.time() - t_gen:.1f}s")
    stim_types = np.array(["caption"] * 70 + ["image"] * 70)

    # ring-topology neighbourhoods (cheap stand-in for mesh kNN; identical
    # compute profile — the engine only sees an index matrix)
    base = np.arange(k, dtype=np.int64)
    adjacency = ((np.arange(v_total, dtype=np.int64)[:, None] + base[None, :]) % v_total).astype(
        np.int32
    )

    from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight

    # warmup block (compile) on a small slice
    warm_v = 512 if on_accel else 128
    _, _ = run_searchlight(
        X_train[:, :warm_v], X_test[:, :warm_v], X_imag[:, :warm_v],
        Y_train, Y_test, Y_imag,
        (adjacency[:warm_v] % warm_v).astype(np.int32), stim_types,
        alpha=alpha, block_size=block, progress=False,
    )

    log("running timed searchlight ...")
    scores, aux = run_searchlight(
        X_train, X_test, X_imag, Y_train, Y_test, Y_imag, adjacency, stim_types,
        alpha=alpha, block_size=block, progress=False,
    )
    rate = aux["vertices_per_sec"]
    log(f"searchlight: {aux['elapsed_s']:.1f}s -> {rate:.0f} vertices/s "
        f"(block={aux['block_size']})")

    cpu_rate_1core = cpu_reference_rate(
        np.concatenate([X_train, X_test, X_imag]), Y_train, Y_test, Y_imag,
        adjacency, stim_types, n_train, alpha,
    )
    # reference runs with --n-jobs 15 (README.md:18-24); extrapolate linearly
    cpu_rate_ref = cpu_rate_1core * 15
    log(f"sklearn reference: {cpu_rate_1core:.2f} vertices/s single-core "
        f"-> {cpu_rate_ref:.1f} at n_jobs=15")

    # BASELINE target context: full subject (2 hemispheres = 327684 vertices)
    full_subject_s = 2 * v_total / rate
    log(f"projected full-subject (2 hemis) wall-clock: {full_subject_s:.0f}s "
        f"(target: <300s on v5e-8)")

    print(json.dumps({
        "metric": "searchlight_vertices_per_sec",
        "value": round(float(rate), 2),
        "unit": "vertices/s (N=4000, K=750, D=1024, f32-highest, incl. scoring)",
        "vs_baseline": round(float(rate / cpu_rate_ref), 2),
    }))


if __name__ == "__main__":
    main()
