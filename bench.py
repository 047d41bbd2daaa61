"""Benchmark: alpha-CV searchlight vertices/sec on real hardware.

Measures THE BASELINE.json north-star workload — the 750-neighbour surface
searchlight with PER-VERTEX ALPHA CROSS-VALIDATION (6 alphas x 5 folds,
GridSearchCV-parity splits) at ImageBind scale (latent dim 1024) over
fsaverage7 vertices — on the available accelerator, and compares against the
reference's compute path (per-vertex sklearn Ridge + GridSearchCV + scipy
scoring) measured on this machine's CPU and extrapolated to the reference's
documented ``--n-jobs 15`` process fan-out (README.md:18-24).

Train-set size: the reference never records its N (stimulus counts are
data-driven, data.py:345-384; SURVEY.md:30 "order of magnitude thousands").
We bench at N=8192 — double the round-1 4000 and in the upper range of the
plausible per-subject count — so the gram-cost denominator is conservative.

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

ALPHAS = [1e2, 1e3, 1e4, 1e5, 1e6, 1e7]  # ridge_regression_decoding.py:20-21
N_SPLITS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cpu_reference_rate(n_train, k, d) -> float:
    """Single-core sklearn rate (vertices/sec) on the same per-vertex CV
    problem: GridSearchCV(Ridge, 6 alphas, cv=5) + the full score family."""
    from scipy.spatial.distance import cdist
    from sklearn.linear_model import Ridge
    from sklearn.metrics import make_scorer
    from sklearn.model_selection import GridSearchCV
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
    clf = GridSearchCV(
        Ridge(fit_intercept=False), dict(alpha=ALPHAS),
        scoring=make_scorer(acc, greater_is_better=True), cv=N_SPLITS, n_jobs=1,
    )
    clf.fit(Xtr, Y_train)
    pt = clf.predict(Xte)
    pi = clf.predict(Xim)
    acc(Y_test[cap], pt[cap], std=True)
    acc(Y_test[img], pt[img], std=True)
    acc(Y_test[img], pt[cap], std=True)
    acc(Y_test[cap], pt[img], std=True)
    acc(Y_imag, pi, std=True)
    acc(np.concatenate((Y_imag, Y_test)), pi, std=True)
    acc(Y_imag, pi)
    acc(np.concatenate((Y_imag, Y_test)), pi)
    return 1.0 / (time.time() - t0)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.decoding.searchlight_engine import (
        TestLayout,
        searchlight_block_cv,
    )

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    log(f"devices: {jax.devices()} (platform={platform})")

    # ImageBind-searchlight scale (BASELINE.json config); trimmed on CPU dev runs
    if on_accel:
        n_train, v_total, k, d, block = 8192, 163842, 750, 1024, 128
        block = int(os.environ.get("BENCH_BLOCK", block))
        max_seconds = float(os.environ.get("BENCH_SECONDS", 150.0))
    else:
        n_train, v_total, k, d, block = 200, 1024, 50, 64, 64
        max_seconds = 30.0
    cpu_n = n_train

    n_test, n_imag = 140, 3

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3 = jax.random.split(key, 4)
    X_all = jax.random.normal(kx, (n_train + n_test + n_imag, v_total), dtype=jnp.float32)
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    alphas = jnp.asarray(ALPHAS, dtype=jnp.float32)
    _ = float(X_all[0, 0])  # host readback = real barrier through the relay
    log(f"on-device data ready: N={n_train}, V={v_total}, K={k}, D={d}, "
        f"CV={len(ALPHAS)} alphas x {N_SPLITS} folds")

    stim_types = np.array(["caption"] * 70 + ["image"] * 70)
    layout = TestLayout.from_stim_types(stim_types)

    # ring-topology neighbourhoods computed on device (identical compute
    # profile to mesh kNN — the engine only sees an index matrix)
    @jax.jit
    def block_idx(start):
        return (start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :]) % v_total

    def make_run_block(cv_precision, cv_solver, cv_scorer="xla", cv_dtype=None):
        @jax.jit
        def run_block(xa, ytr, yte, yim, start, acc):
            scores = searchlight_block_cv(
                xa, ytr, yte, yim, block_idx(start).astype(jnp.int32), None, alphas,
                layout=layout, n_train=n_train, n_test=n_test, n_splits=N_SPLITS,
                cv_precision=cv_precision, cv_solver=cv_solver, cv_scorer=cv_scorer,
                cv_dtype=cv_dtype,
            )
            # fold the block's scores into a running checksum: chains the
            # blocks and lets a single 4-byte host readback act as a true
            # barrier (block_until_ready is not reliable through relays)
            return acc + sum(s.sum() for s in scores.values())

        return run_block

    def timed_run(run_block, budget_s, label):
        t_c = time.time()
        checksum = run_block(X_all, Y_train, Y_test, Y_imag, 0, jnp.float32(0.0))
        _ = float(checksum)
        log(f"[{label}] compiled in {time.time() - t_c:.0f}s; timing ...")
        t0 = time.time()
        done = 0
        checksum = jnp.float32(0.0)
        for b in range(v_total // block):
            checksum = run_block(X_all, Y_train, Y_test, Y_imag, b * block, checksum)
            done += 1
            if done % 10 == 0:
                _ = float(checksum)  # sync point
                if time.time() - t0 > budget_s:
                    break
        final = float(checksum)  # full barrier
        elapsed = time.time() - t0
        assert np.isfinite(final)
        rate = done * block / elapsed
        log(f"[{label}] {done * block} vertices in {elapsed:.1f}s -> {rate:.0f} v/s")
        return rate

    # fast CV-selection path (headline): argmax-only parity obligation ->
    # DEFAULT-precision MXU passes + Cholesky-base Schur inverse (the solver
    # micro-benchmark winner); refit stays f32-HIGHEST cholesky.  Selection
    # agreement vs the strict path: benchmarks/check_cv_parity.py (768/768).
    # cv_scorer="pallas" (streamed, no [nv,nv] materialisation) measured 138
    # v/s vs 146 for the XLA scorer here: the constant-index Y block is
    # re-DMA'd per grid step, so it loses on this chip despite the smaller
    # footprint; revisit with explicit VMEM residency (round-3 backlog).
    # round-3 addition: bf16 SELECTION-path storage (per-fold slice casts;
    # halves the fold-scorer HBM traffic, 158 -> 164 v/s) — on-device parity
    # 1024/1024 alpha agreement, 0.0 final-score delta; the refit never
    # touches the bf16 copies.  Mirrors decoding.searchlight.default_cv_dtype.
    rate = timed_run(
        make_run_block(jax.lax.Precision.DEFAULT, "schur-pallas", "xla",
                       jnp.bfloat16 if on_accel else None),
        max_seconds, "cv-fast",
    )
    if os.environ.get("BENCH_STRICT", "1") != "0":
        # strict all-HIGHEST cholesky path with the distance-matrix scorer
        # (the conservative parity mode, exactly what check_cv_parity's
        # reference arm runs)
        rate_strict = timed_run(
            make_run_block(None, None, "strict"), max_seconds / 2, "cv-strict"
        )
        log(f"fast/strict speedup: {rate / rate_strict:.2f}x")

    # --- shipped CV+null certification (VERDICT r4 #3) -------------------
    # The 252 s-projected claim previously lived only in PERF_NOTES via
    # profile_null_variants.py; here the driver contract itself times the
    # SHIPPED null-enabled configuration — resolved through the same
    # default_* functions the production CLI uses — so every BENCH_r*.json
    # carries driver-captured CV+null evidence.
    null_rate = None
    if os.environ.get("BENCH_NULL", "1") != "0":
        from multimodal_decoding_tpu.decoding.searchlight import (
            default_cv_dtype,
            default_cv_solver,
            default_null_gather,
        )
        from multimodal_decoding_tpu.decoding.searchlight_engine import (
            searchlight_block_cv_with_null,
        )

        P = 1000 if on_accel else 8  # reference: 100/subject x 10 subjects-ish
        n_cap = n_test // 2
        shuffles = jnp.asarray(np.stack([
            np.concatenate([r.permutation(n_cap), n_cap + r.permutation(n_cap)])
            for r in (np.random.RandomState(100 + p) for p in range(P))
        ]).astype(np.int32))
        ders = jnp.asarray(np.random.RandomState(0).randint(
            0, 2, size=(block, P)).astype(np.int32))
        ng, cs, cd = default_null_gather(), default_cv_solver(), default_cv_dtype()
        log(f"[cv+null] shipped config: null_gather={ng}, cv_solver={cs}, "
            f"cv_dtype={cd}, P={P}")

        @jax.jit
        def run_block_null(xa, ytr, yte, yim, start, acc):
            main, null = searchlight_block_cv_with_null(
                xa, ytr, yte, yim, block_idx(start).astype(jnp.int32), None,
                alphas, shuffles, ders, layout=layout, n_train=n_train,
                n_test=n_test, n_splits=N_SPLITS,
                cv_precision=jax.lax.Precision.DEFAULT, cv_solver=cs,
                cv_dtype=cd, null_gather=ng,
            )
            return (acc + sum(s.sum() for s in main.values())
                    + sum(s.sum() for s in null.values()))

        null_budget = float(os.environ.get("BENCH_NULL_SECONDS",
                                           max_seconds * 0.8))
        null_rate = timed_run(run_block_null, null_budget, "cv+null")
        null_subject_s = 2 * 163842 / null_rate
        log(f"[cv+null] projected full-subject (2 hemis, P={P}): "
            f"{null_subject_s:.0f}s single chip -> {null_subject_s / 8:.0f}s "
            f"on v5e-8 (BASELINE CV+null bound <300s)")

    cpu_rate_1core = cpu_reference_rate(cpu_n, k, d)
    cpu_rate_ref = cpu_rate_1core * 15  # reference --n-jobs 15 (README.md:18-24)
    log(f"sklearn GridSearchCV reference: {cpu_rate_1core:.4f} vertices/s single-core "
        f"-> {cpu_rate_ref:.3f} at n_jobs=15")

    full_subject_s = 2 * 163842 / rate
    log(f"projected full-subject (2 hemis) wall-clock: {full_subject_s:.0f}s single chip "
        f"-> {full_subject_s / 8:.0f}s on v5e-8 (vertex sharding is collective-free); "
        f"BASELINE target <300s on v5e-8")

    out = {
        "metric": "searchlight_cv_vertices_per_sec",
        "value": round(float(rate), 2),
        "unit": (f"vertices/s (N={n_train}, K={k}, D={d}, 6 alphas x 5-fold CV; "
                 "selection bf16-storage/f32-accum + pallas-base schur inverse, "
                 "refit f32-highest; incl. scoring)"),
        "vs_baseline": round(float(rate / cpu_rate_ref), 2),
    }
    if null_rate is not None:
        out["cv_null_vertices_per_sec"] = round(float(null_rate), 2)
        out["cv_null_projected_v5e8_s"] = round(2 * 163842 / null_rate / 8, 1)
        out["cv_null_config"] = (f"shipped defaults: null_gather={ng}, "
                                 f"cv_solver={cs}, P={P} permutations")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
