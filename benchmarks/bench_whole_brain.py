"""Whole-brain ridge decode benchmark (second BASELINE north-star metric).

Times the full on-device CV ridge fit at production scale — N=8192 stimuli
(reference-scale train set, SURVEY.md:30 "order of magnitude thousands"),
V=327684 surface vertices (both hemispheres), D=1024 latents, 6 alphas x 5
folds + refit + test/imagery prediction + scoring — and compares against
sklearn's GridSearchCV path measured on a feature-subsampled problem and
scaled linearly in V (gram cost is linear in the feature count).

The [N, V] x [V, N] gram is 2 N^2 V ~ 44 TFLOP — a couple of seconds at the
f32-HIGHEST MXU rate; the wall-clock is dominated by the 30 (fold, alpha)
dual-form solves on the [N, N] kernel.  X itself is 10.7 GB of HBM (the
gram contracts the V axis in place, no transpose materialisation).

Run:  python benchmarks/bench_whole_brain.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.ops.metrics import (
        ACC_CAPTIONS,
        ACC_IMAGES,
        calc_all_pairwise_accuracy_scores,
    )
    from multimodal_decoding_tpu.ops.ridge import (
        dual_ridge_fit,
        dual_ridge_predict,
        kfold_indices,
        ridge_cv_dual,
    )

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n = int(os.environ.get("WB_N", "8192"))
        v, d = 327684, 1024
        v_cpu = v // 256
    else:
        n, v, d = 300, 4096, 64
        v_cpu = v // 8
    alphas = [1e2, 1e3, 1e4, 1e5, 1e6, 1e7]

    key = jax.random.PRNGKey(0)
    kx, ky, kt, ki = jax.random.split(key, 4)
    X = jax.random.normal(kx, (n, v), dtype=jnp.float32)
    Y = jax.random.normal(ky, (n, d), dtype=jnp.float32)
    X_test = jax.random.normal(kt, (140, v), dtype=jnp.float32)
    X_imag = jax.random.normal(ki, (3, v), dtype=jnp.float32)
    Y_test = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (140, d)))
    Y_imag = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (3, d)))
    stim_types = np.array(["caption"] * 70 + ["image"] * 70)
    _ = float(X[0, 0])
    log(f"data ready on device: N={n}, V={v}, D={d}")

    # full pipeline with a host readback barrier, run twice: the first pass
    # includes one-time AOT compiles (minutes through this box's remote
    # relay; seconds + cached on production hosts), the second is the
    # per-(subject, mask, model) cost of the production sweep, which reuses
    # every program shape.
    # NB: contract the V axis in place (einsum) — an explicit X.T would
    # materialise a second 10.7 GB transpose and OOM the 16 GB chip.
    gram = jax.jit(
        lambda a: jnp.einsum("nv,mv->nm", a, a, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    )
    cross = jax.jit(
        lambda q, a: jnp.einsum("qv,nv->qn", q, a, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    )
    passes = []
    for _ in range(2):
        t0 = time.time()
        K = gram(X)
        # pass the DEVICE-resident Y: a numpy Y re-uploads ~32 MB per pass
        # through this box's tunnel (seconds; PCIe noise in production)
        best_idx, mean_scores, dual = ridge_cv_dual(K, Y, alphas, n_splits=5)
        Kq = cross(X_test, X)
        Ki = cross(X_imag, X)
        preds = np.asarray(dual_ridge_predict(Kq, dual))
        preds_imag = np.asarray(dual_ridge_predict(Ki, dual))
        passes.append(time.time() - t0)
    first_run, elapsed = passes
    scores = calc_all_pairwise_accuracy_scores(
        Y_test, preds, stim_types, Y_imag, preds_imag, standardize_predictions=True
    )
    log(f"device CV ridge fit + predict: first run {first_run:.1f}s (incl. one-time "
        f"compiles), steady state {elapsed:.1f}s | best alpha {alphas[best_idx]} "
        f"| acc captions {float(scores[ACC_CAPTIONS]):.3f} images {float(scores[ACC_IMAGES]):.3f}")

    # sklearn reference on a feature slice, scaled linearly in V
    from sklearn.linear_model import Ridge
    from sklearn.metrics import make_scorer
    from sklearn.model_selection import GridSearchCV
    from scipy.spatial.distance import cdist

    Xc = np.asarray(X[:, :v_cpu])
    Yc = np.asarray(Y)

    def acc(y_true, y_pred):
        dist = cdist(y_pred, y_true, metric="cosine")
        diag = dist.diagonal().reshape(-1, 1)
        return (diag < dist).sum() / (dist.size - diag.size)

    t0 = time.time()
    clf = GridSearchCV(
        Ridge(fit_intercept=False), dict(alpha=alphas),
        scoring=make_scorer(acc, greater_is_better=True), cv=5, n_jobs=1,
    )
    clf.fit(Xc, Yc)
    cpu_elapsed_slice = time.time() - t0
    cpu_elapsed_full = cpu_elapsed_slice * (v / v_cpu)
    log(f"sklearn GridSearchCV on V/{v // v_cpu} slice: {cpu_elapsed_slice:.1f}s "
        f"-> projected full-V single-core: {cpu_elapsed_full:.0f}s "
        f"(n_jobs=10 reference default: ~{cpu_elapsed_full / 10:.0f}s)")

    print(
        f'{{"metric": "whole_brain_ridge_fit_seconds", "value": {elapsed:.2f}, '
        f'"unit": "s steady-state (N={n}, V={v}, D={d}, 6 alphas x 5 folds + refit; '
        f'first run incl. one-time compiles: {first_run:.0f}s)", '
        f'"vs_baseline": {cpu_elapsed_full / 10 / elapsed:.1f}}}'
    )


if __name__ == "__main__":
    main()
