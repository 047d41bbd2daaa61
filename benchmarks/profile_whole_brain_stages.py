"""Stage split of the whole-brain CV decode (the 12.8 s steady-state headline).

Times gram / CV sweep / refit / cross+predict separately with host-readback
barriers, to see where a selection-fast-path (DEFAULT-precision CV like the
searchlight's, argmax-gated) or other levers would pay.

Run exclusively:  python benchmarks/profile_whole_brain_stages.py
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

    from multimodal_decoding_tpu.ops.ridge import (
        _cv_fold_scores,
        dual_ridge_fit,
        dual_ridge_predict,
        kfold_indices,
    )

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n, v, d = 8192, 327684, 1024
    else:
        n, v, d = 300, 4096, 64
    alphas = jnp.asarray([1e2, 1e3, 1e4, 1e5, 1e6, 1e7], dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    kx, ky, kt = jax.random.split(key, 3)
    X = jax.random.normal(kx, (n, v), dtype=jnp.float32)
    Y = jax.random.normal(ky, (n, d), dtype=jnp.float32)
    X_test = jax.random.normal(kt, (143, v), dtype=jnp.float32)
    _ = float(X[0, 0])
    log(f"data ready: N={n}, V={v}, D={d}")

    HI = jax.lax.Precision.HIGHEST
    gram = jax.jit(lambda a: jnp.einsum(
        "nv,mv->nm", a, a, preferred_element_type=jnp.float32, precision=HI))
    gram_def = jax.jit(lambda a: jnp.einsum(
        "nv,mv->nm", a, a, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT))
    cross = jax.jit(lambda q, a: jnp.einsum(
        "qv,nv->qn", q, a, preferred_element_type=jnp.float32, precision=HI))

    def timed(fn, label, reps=2):
        # scalar-checksum readback ONLY: a full-array np.asarray pulls the
        # tensor through this box's ~5-25 MB/s tunnel and measures the
        # tunnel, not the chip (the relay rules in CLAUDE.md)
        def checksum(out):
            return float(sum(jnp.sum(x) for x in jax.tree.leaves(out)))

        out = fn()  # compile
        _ = checksum(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn()
            _ = checksum(out)
        dt = (time.time() - t0) / reps
        log(f"{label:28s}: {dt * 1e3:8.1f} ms")
        return out, dt

    K, t_gram = timed(lambda: gram(X), "gram HIGHEST [N,V]x[V,N]")
    _, t_gram_def = timed(lambda: gram_def(X), "gram DEFAULT (selection?)")
    Kq, t_cross = timed(lambda: cross(X_test, X), "cross [143,V]x[V,N]")
    # free the 10.7 GB X before the CV stage: production streams the gram
    # (ops/ridge.gram_matrix) and never holds full X on device
    del X, X_test
    import gc

    gc.collect()

    folds = kfold_indices(n, 5)

    def fold_blocks(va):
        lo, hi = int(va[0]), int(va[-1]) + 1
        K_tt = jnp.concatenate([
            jnp.concatenate([K[:lo, :lo], K[:lo, hi:]], axis=1),
            jnp.concatenate([K[hi:, :lo], K[hi:, hi:]], axis=1),
        ], axis=0)
        K_vt = jnp.concatenate([K[lo:hi, :lo], K[lo:hi, hi:]], axis=1)
        Y_tr = jnp.concatenate([Y[:lo], Y[hi:]], axis=0)
        return K_tt, K_vt, Y_tr, Y[lo:hi]

    def cv_sweep():
        scores = []
        for tr, va in folds:
            K_tt, K_vt, Y_tr, Y_va = fold_blocks(va)
            scores.append(_cv_fold_scores(K_tt, K_vt, Y_tr, Y_va, alphas))
        return jnp.stack(scores)

    _, t_cv = timed(cv_sweep, "CV sweep (5 folds x 6 alphas)")

    def cv_sweep_fast(solver):
        scores = []
        for tr, va in folds:
            K_tt, K_vt, Y_tr, Y_va = fold_blocks(va)
            scores.append(_cv_fold_scores(K_tt, K_vt, Y_tr, Y_va, alphas,
                                          solver=solver))
        return jnp.stack(scores)

    for solver in ("schur-cb", "schur-pallas"):
        try:
            fast, t_fast = timed(lambda: cv_sweep_fast(solver),
                                 f"CV sweep fast ({solver})")
        except Exception as e:
            log(f"CV sweep fast ({solver}): FAILED {type(e).__name__}: {e}")
            continue
        strict = cv_sweep()
        a_s = int(np.argmax(np.asarray(jnp.mean(strict, 0))))
        a_f = int(np.argmax(np.asarray(jnp.mean(fast, 0))))
        log(f"  selection agreement ({solver}): strict alpha idx {a_s} vs "
            f"fast {a_f} -> {'OK' if a_s == a_f else 'MISMATCH'}; "
            f"max fold-score delta "
            f"{float(jnp.max(jnp.abs(fast - strict))):.2e}")

    _, t_refit = timed(lambda: dual_ridge_fit(K, Y, 1e4), "refit cho_solve [N,N]")
    dual = dual_ridge_fit(K, Y, 1e4)
    _, t_pred = timed(lambda: dual_ridge_predict(Kq, dual), "predict [143,N]x[N,D]")

    total = t_gram + t_cv + t_refit + t_cross + t_pred
    log(f"\nstage sum: {total:.1f}s (recorded steady-state headline 12.8s)")
    log(f"gram HIGHEST->DEFAULT saving if selection-only gram were separate: "
        f"{t_gram - t_gram_def:.1f}s (but refit shares the gram — a second "
        f"gram costs {t_gram_def:.1f}s, net {t_gram_def - 0:.1f}s EXTRA unless "
        "the refit one is avoided)")


if __name__ == "__main__":
    main()
