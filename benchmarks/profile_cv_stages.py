"""Stage-split profiling of the CV searchlight block.

The CV block at N=8192 measured 45 v/s (strict) / 76 v/s (fast) — far below
the ~300 v/s single-pass-MXU FLOP estimate.  This times progressively larger
prefixes of fit_block_cv to attribute the gap:

  C1  full gram + XtY (refit inputs, HIGHEST)
  C2  C1 + per-fold val grams (DEFAULT)
  C3  C2 + all 30 (fold, alpha) SPD solves      [--solver cholesky|schur]
  C4  C3 + validation predictions
  C5  C4 + CV scoring (cosine dists + rank means)
  C6  full searchlight_block_cv (refit + final scoring)

Run exclusively:  python benchmarks/profile_cv_stages.py [--solver schur]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--solver", type=str, default="schur-cb",
                    help="any ops/solvers.spd_solve method")
    ap.add_argument("--stages", type=str, default="123456")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.decoding.searchlight_engine import (
        TestLayout,
        gather_patches,
        searchlight_block_cv,
    )
    from multimodal_decoding_tpu.ops import metrics as M
    from multimodal_decoding_tpu.ops.ridge import kfold_indices
    from multimodal_decoding_tpu.ops.solvers import spd_solve

    HI = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT
    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n_train, v_total, k, d, block = 8192, 163842, 750, 1024, 128
    else:
        n_train, v_total, k, d, block = 200, 2048, 50, 64, 64
    n_test, n_imag = 140, 3
    alphas = jnp.asarray([1e2, 1e3, 1e4, 1e5, 1e6, 1e7], dtype=jnp.float32)
    n_splits = 5

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3 = jax.random.split(key, 4)
    X_all = jax.random.normal(kx, (n_train + n_test + n_imag, v_total), dtype=jnp.float32)
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    _ = float(X_all[0, 0])
    layout = TestLayout.from_stim_types(np.array(["caption"] * 70 + ["image"] * 70))
    folds = kfold_indices(n_train, n_splits)
    log(f"data ready: N={n_train}, K={k}, D={d}, block={block}, solver={args.solver}")

    def block_idx(start):
        return ((start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :]) % v_total
                ).astype(jnp.int32)

    def prefix(xa, ytr, start, depth):
        """Re-implements fit_block_cv up to `depth`, returning a checksum."""
        patches = gather_patches(xa, block_idx(start), None)
        Xtr = patches[:n_train]
        G_full = jnp.einsum("nbk,nbl->bkl", Xtr, Xtr,
                            preferred_element_type=jnp.float32, precision=HI)
        XtY_full = jnp.einsum("nbk,nd->bkd", Xtr, ytr,
                              preferred_element_type=jnp.float32, precision=HI)
        acc = G_full.sum() + XtY_full.sum()
        if depth == 1:
            return acc
        eye = jnp.eye(k, dtype=G_full.dtype)
        for _, val_idx in folds:
            val_idx = np.asarray(val_idx)
            Xv = Xtr[val_idx]
            Yv = ytr[val_idx]
            G_val = jnp.einsum("nbk,nbl->bkl", Xv, Xv,
                               preferred_element_type=jnp.float32, precision=DEF)
            XtY_val = jnp.einsum("nbk,nd->bkd", Xv, Yv,
                                 preferred_element_type=jnp.float32, precision=DEF)
            acc = acc + G_val.sum() + XtY_val.sum()
            if depth == 2:
                continue
            G_tr = G_full - G_val
            XtY_tr = XtY_full - XtY_val

            def one_alpha(alpha):
                W = spd_solve(G_tr + alpha * eye, XtY_tr, method=args.solver,
                              precision=DEF)
                if depth == 3:
                    return W.sum()
                preds = jnp.einsum("nbk,bkd->bnd", Xv, W,
                                   preferred_element_type=jnp.float32, precision=DEF)
                if depth == 4:
                    return preds.sum()
                dist = M.cosine_distances(preds, Yv, precision=DEF)
                return M.pairwise_acc_from_dist(dist).sum()

            acc = acc + jax.lax.map(one_alpha, alphas).sum()
        return acc

    def full_block(xa, ytr, yte, yim, start):
        scores = searchlight_block_cv(
            xa, ytr, yte, yim, block_idx(start).astype(jnp.int32), None, alphas,
            layout=layout, n_train=n_train, n_test=n_test,
            cv_precision=DEF, cv_solver=args.solver,
        )
        return sum(s.sum() for s in scores.values())

    results = {}
    for depth in [int(c) for c in args.stages]:
        if depth <= 5:
            step = jax.jit(lambda xa, ytr, yte, yim, start, acc, _d=depth:
                           acc + prefix(xa, ytr, start, _d))
        else:
            step = jax.jit(lambda xa, ytr, yte, yim, start, acc:
                           acc + full_block(xa, ytr, yte, yim, start))
        name = f"C{depth}"
        t_c = time.time()
        c = step(X_all, Y_train, Y_test, Y_imag, 0, jnp.float32(0.0))
        _ = float(c)
        compile_s = time.time() - t_c
        t0 = time.time()
        c = jnp.float32(0.0)
        for b in range(args.blocks):
            c = step(X_all, Y_train, Y_test, Y_imag, (b * block) % v_total, c)
        assert np.isfinite(float(c))
        dt = (time.time() - t0) / args.blocks
        results[name] = dt
        log(f"{name}: {dt * 1e3:8.1f} ms/block ({block / dt:6.1f} v/s) "
            f"[compile {compile_s:.0f}s]")

    prev = 0.0
    log("\nstage deltas:")
    for name, dt in results.items():
        log(f"  {name}: +{(dt - prev) * 1e3:8.1f} ms")
        prev = dt


if __name__ == "__main__":
    main()
