"""Stage-split profiling of the fused searchlight block (VERDICT r1 #4).

Round-1 measurement: gather+gram+XtY hits ~95% of the f32 MXU roofline
(43 ms/block) but the full block takes 117 ms — 74 ms/block of predict/
scoring/scheduling overhead to account for.  This script times progressively
larger prefixes of the block program in steady state (chained checksums,
host-readback barriers — see docs/PERF_NOTES.md for why) so the gap is
attributed to a concrete stage.

Stages:
  S1  gather + gram + XtY
  S2  S1 + SPD solve (W)
  S3  S2 + predict einsums (test+imagery)
  S4  S3 + standardize + cosine distance matrices
  S5  full block (S4 + rank reductions / score dict)

Run exclusively (single CPU core feeds the chip):
  python benchmarks/profile_block_stages.py [--blocks 40] [--block-size 256]
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
    ap.add_argument("--blocks", type=int, default=40)
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=4000)
    ap.add_argument("--precision", choices=["default", "highest"], default="highest")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.decoding.searchlight_engine import (
        TestLayout,
        fit_block,
        gather_patches,
        predict_block,
        score_block,
    )
    from multimodal_decoding_tpu.ops import metrics as M
    from multimodal_decoding_tpu.ops.solvers import spd_solve

    precision = (jax.lax.Precision.HIGHEST if args.precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n_train, v_total, k, d = args.n_train, 163842, 750, 1024
        block = args.block_size
    else:
        n_train, v_total, k, d = 200, 2048, 50, 64
        block = 64
    n_test, n_imag = 140, 3
    alpha = 1.0

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3 = jax.random.split(key, 4)
    X_all = jax.random.normal(kx, (n_train + n_test + n_imag, v_total), dtype=jnp.float32)
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    _ = float(X_all[0, 0])
    stim_types = np.array(["caption"] * 70 + ["image"] * 70)
    layout = TestLayout.from_stim_types(stim_types)
    log(f"data ready: N={n_train}, V={v_total}, K={k}, D={d}, block={block}, "
        f"precision={args.precision}")

    def block_idx(start):
        return ((start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :]) % v_total
                ).astype(jnp.int32)

    def split(patches):
        return (patches[:n_train], patches[n_train:n_train + n_test],
                patches[n_train + n_test:])

    # ---- stage programs (each returns a scalar folded into the checksum) --
    def s1(xa, ytr, yte, yim, start):
        patches = gather_patches(xa, block_idx(start), None)
        Xtr, _, _ = split(patches)
        G = jnp.einsum("nbk,nbl->bkl", Xtr, Xtr,
                       preferred_element_type=jnp.float32, precision=precision)
        XtY = jnp.einsum("nbk,nd->bkd", Xtr, ytr,
                         preferred_element_type=jnp.float32, precision=precision)
        return G.sum() + XtY.sum()

    def s2(xa, ytr, yte, yim, start):
        patches = gather_patches(xa, block_idx(start), None)
        Xtr, _, _ = split(patches)
        W = fit_block(Xtr, ytr, alpha, precision=precision)
        return W.sum()

    def s3(xa, ytr, yte, yim, start):
        patches = gather_patches(xa, block_idx(start), None)
        Xtr, Xte, Xim = split(patches)
        W = fit_block(Xtr, ytr, alpha, precision=precision)
        pt = predict_block(Xte, W, precision=precision)
        pi = predict_block(Xim, W, precision=precision)
        return pt.sum() + pi.sum()

    def s4(xa, ytr, yte, yim, start):
        patches = gather_patches(xa, block_idx(start), None)
        Xtr, Xte, Xim = split(patches)
        W = fit_block(Xtr, ytr, alpha, precision=precision)
        pt = predict_block(Xte, W, precision=precision)
        pi = predict_block(Xim, W, precision=precision)
        cap = np.asarray(layout.caption_sel)
        img = np.asarray(layout.image_sel)
        acc = jnp.float32(0.0)
        for sel in (cap, img):
            P = M.standardize(pt[:, sel, :])
            acc = acc + M.cosine_distances(P, yte[sel]).sum()
        acc = acc + M.cosine_distances(M.standardize(pi), yim).sum()
        return acc

    def s5(xa, ytr, yte, yim, start):
        patches = gather_patches(xa, block_idx(start), None)
        Xtr, Xte, Xim = split(patches)
        W = fit_block(Xtr, ytr, alpha, precision=precision)
        pt = predict_block(Xte, W, precision=precision)
        pi = predict_block(Xim, W, precision=precision)
        scores = score_block(pt, pi, yte, yim, layout)
        return sum(s.sum() for s in scores.values())

    stages = [("S1 gather+gram+XtY", s1), ("S2 +solve", s2), ("S3 +predict", s3),
              ("S4 +std+cosdist", s4), ("S5 full block", s5)]

    results = {}
    for name, fn in stages:
        step = jax.jit(lambda xa, ytr, yte, yim, start, acc, _fn=fn:
                       acc + _fn(xa, ytr, yte, yim, start))
        t_c = time.time()
        c = step(X_all, Y_train, Y_test, Y_imag, 0, jnp.float32(0.0))
        _ = float(c)
        compile_s = time.time() - t_c
        t0 = time.time()
        c = jnp.float32(0.0)
        for b in range(args.blocks):
            c = step(X_all, Y_train, Y_test, Y_imag, (b * block) % v_total, c)
        final = float(c)
        assert np.isfinite(final)
        dt = (time.time() - t0) / args.blocks
        results[name] = dt
        log(f"{name}: {dt * 1e3:7.1f} ms/block  ({block / dt:7.0f} v/s)  "
            f"[compile {compile_s:.0f}s]")

    prev = 0.0
    log("\nstage deltas:")
    for name, dt in results.items():
        log(f"  {name}: +{(dt - prev) * 1e3:7.1f} ms")
        prev = dt


if __name__ == "__main__":
    main()
