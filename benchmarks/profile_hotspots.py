"""Isolated hot-op timings for the CV block at production shapes.

Times each candidate bottleneck alone (chained checksums + host readback):
solve (schur-pallas), fold scorer (xla scale-invariant f32 vs bf16-input,
pallas streamed), validation preds einsum, refit gram.  Attribution data for
the round-3 ladder — the full-block variant runs disagreed with the
stage-split model, so measure the ops in isolation.

Run exclusively:  python benchmarks/profile_hotspots.py
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
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--ops", type=str, nargs="+", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.ops import metrics as M
    from multimodal_decoding_tpu.ops.pallas_metrics import streamed_pairwise_acc
    from multimodal_decoding_tpu.ops.solvers import spd_solve

    DEF = jax.lax.Precision.DEFAULT
    HI = jax.lax.Precision.HIGHEST
    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        b, n, nv, k, d = 128, 8192, 1638, 750, 1024
    else:
        b, n, nv, k, d = 8, 128, 24, 32, 16

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    A = jax.random.normal(ks[0], (b, k, k), dtype=jnp.float32)
    A = jnp.matmul(A, jnp.swapaxes(A, 1, 2)) / k + 10.0 * jnp.eye(k)
    RHS = jax.random.normal(ks[1], (b, k, d), dtype=jnp.float32)
    preds = jax.random.normal(ks[2], (b, nv, d), dtype=jnp.float32)
    Yv_n = jax.random.normal(ks[3], (nv, d), dtype=jnp.float32)
    Yv_n = Yv_n / jnp.linalg.norm(Yv_n, axis=-1, keepdims=True)
    Xv = jax.random.normal(ks[4], (nv, b, k), dtype=jnp.float32)
    W = jax.random.normal(ks[5], (b, k, d), dtype=jnp.float32)
    patches = jax.random.normal(ks[5], (n, b, k), dtype=jnp.float32)
    Ytr = jax.random.normal(ks[1], (n, d), dtype=jnp.float32)
    _ = float(A[0, 0, 0])
    log(f"shapes: B={b} N={n} nv={nv} K={k} D={d}")

    # operands enter as jit ARGUMENTS, never closure constants (capturing
    # multi-GB arrays makes lowering take minutes — docs/PERF_NOTES.md)
    OPS = {
        "solve-schur-pallas": ((A, RHS), lambda a, r: spd_solve(a, r, "schur-pallas", DEF).sum()),
        "solve-schur-cb": ((A, RHS), lambda a, r: spd_solve(a, r, "schur-cb", DEF).sum()),
        "solve-cholesky": ((A, RHS), lambda a, r: spd_solve(a, r, "cholesky", DEF).sum()),
        "scorer-xla-f32": ((preds, Yv_n), lambda p, y: M.pairwise_acc_scale_invariant(
            p, y, precision=DEF).sum()),
        "scorer-xla-bf16in": ((preds, Yv_n), lambda p, y: M.pairwise_acc_scale_invariant(
            p.astype(jnp.bfloat16), y.astype(jnp.bfloat16), precision=DEF).sum()),
        "scorer-pallas-f32": ((preds, Yv_n), lambda p, y: streamed_pairwise_acc(
            p, y, precision=DEF).sum()),
        "preds-f32": ((Xv, W), lambda x, w: jnp.einsum(
            "nbk,bkd->bnd", x, w, preferred_element_type=jnp.float32,
            precision=DEF).sum()),
        "preds-bf16": ((Xv, W), lambda x, w: jnp.einsum(
            "nbk,bkd->bnd", x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16, precision=DEF).sum().astype(jnp.float32)),
        "gram-highest": ((patches,), lambda p: jnp.einsum(
            "nbk,nbl->bkl", p, p, preferred_element_type=jnp.float32,
            precision=HI).sum()),
        "gram-default": ((patches,), lambda p: jnp.einsum(
            "nbk,nbl->bkl", p, p, preferred_element_type=jnp.float32,
            precision=DEF).sum()),
        "gram-bf16": ((patches,), lambda p: jnp.einsum(
            "nbk,nbl->bkl", p.astype(jnp.bfloat16), p.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32, precision=DEF).sum()),
        "xty-highest": ((patches, Ytr), lambda p, y: jnp.einsum(
            "nbk,nd->bkd", p, y, preferred_element_type=jnp.float32,
            precision=HI).sum()),
        # fold-batched solve: all 5 folds in one call — does the recursion
        # overhead amortise? compare 5x solve-schur-pallas
        "solve-sp-batch640": ((jnp.tile(A, (5, 1, 1)), jnp.tile(RHS, (5, 1, 1))),
                              lambda a, r: spd_solve(a, r, "schur-pallas", DEF).sum()),
    }

    names = args.ops or list(OPS)
    for name in names:
        operands, fn = OPS[name]
        step = jax.jit(lambda acc, *ops, _f=fn: acc + _f(*ops))
        try:
            t_c = time.time()
            c = step(jnp.float32(0.0), *operands)
            _ = float(c)
            compile_s = time.time() - t_c
            t0 = time.time()
            c = jnp.float32(0.0)
            for _ in range(args.reps):
                c = step(c, *operands)
            ok = np.isfinite(float(c))
            dt = (time.time() - t0) / args.reps
            log(f"{name:18s}: {dt * 1e3:8.2f} ms  finite={ok} [compile {compile_s:.0f}s]")
        except Exception as e:
            log(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
