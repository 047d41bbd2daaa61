"""Alpha-CV + null-distribution block at production scale.

Measures searchlight_block_cv_with_null (6 alphas x 5 folds selection +
refit + P shuffled null score families) at N=8192, B=128, P=1000 — the
configuration the reference cannot express (its null runs are fixed-alpha
only, searchlight.py:240,345).  Round-2 recorded 1378 ms/block (93 v/s)
with separate score_block + null_score_block; round 3 shares the distance /
rank-count tensors between the main and null families
(searchlight_engine.score_and_null_block).

Timing: chained scalar checksums + host readback (the relay rules).
Run exclusively:  python benchmarks/profile_cv_null.py [--blocks 6]
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
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--shuffles", type=int, default=1000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import multimodal_decoding_tpu.decoding.searchlight_engine as E

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n_train, v_total, k, d = 8192, 163842, 750, 1024
        block, P = args.block_size, args.shuffles
    else:
        n_train, v_total, k, d = 200, 2048, 50, 64
        block, P = 16, 20
    n_test, n_imag = 140, 3
    alphas = jnp.asarray([1e2, 1e3, 1e4, 1e5, 1e6, 1e7], dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3 = jax.random.split(key, 4)
    X_all = jax.random.normal(kx, (n_train + n_test + n_imag, v_total),
                              dtype=jnp.float32)
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    # within-modality shuffles (data.py:554-561 semantics) + derangements
    rng = np.random.RandomState(0)
    n_cap = 70
    shuffles = np.stack([
        np.concatenate([r.permutation(n_cap), n_cap + r.permutation(n_cap)])
        for r in (np.random.RandomState(100 + p) for p in range(P))
    ]).astype(np.int32)
    ders = rng.randint(0, 2, size=(block, P)).astype(np.int32)
    shuffles_d = jnp.asarray(shuffles)
    ders_d = jnp.asarray(ders)
    _ = float(X_all[0, 0])
    layout = E.TestLayout.from_stim_types(
        np.array(["caption"] * n_cap + ["image"] * n_cap))
    log(f"data ready: N={n_train}, K={k}, D={d}, P={P}")

    cv_dtype = jnp.bfloat16 if on_accel else None
    cv_solver = "schur-pallas" if on_accel else "schur-cb"

    def step(xa, ytr, yte, yim, start, acc):
        idx = ((start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :])
               % v_total).astype(jnp.int32)
        main, null = E.searchlight_block_cv_with_null(
            xa, ytr, yte, yim, idx, None, alphas, shuffles_d, ders_d,
            layout=layout, n_train=n_train, n_test=n_test,
            cv_precision=jax.lax.Precision.DEFAULT, cv_solver=cv_solver,
            cv_dtype=cv_dtype,
        )
        return (acc + sum(s.sum() for s in main.values())
                + sum(s.sum() for s in null.values()))

    jstep = jax.jit(step)
    t_c = time.time()
    c = jstep(X_all, Y_train, Y_test, Y_imag, 0, jnp.float32(0.0))
    _ = float(c)
    log(f"compiled in {time.time() - t_c:.0f}s; timing ...")
    t0 = time.time()
    c = jnp.float32(0.0)
    for b in range(args.blocks):
        c = jstep(X_all, Y_train, Y_test, Y_imag, (b * block) % v_total, c)
    ok = np.isfinite(float(c))
    dt = (time.time() - t0) / args.blocks
    log(f"B={block} P={P} cv+null: {dt * 1e3:7.1f} ms/block "
        f"({block / dt:6.1f} v/s) finite={ok}")
    full_s = 2 * 163842 / (block / dt)
    log(f"projected full subject (2 hemis, with nulls): {full_s:.0f}s single "
        f"chip -> {full_s / 8:.0f}s on v5e-8")


if __name__ == "__main__":
    main()
