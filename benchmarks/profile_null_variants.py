"""CV+null ladder toward the <300 s projected v5e-8 bound (VERDICT r3 #2).

Round 3 left CV+null at 972.9 ms/block = 131.6 v/s -> 314 s projected
(vs 300 s target).  This script measures the remaining null-side levers on
the FULL production block (searchlight_block_cv_with_null, N=8192, B=128,
P=1000, shipped fast-CV config):

* null_gather mode: "gather" (shipped r3) vs the one-hot einsum
  formulations ("onehot", "onehot-bf16") that move the [P, n] permuted-
  diagonal picks from the scalar/vector gather units onto the MXU —
  bit-exact by construction (integer counts < 256; asserted here on
  device before timing).
* the per-subject shuffle-count cost curve (P in {250, 500, 1000}) the
  VERDICT asked for: per-block cost vs P, so users can price
  n_permutations_per_subject (reference default 100/subject,
  searchlight.py:346).

Timing: chained scalar checksums + host readback (the relay rules).
Run exclusively:  python benchmarks/profile_null_variants.py [--blocks 6]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import multimodal_decoding_tpu.decoding.searchlight_engine as E

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n_train, v_total, k, d = 8192, 163842, 750, 1024
        block, P_full = args.block_size, 1000
        p_curve = (250, 500, 1000)
    else:
        n_train, v_total, k, d = 200, 2048, 50, 64
        block, P_full = 16, 20
        p_curve = (10, 20)
    n_test, n_imag = 140, 3
    alphas = jnp.asarray([1e2, 1e3, 1e4, 1e5, 1e6, 1e7], dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3 = jax.random.split(key, 4)
    X_all = jax.random.normal(kx, (n_train + n_test + n_imag, v_total),
                              dtype=jnp.float32)
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    n_cap = 70
    shuffles_np = np.stack([
        np.concatenate([r.permutation(n_cap), n_cap + r.permutation(n_cap)])
        for r in (np.random.RandomState(100 + p) for p in range(P_full))
    ]).astype(np.int32)
    ders_np = np.random.RandomState(0).randint(
        0, 2, size=(block, P_full)).astype(np.int32)
    _ = float(X_all[0, 0])
    layout = E.TestLayout.from_stim_types(
        np.array(["caption"] * n_cap + ["image"] * n_cap))
    log(f"data ready: N={n_train}, K={k}, D={d}")

    cv_dtype = jnp.bfloat16 if on_accel else None
    cv_solver = "schur-pallas" if on_accel else "schur-cb"

    def make_step(null_gather, P):
        shuffles_d = jnp.asarray(shuffles_np[:P])
        ders_d = jnp.asarray(ders_np[:, :P])

        def step(xa, ytr, yte, yim, start, acc):
            idx = ((start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :])
                   % v_total).astype(jnp.int32)
            main, null = E.searchlight_block_cv_with_null(
                xa, ytr, yte, yim, idx, None, alphas, shuffles_d, ders_d,
                layout=layout, n_train=n_train, n_test=n_test,
                cv_precision=jax.lax.Precision.DEFAULT, cv_solver=cv_solver,
                cv_dtype=cv_dtype, null_gather=null_gather,
            )
            return (acc + sum(s.sum() for s in main.values())
                    + sum(s.sum() for s in null.values()))

        return jax.jit(step)

    # --- exactness gate: all modes bitwise-identical on one block ---------
    def one_block(null_gather):
        idx = (jnp.arange(block)[:, None] + jnp.arange(k)[None, :]) % v_total
        main, null = E.searchlight_block_cv_with_null(
            X_all, Y_train, Y_test, Y_imag, idx.astype(jnp.int32), None,
            alphas, jnp.asarray(shuffles_np), jnp.asarray(ders_np),
            layout=layout, n_train=n_train, n_test=n_test,
            cv_precision=jax.lax.Precision.DEFAULT, cv_solver=cv_solver,
            cv_dtype=cv_dtype, null_gather=null_gather,
        )
        return {m: np.asarray(v) for m, v in null.items()}

    base_null = one_block("gather")
    for mode in ("onehot", "onehot-bf16"):
        other = one_block(mode)
        deltas = [np.max(np.abs(other[m] - base_null[m])) for m in base_null]
        exact = all(d == 0.0 for d in deltas)
        log(f"exactness gate {mode}: max|delta|={max(deltas):.3g} "
            f"{'EXACT' if exact else 'NOT EXACT'}")
        assert exact, f"{mode} not bit-exact on device"

    # --- variant timing ---------------------------------------------------
    def time_step(jstep, label):
        t_c = time.time()
        c = jstep(X_all, Y_train, Y_test, Y_imag, 0, jnp.float32(0.0))
        _ = float(c)
        t_compile = time.time() - t_c
        t0 = time.time()
        c = jnp.float32(0.0)
        for b in range(args.blocks):
            c = jstep(X_all, Y_train, Y_test, Y_imag, (b * block) % v_total, c)
        ok = np.isfinite(float(c))
        dt = (time.time() - t0) / args.blocks
        log(f"{label:28s}: {dt * 1e3:7.1f} ms/block ({block / dt:6.1f} v/s) "
            f"finite={ok} [compile {t_compile:.0f}s]")
        return dt

    results = {}
    for mode in ("gather", "onehot", "onehot-bf16"):
        results[mode] = time_step(make_step(mode, P_full),
                                  f"cv+null P={P_full} {mode}")
    best = min(results, key=results.get)
    dt = results[best]
    full_s = 2 * 163842 / (block / dt)
    log(f"best mode: {best} -> projected full subject with {P_full} nulls: "
        f"{full_s:.0f}s single chip -> {full_s / 8:.0f}s on v5e-8")

    # --- shuffle-count cost curve (best mode) -----------------------------
    for P in p_curve:
        if P == P_full:
            continue
        time_step(make_step(best, P), f"cv+null P={P} {best}")


if __name__ == "__main__":
    main()
