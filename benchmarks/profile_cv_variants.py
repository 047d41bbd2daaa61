"""Round-3 CV-block variant ladder: bf16 selection path, block sizes, scorers.

Measures the FULL searchlight_block_cv at production shapes across the
optimization variants (docs/PERF_NOTES.md round-3 backlog):

  base        round-2 shipped config (schur-pallas + xla scale-inv scorer)
  b16apply    bf16 cast only on the solver's apply GEMM
  bf16        full bf16 selection path (fold patches, apply, preds, scorer)
  bf16-pallas bf16 + streamed Pallas scorer

Timing: chained scalar checksums + host readback (the relay rules).
Run exclusively:  python benchmarks/profile_cv_variants.py [--blocks 6]
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
    ap.add_argument("--block-sizes", type=int, nargs="+", default=[128])
    ap.add_argument("--variants", type=str, nargs="+",
                    default=["base", "b16apply", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import multimodal_decoding_tpu.decoding.searchlight_engine as E

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n_train, v_total, k, d = 8192, 163842, 750, 1024
    else:
        n_train, v_total, k, d = 200, 2048, 50, 64
    n_test, n_imag = 140, 3
    alphas = jnp.asarray([1e2, 1e3, 1e4, 1e5, 1e6, 1e7], dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3 = jax.random.split(key, 4)
    X_all = jax.random.normal(kx, (n_train + n_test + n_imag, v_total), dtype=jnp.float32)
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    _ = float(X_all[0, 0])
    layout = E.TestLayout.from_stim_types(np.array(["caption"] * 70 + ["image"] * 70))
    log(f"data ready: N={n_train}, K={k}, D={d}")

    VARIANTS = {
        "base": dict(cv_solver="schur-pallas", cv_scorer="xla", cv_dtype=None),
        "b16apply": dict(cv_solver="schur-pallas", cv_scorer="xla",
                         cv_dtype=None, apply_only=True),
        "bf16": dict(cv_solver="schur-pallas", cv_scorer="xla",
                     cv_dtype=jnp.bfloat16),
        "bf16-pallas": dict(cv_solver="schur-pallas", cv_scorer="pallas",
                            cv_dtype=jnp.bfloat16),
        "bf16-schurcb": dict(cv_solver="schur-cb", cv_scorer="xla",
                             cv_dtype=jnp.bfloat16),
        "fused": dict(cv_solver="schur-pallas", cv_scorer="fused", cv_dtype=None),
        "fused-pallas": dict(cv_solver="schur-pallas", cv_scorer="fused-pallas",
                             cv_dtype=None),
        "fused-unroll": dict(cv_solver="schur-pallas", cv_scorer="fused",
                             cv_dtype=None, cv_unroll=True),
        "unroll": dict(cv_solver="schur-pallas", cv_scorer="xla",
                       cv_dtype=None, cv_unroll=True),
        "unroll-bf16": dict(cv_solver="schur-pallas", cv_scorer="xla",
                            cv_dtype=jnp.bfloat16, cv_unroll=True),
        # single-MXU-pass dot algorithm with f32 operands: the MXU truncates
        # on read, so no cast ops, no bf16 copies, no extra HBM — candidate
        # replacement for DEFAULT (= BF16_BF16_F32_X3, 3 passes) on the
        # whole selection path including the solver recursion GEMMs
        "algo1": dict(cv_solver="schur-pallas", cv_scorer="xla", cv_dtype=None,
                      cv_precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32),
        "algo1-cb": dict(cv_solver="schur-cb", cv_scorer="xla", cv_dtype=None,
                         cv_precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32),
        "algo1-fused-pallas": dict(
            cv_solver="schur-cb", cv_scorer="fused-pallas", cv_dtype=None,
            cv_precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32),
        "fused-inv": dict(cv_solver="schur-pallas", cv_scorer="fused-inv",
                         cv_dtype=None),
        "algo1-fused-inv": dict(
            cv_solver="schur-cb", cv_scorer="fused-inv", cv_dtype=None,
            cv_precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32),
        "abatch2": dict(cv_solver="schur-pallas", cv_scorer="xla", cv_dtype=None,
                        cv_alpha_batch=2),
        "abatch3": dict(cv_solver="schur-pallas", cv_scorer="xla", cv_dtype=None,
                        cv_alpha_batch=3),
        "abatch6": dict(cv_solver="schur-pallas", cv_scorer="xla", cv_dtype=None,
                        cv_alpha_batch=6),
        "abatch3-bf16": dict(cv_solver="schur-pallas", cv_scorer="xla",
                             cv_dtype=jnp.bfloat16, cv_alpha_batch=3),
        "algo-x3": dict(cv_solver="schur-pallas", cv_scorer="xla", cv_dtype=None,
                        cv_precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3),
    }

    for block in args.block_sizes:
        def block_idx(start):
            return ((start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :])
                    % v_total).astype(jnp.int32)

        for name in args.variants:
            spec = dict(VARIANTS[name])
            cv_precision = spec.pop("cv_precision", jax.lax.Precision.DEFAULT)
            apply_only = spec.pop("apply_only", False)
            if apply_only:
                # the monkeypatch below changes behavior WITHOUT changing the
                # jit cache key — a previously traced searchlight_block_cv
                # with identical static args would be reused and the patch
                # never executes (this silently re-measured base once)
                jax.clear_caches()
            if apply_only:
                # cv_dtype=None but apply GEMM in bf16: emulate by a solver
                # wrapper — patch spd_solve's apply via cv_dtype on solver only
                import multimodal_decoding_tpu.ops.solvers as S

                orig = S.spd_solve

                def patched(A, B, method="cholesky",
                            precision=jax.lax.Precision.DEFAULT, apply_dtype=None):
                    ad = jnp.bfloat16 if method == "schur-pallas" else apply_dtype
                    return orig(A, B, method=method, precision=precision,
                                apply_dtype=ad)

                S.spd_solve = patched
                E.spd_solve = patched
            try:
                def step(xa, ytr, yte, yim, start, acc):
                    scores = E.searchlight_block_cv(
                        xa, ytr, yte, yim, block_idx(start), None, alphas,
                        layout=layout, n_train=n_train, n_test=n_test,
                        cv_precision=cv_precision, **spec,
                    )
                    return acc + sum(s.sum() for s in scores.values() )

                jstep = jax.jit(step)
                t_c = time.time()
                c = jstep(X_all, Y_train, Y_test, Y_imag, 0, jnp.float32(0.0))
                _ = float(c)
                compile_s = time.time() - t_c
                t0 = time.time()
                c = jnp.float32(0.0)
                for b in range(args.blocks):
                    c = jstep(X_all, Y_train, Y_test, Y_imag,
                              (b * block) % v_total, c)
                ok = np.isfinite(float(c))
                dt = (time.time() - t0) / args.blocks
                log(f"B={block} {name:12s}: {dt * 1e3:7.1f} ms/block "
                    f"({block / dt:6.1f} v/s) finite={ok} [compile {compile_s:.0f}s]")
            except Exception as e:
                log(f"B={block} {name:12s}: FAILED {type(e).__name__}: {e}")
            finally:
                if apply_only:
                    S.spd_solve = orig
                    E.spd_solve = orig
                    # drop the traces built WITH the patch, or later
                    # same-static-args variants reuse them
                    jax.clear_caches()


if __name__ == "__main__":
    main()
