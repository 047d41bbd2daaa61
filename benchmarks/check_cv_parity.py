"""Fast-vs-strict CV path parity on device (companion to bench.py headline).

The CV fast path (selection at f32-DEFAULT + schur inverse, refit at
f32-HIGHEST cholesky) is only legitimate if (a) the per-vertex alpha argmax
agrees with the strict path, and (b) where it disagrees, the CV score gap at
the swap is within the noise the reference's own float16 inputs tolerate
(searchlight.py:247-248).  This measures both on device over planted-signal
blocks at production shapes.

Run exclusively:  python benchmarks/check_cv_parity.py [--blocks 8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_parity(n_blocks: int = 8, cv_solver: str | None = None,
               cv_scorer: str = "xla", cv_dtype: str | None = None) -> dict:
    """Fast-vs-strict CV parity over planted-signal blocks.

    ``cv_solver=None`` resolves to the SHIPPED default for this platform
    (decoding.searchlight.default_cv_solver) so the gate always validates
    exactly the production configuration.  Returns the summary dict that
    main() prints.  Importable so the test suite runs the gate in CI
    (CPU mode, small shapes).
    """
    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.decoding.searchlight import (
        default_cv_dtype,
        default_cv_solver,
    )
    from multimodal_decoding_tpu.decoding.searchlight_engine import (
        TestLayout,
        searchlight_block_cv,
    )

    if cv_solver is None:
        cv_solver = default_cv_solver()
    if cv_dtype is None:
        # validate the SHIPPED selection dtype (bf16 on TPU); "none" forces f32
        sel_dtype = default_cv_dtype()
    elif cv_dtype == "none":
        sel_dtype = None
    else:
        sel_dtype = jnp.bfloat16 if cv_dtype == "bfloat16" else None
    cv_dtype = "bfloat16" if sel_dtype is not None else "none"  # resolved
    log(f"validating fast path: cv_solver={cv_solver}, cv_scorer={cv_scorer}, "
        f"cv_dtype={cv_dtype}")

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n_train, v_total, k, d, block = 8192, 16384, 750, 1024, 128
    else:
        n_train, v_total, k, d, block = 200, 512, 50, 64, 64
    n_test, n_imag = 140, 3
    alphas = jnp.asarray([1e2, 1e3, 1e4, 1e5, 1e6, 1e7], dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    kx, ky1, ky2, ky3, kw = jax.random.split(key, 5)
    # planted linear signal so alpha selection is data-driven, not pure noise
    Y_train = jax.random.normal(ky1, (n_train, d), dtype=jnp.float32)
    Y_test = jax.random.normal(ky2, (n_test, d), dtype=jnp.float32)
    Y_imag = jax.random.normal(ky3, (n_imag, d), dtype=jnp.float32)
    W_true = jax.random.normal(kw, (d, v_total), dtype=jnp.float32) * 0.05
    noise = jax.random.normal(kx, (n_train + n_test + n_imag, v_total), dtype=jnp.float32)
    X_all = noise + jnp.concatenate([Y_train, Y_test, Y_imag]) @ W_true
    _ = float(X_all[0, 0])
    layout = TestLayout.from_stim_types(np.array(["caption"] * 70 + ["image"] * 70))
    log(f"data ready: N={n_train}, K={k}, D={d}, planted signal")

    def run(cv_precision, cv_solver, start, cv_scorer="xla", cv_dtype_=None):
        idx = ((start + jnp.arange(block)[:, None] + jnp.arange(k)[None, :]) % v_total
               ).astype(jnp.int32)
        return searchlight_block_cv(
            X_all, Y_train, Y_test, Y_imag, idx, None, alphas,
            layout=layout, n_train=n_train, n_test=n_test,
            cv_precision=cv_precision, cv_solver=cv_solver, cv_scorer=cv_scorer,
            cv_dtype=cv_dtype_,
        )

    agree = 0
    total = 0
    max_score_delta = 0.0
    for b in range(n_blocks):
        start = b * block
        fast = run(jax.lax.Precision.DEFAULT, cv_solver, start,
                   cv_scorer=cv_scorer, cv_dtype_=sel_dtype)
        strict = run(None, None, start, cv_scorer="strict")
        a_fast = np.asarray(fast["best_alpha"])
        a_strict = np.asarray(strict["best_alpha"])
        agree += int((a_fast == a_strict).sum())
        total += block
        for m in strict:
            if m == "best_alpha":
                continue
            delta = float(np.max(np.abs(np.asarray(fast[m]) - np.asarray(strict[m]))))
            max_score_delta = max(max_score_delta, delta)
        log(f"block {b}: alpha agreement {(a_fast == a_strict).mean():.3f}, "
            f"cum max score delta {max_score_delta:.2e}")

    log(f"\nTOTAL: alpha agreement {agree}/{total} = {agree / total:.4f}; "
        f"max final-score delta {max_score_delta:.2e}")
    return {
        "alpha_agreement": agree / total,
        "max_final_score_delta": max_score_delta,
        "blocks": n_blocks,
        "block_size": block,
        "cv_solver": cv_solver,
        "cv_scorer": cv_scorer,
        "cv_dtype": cv_dtype,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--cv-solver", type=str, default=None,
                    help="fast-path solver to validate against strict "
                         "(default: the shipped platform default, "
                         "decoding.searchlight.default_cv_solver)")
    ap.add_argument("--cv-scorer", type=str, default="xla")
    ap.add_argument("--cv-dtype", type=str, default=None,
                    choices=[None, "bfloat16", "none"],
                    help="selection-path storage dtype to validate (default: "
                         "the shipped platform default; 'none' forces f32)")
    args = ap.parse_args()
    out = run_parity(args.blocks, args.cv_solver, args.cv_scorer, args.cv_dtype)
    print(f'{{"alpha_agreement": {out["alpha_agreement"]:.4f}, '
          f'"max_final_score_delta": {out["max_final_score_delta"]:.3e}, '
          f'"blocks": {out["blocks"]}, "block_size": {out["block_size"]}, '
          f'"cv_solver": "{out["cv_solver"]}", "cv_dtype": "{out["cv_dtype"]}"}}')


if __name__ == "__main__":
    main()
