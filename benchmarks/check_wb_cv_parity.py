"""Whole-brain fast CV selection gate (VERDICT r3 #8).

Round 3 measured the whole-brain CV sweep at 0.45 s strict (HIGHEST
cho_solve, in-jit slice folds) vs 0.25-0.28 s with the schur-inverse
selection at DEFAULT precision — but left the fast path OPT-IN after a
schur-cb tie flip on a PURE-NOISE probe.  This applies the searchlight's
gate discipline on PLANTED-SIGNAL problems at production shapes: R
independent decode problems (n=8192 stimuli, D=1024 latents, gram from a
wide feature matrix, SNR swept from strong to near-noise), each CV'd with
the strict oracle and with both fast solvers; the gate is exact argmax
agreement.  The refit itself never leaves HIGHEST cholesky either way
(ops/ridge.ridge_cv_dual), so final metrics are untouched — the only
question is the alpha argmax, same as the searchlight
(benchmarks/check_cv_parity.py).

Run exclusively:  python benchmarks/check_wb_cv_parity.py [--reps 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_gate(reps: int = 16, solvers=("schur-cb", "schur-pallas")) -> dict:
    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.ops.ridge import ridge_cv_dual

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        n, f, d = 8192, 16384, 1024
    else:
        n, f, d = 96, 256, 16
    alphas = [1e2, 1e3, 1e4, 1e5, 1e6, 1e7]

    # planted-signal decode problems across an SNR sweep: betas X carry a
    # linear image of the latents Y plus noise, like the production problem
    # (the whole-brain direction is betas -> latents; the gram only needs X)
    noise_scales = np.geomspace(0.5, 32.0, reps)  # strong signal -> near-noise

    results = {s: {"agree": 0, "max_gap": 0.0, "flips": []} for s in solvers}
    t_strict = t_fast = 0.0
    for r in range(reps):
        key = jax.random.PRNGKey(1000 + r)
        k1, k2, k3 = jax.random.split(key, 3)
        Y = jax.random.normal(k1, (n, d), dtype=jnp.float32)
        G = jax.random.normal(k2, (d, f), dtype=jnp.float32) / np.sqrt(d)
        X = Y @ G + float(noise_scales[r]) * jax.random.normal(
            k3, (n, f), dtype=jnp.float32)
        K = jnp.matmul(X, X.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        K = jax.block_until_ready(K)
        Y_np = np.asarray(Y)

        t0 = time.time()
        best_strict, scores_strict, _ = ridge_cv_dual(K, Y_np, alphas)
        t_strict += time.time() - t0
        for solver in solvers:
            t0 = time.time()
            best_fast, scores_fast, _ = ridge_cv_dual(K, Y_np, alphas,
                                                      cv_solver=solver)
            t_fast += time.time() - t0
            gap = float(np.max(np.abs(scores_fast - scores_strict)))
            res = results[solver]
            res["max_gap"] = max(res["max_gap"], gap)
            if best_fast == best_strict:
                res["agree"] += 1
            else:
                res["flips"].append(
                    dict(rep=r, noise=float(noise_scales[r]),
                         strict=alphas[best_strict], fast=alphas[best_fast],
                         strict_scores=scores_strict.tolist(),
                         fast_scores=scores_fast.tolist()))
        log(f"rep {r + 1}/{reps} (noise {noise_scales[r]:.2f}): strict alpha "
            f"{alphas[best_strict]:g}, agreement so far "
            + ", ".join(f"{s}={results[s]['agree']}/{r + 1}" for s in solvers))

    out = {
        "reps": reps, "n": n, "f": f, "d": d,
        "strict_s_per_cv": t_strict / reps,
        "fast_s_per_cv": t_fast / (reps * len(solvers)),
    }
    for solver in solvers:
        res = results[solver]
        out[solver] = {
            "agreement": f"{res['agree']}/{reps}",
            "exact": res["agree"] == reps,
            "max_score_gap": res["max_gap"],
            "flips": res["flips"],
        }
        log(f"{solver}: agreement {res['agree']}/{reps}, "
            f"max CV-score gap {res['max_gap']:.3g}, "
            f"{'GATE HOLDS' if res['agree'] == reps else 'GATE FAILS'}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()
    out = run_gate(args.reps)
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
