"""SPD-solve micro-benchmark: the searchlight block's real bottleneck.

Stage profiling (profile_block_stages.py) attributes ~65 ms/block (B=256) to
the batched SPD solve — the round-1 '74 ms mystery'.  For CV blocks the 30
(fold, alpha) solves dominate outright.  This times the candidate backends
on production shapes A [B, 750, 750], RHS [B, 750, 1024]:

  cho        cho_factor + cho_solve            (current parity default)
  chol-only  cholesky factorisation alone      (isolates the tri-solve cost)
  schur      recursive Schur inverse, LU base  (current fast path)
  schur-cb   recursive Schur inverse, Cholesky-inverse base
  tri-inv    one Cholesky + blocked GEMM triangular inverse + GEMMs
  eigh       symmetric eigendecomposition alone (CV amortisation candidate)

Run exclusively:  python benchmarks/profile_solvers.py [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--k", type=int, default=750)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--which", type=str,
                    default="cho,chol-only,schur,schur-cb,tri-inv,eigh")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.ops import solvers as SV

    DEF = jax.lax.Precision.DEFAULT
    B, K, D = args.b, args.k, args.d
    if jax.devices()[0].platform == "cpu":
        B, K, D = 8, 64, 32

    key = jax.random.PRNGKey(0)
    M_ = jax.random.normal(key, (B, K, K), dtype=jnp.float32)
    A = jnp.matmul(M_, jnp.swapaxes(M_, -1, -2)) / K + 10.0 * jnp.eye(K)
    RHS = jax.random.normal(jax.random.PRNGKey(1), (B, K, D), dtype=jnp.float32)
    _ = float(A[0, 0, 0])
    log(f"A [B={B}, K={K}] SPD, RHS [B, K, D={D}]")

    def cho(a, rhs):
        f = jax.scipy.linalg.cho_factor(a, lower=True)
        return jax.scipy.linalg.cho_solve(f, rhs).sum()

    def chol_only(a, rhs):
        return jnp.linalg.cholesky(a).sum()

    def schur(a, rhs):
        return jnp.matmul(SV.schur_spd_inverse(a, precision=DEF), rhs,
                          precision=DEF).sum()

    def schur_cb(a, rhs):
        return jnp.matmul(SV.schur_spd_inverse(a, precision=DEF, base_method="cholesky"),
                          rhs, precision=DEF).sum()

    def tri_inv(a, rhs):
        return jnp.matmul(SV.spd_inverse_via_tri(a, precision=DEF), rhs,
                          precision=DEF).sum()

    def eigh_only(a, rhs):
        w, v = jnp.linalg.eigh(a)
        return w.sum() + v.sum()

    def pallas64(a, rhs):
        from multimodal_decoding_tpu.ops.pallas_solvers import blocked_spd_inverse

        return jnp.matmul(blocked_spd_inverse(a, panel=64, precision=DEF), rhs,
                          precision=DEF).sum()

    def pallas128(a, rhs):
        from multimodal_decoding_tpu.ops.pallas_solvers import blocked_spd_inverse

        return jnp.matmul(blocked_spd_inverse(a, panel=128, precision=DEF), rhs,
                          precision=DEF).sum()

    def schur_pallas(a, rhs):
        return SV.spd_solve(a, rhs, method="schur-pallas", precision=DEF).sum()

    def schur_pallas375(a, rhs):
        return jnp.matmul(SV.schur_spd_inverse(a, base=375, precision=DEF,
                                               base_method="pallas"),
                          rhs, precision=DEF).sum()

    def schur_pallas128(a, rhs):
        return jnp.matmul(SV.schur_spd_inverse(a, base=128, precision=DEF,
                                               base_method="pallas"),
                          rhs, precision=DEF).sum()

    def schur_pallas256(a, rhs):
        return jnp.matmul(SV.schur_spd_inverse(a, base=256, precision=DEF,
                                               base_method="pallas"),
                          rhs, precision=DEF).sum()

    def schur_cb16(a, rhs):
        return SV.spd_solve(a, rhs, method="schur-cb16", precision=DEF).sum()

    def schur_cb16_ns(a, rhs):
        return SV.spd_solve(a, rhs, method="schur-cb16-ns", precision=DEF).sum()

    def schur_cb_256(a, rhs):
        return jnp.matmul(SV.schur_spd_inverse(a, base=256, precision=DEF,
                                               base_method="cholesky"),
                          rhs, precision=DEF).sum()

    def schur_cb_384(a, rhs):
        return jnp.matmul(SV.schur_spd_inverse(a, base=384, precision=DEF,
                                               base_method="cholesky"),
                          rhs, precision=DEF).sum()

    def schur_cb_x6(a, rhs):
        # six alpha-shifted systems solved as ONE batched inverse: amortises
        # the recursion overhead the way fit_block_cv's per-fold sweep would
        shifts = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0, 5.0], dtype=a.dtype)
        a6 = a[None] + shifts[:, None, None, None] * jnp.eye(a.shape[-1], dtype=a.dtype)
        inv6 = SV.schur_spd_inverse(a6, base=256, precision=DEF, base_method="cholesky")
        return jnp.matmul(inv6, rhs[None], precision=DEF).sum() / 6.0

    cands = {"cho": cho, "chol-only": chol_only, "schur": schur,
             "schur-cb": schur_cb, "tri-inv": tri_inv, "eigh": eigh_only,
             "schur-cb-256": schur_cb_256, "schur-cb-384": schur_cb_384,
             "schur-cb-x6": schur_cb_x6,
             "schur-cb16": schur_cb16, "schur-cb16-ns": schur_cb16_ns,
             "pallas64": pallas64, "pallas128": pallas128,
             "schur-pallas": schur_pallas, "schur-pallas-375": schur_pallas375,
             "schur-pallas-128": schur_pallas128, "schur-pallas-256": schur_pallas256}

    for name in args.which.split(","):
        fn = cands[name]
        step = jax.jit(lambda a, rhs, acc, s, _f=fn: acc + _f(a + s * 1e-6, rhs))
        try:
            t_c = time.time()
            c = step(A, RHS, jnp.float32(0.0), jnp.float32(0.0))
            _ = float(c)
            compile_s = time.time() - t_c
            t0 = time.time()
            c = jnp.float32(0.0)
            for i in range(args.iters):
                c = step(A, RHS, c, jnp.float32(i))
            final = float(c)
            dt = (time.time() - t0) / args.iters
            ok = np.isfinite(final)
            log(f"{name:10s}: {dt * 1e3:8.1f} ms/solve-batch "
                f"({dt / B * 1e6:7.1f} us/vertex) finite={ok} [compile {compile_s:.0f}s]")
        except Exception as e:  # noqa: BLE001 — report and continue
            log(f"{name:10s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
