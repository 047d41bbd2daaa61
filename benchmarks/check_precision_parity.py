"""On-TPU check: f32-DEFAULT (bf16x3 MXU passes) vs f32-HIGHEST score parity.

Decides whether the benchmark/production default can use DEFAULT precision
while keeping the BASELINE 1e-4 accuracy tolerance.  Prints per-metric max
absolute score deviation over a few thousand vertices.

Run exclusively: python benchmarks/check_precision_parity.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.decoding.searchlight_engine import (
        TestLayout,
        searchlight_block,
    )

    N, B, K, D, V = 4000, 256, 750, 1024, 4096
    n_test, n_imag = 140, 3
    X_all = jax.random.normal(jax.random.PRNGKey(0), (N + n_test + n_imag, V), dtype=jnp.float32)
    Y = jax.random.normal(jax.random.PRNGKey(1), (N, D), dtype=jnp.float32)
    Yte = jax.random.normal(jax.random.PRNGKey(2), (n_test, D), dtype=jnp.float32)
    Yim = jax.random.normal(jax.random.PRNGKey(3), (n_imag, D), dtype=jnp.float32)
    print("data", float(X_all[0, 0]), flush=True)
    layout = TestLayout.from_stim_types(np.array(["caption"] * 70 + ["image"] * 70))
    idx0 = jnp.asarray(
        (np.arange(B)[:, None] + np.arange(K)[None, :]) % V, dtype=jnp.int32
    )

    def run(precision, solver):
        outs = {}
        for b in range(V // B):
            idx = (idx0 + b * B) % V
            s = searchlight_block(
                X_all, Y, Yte, Yim, idx, None, 1.0,
                layout=layout, n_train=N, n_test=n_test,
                precision=precision, solver=solver,
            )
            for m, v in s.items():
                outs.setdefault(m, []).append(np.asarray(v))
        return {m: np.concatenate(v) for m, v in outs.items()}

    t0 = time.time()
    hi = run(jax.lax.Precision.HIGHEST, "cholesky")
    print(f"HIGHEST done in {time.time() - t0:.0f}s", flush=True)
    for name, precision, solver in [
        ("DEFAULT+cholesky", jax.lax.Precision.DEFAULT, "cholesky"),
        ("DEFAULT+schur", jax.lax.Precision.DEFAULT, "schur"),
    ]:
        t0 = time.time()
        lo = run(precision, solver)
        worst = max(float(np.max(np.abs(hi[m] - lo[m]))) for m in hi)
        per = {m: float(np.max(np.abs(hi[m] - lo[m]))) for m in hi}
        print(f"{name}: {time.time() - t0:.0f}s | worst dev {worst:.2e} | {per}", flush=True)


if __name__ == "__main__":
    main()
