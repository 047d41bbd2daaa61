"""Fast-math (bfloat16) mode: accuracy deviation is bounded & quantified.

The reference casts searchlight inputs to float16 (searchlight.py:247-248);
our fast mode stores bfloat16 with f32 accumulation.  This test quantifies
the pairwise-accuracy deviation of the bf16 path vs the f32 parity path on
synthetic data with realistic signal structure.
"""

import numpy as np

from multimodal_decoding_tpu.decoding import searchlight_engine as E
from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight
from multimodal_decoding_tpu.parallel.mesh import vertex_mesh

import jax


def test_bf16_mode_accuracy_close_to_f32(rng):
    v, k, n_train, d = 32, 8, 60, 8
    # planted signal so accuracies are in a realistic regime (not pure chance)
    W = rng.randn(v, d)
    X_train = rng.randn(n_train, v).astype(np.float32)
    Y_train = (X_train @ W + 2.0 * rng.randn(n_train, d)).astype(np.float32)
    X_test = rng.randn(10, v).astype(np.float32)
    Y_test = (X_test @ W + 2.0 * rng.randn(10, d)).astype(np.float32)
    X_imag = rng.randn(3, v).astype(np.float32)
    Y_imag = (X_imag @ W + 2.0 * rng.randn(3, d)).astype(np.float32)
    stim_types = np.array(["caption"] * 5 + ["image"] * 5)
    adjacency = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)

    mesh = vertex_mesh(jax.devices()[:1])
    common = dict(alpha=5.0, block_size=16, progress=False, mesh=mesh)
    s32, _ = run_searchlight(
        X_train, X_test, X_imag, Y_train, Y_test, Y_imag, adjacency, stim_types, **common
    )
    import ml_dtypes

    s16, _ = run_searchlight(
        X_train, X_test, X_imag, Y_train, Y_test, Y_imag, adjacency, stim_types,
        dtype=np.dtype(ml_dtypes.bfloat16), precision=jax.lax.Precision.DEFAULT, **common
    )
    for metric in s32:
        diff = np.abs(s32[metric] - s16[metric])
        # bf16 storage can flip individual comparisons; deviations stay small
        assert np.mean(diff) < 0.03, (metric, np.mean(diff))
        assert np.max(diff) < 0.15, (metric, np.max(diff))
