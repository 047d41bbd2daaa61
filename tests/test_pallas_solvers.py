"""Pallas batched SPD inverse: panel kernel + blocked driver (interpret mode
on CPU; the TPU path is exercised by benchmarks/profile_solvers.py)."""

import numpy as np
import pytest

from multimodal_decoding_tpu.ops.pallas_solvers import (
    blocked_spd_inverse,
    chol_inv_panel,
)
from multimodal_decoding_tpu.ops.solvers import spd_solve


def _spd(rng, b, k, reg=5.0):
    X = rng.randn(b, 3 * k, k).astype(np.float32)
    return np.einsum("bnk,bnl->bkl", X, X) / k + reg * np.eye(k, dtype=np.float32)


def test_panel_kernel_is_cholesky_inverse(rng):
    A = _spd(rng, 3, 16)
    linv = np.asarray(chol_inv_panel(A, interpret=True))
    for i in range(3):
        L = np.linalg.cholesky(A[i].astype(np.float64))
        ref = np.linalg.inv(L)
        np.testing.assert_allclose(linv[i], ref, atol=2e-4 * np.abs(ref).max())
    # strictly lower triangular
    assert np.allclose(np.triu(linv, 1), 0.0, atol=1e-6)


def test_blocked_inverse_matches_numpy_exact_panels(rng):
    A = _spd(rng, 2, 64)
    inv = np.asarray(blocked_spd_inverse(A, panel=16, interpret=True))
    ref = np.linalg.inv(A.astype(np.float64))
    np.testing.assert_allclose(inv, ref, atol=5e-4 * np.abs(ref).max())


def test_blocked_inverse_with_padding(rng):
    """K=70 pads to 80 with an identity corner; slice-back is exact."""
    A = _spd(rng, 2, 70)
    inv = np.asarray(blocked_spd_inverse(A, panel=16, interpret=True))
    assert inv.shape == (2, 70, 70)
    eye = np.einsum("bij,bjk->bik", A, inv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(70), eye.shape), atol=2e-3)


def test_spd_solve_pallas_method(rng):
    A = _spd(rng, 2, 40)
    B = rng.randn(2, 40, 6).astype(np.float32)
    ref = np.asarray(spd_solve(A, B, method="cholesky"))
    got = np.asarray(spd_solve(A, B, method="pallas"))
    np.testing.assert_allclose(got, ref, atol=1e-4 * np.abs(ref).max())


def test_searchlight_regime_conditioning(rng):
    """Production-like conditioning: gram + alpha grid endpoints."""
    X = rng.randn(800, 48).astype(np.float32)
    G = (X.T @ X).astype(np.float32)
    B = rng.randn(48, 5).astype(np.float32)
    for alpha in (1e-1, 1e2, 1e7):
        A = (G + alpha * np.eye(48, dtype=np.float32))[None]
        ref = np.asarray(spd_solve(A, B[None], method="cholesky"))
        got = np.asarray(spd_solve(A, B[None], method="pallas"))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-4, (alpha, rel)


def test_streamed_pairwise_acc_matches_xla(rng):
    from multimodal_decoding_tpu.ops.metrics import (
        cosine_distances,
        pairwise_acc_from_dist,
    )
    from multimodal_decoding_tpu.ops.pallas_metrics import streamed_pairwise_acc

    preds = rng.randn(3, 37, 20).astype(np.float32)
    latents = rng.randn(37, 20).astype(np.float32)
    ref = np.asarray(pairwise_acc_from_dist(cosine_distances(preds, latents)))
    got = np.asarray(streamed_pairwise_acc(preds, latents, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_cv_scorer_pallas_matches_xla(rng):
    import jax

    from multimodal_decoding_tpu.decoding import searchlight_engine as E

    n_train, v, k, d = 50, 6, 5, 5
    Xtr = rng.randn(n_train, v).astype(np.float32)
    W = rng.randn(v, d)
    Ytr = (Xtr @ W + 0.7 * rng.randn(n_train, d)).astype(np.float32)
    Xte = rng.randn(10, v).astype(np.float32)
    Xim = rng.randn(3, v).astype(np.float32)
    Yte = rng.randn(10, d).astype(np.float32)
    Yim = rng.randn(3, d).astype(np.float32)
    adj = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)
    layout = E.TestLayout.from_stim_types(np.array(["caption"] * 5 + ["image"] * 5))
    X_all = np.concatenate([Xtr, Xte, Xim])
    alphas = np.asarray([1e-1, 1e1, 1e3], dtype=np.float32)
    common = dict(layout=layout, n_train=n_train, n_test=10)

    ref = E.searchlight_block_cv(X_all, Ytr, Yte, Yim, adj, None, alphas, **common)
    got = E.searchlight_block_cv(
        X_all, Ytr, Yte, Yim, adj, None, alphas,
        cv_precision=jax.lax.Precision.DEFAULT, cv_solver="schur-pallas",
        cv_scorer="pallas", **common,
    )
    np.testing.assert_array_equal(got["best_alpha"], ref["best_alpha"])
    for m in ref:
        np.testing.assert_allclose(got[m], ref[m], atol=1e-5, err_msg=m)
