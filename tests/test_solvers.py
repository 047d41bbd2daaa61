"""SPD solver parity: Schur recursion vs Cholesky vs numpy."""

import numpy as np

from multimodal_decoding_tpu.ops.solvers import schur_spd_inverse, spd_solve


def _spd(rng, b, k, reg=None):
    X = rng.randn(b, 40 + k, k).astype(np.float32)
    A = np.einsum("bnk,bnl->bkl", X, X)
    A += (reg if reg is not None else k) * np.eye(k, dtype=np.float32)
    return A


def test_schur_inverse_matches_numpy(rng):
    for k in [16, 96, 130, 200]:
        A = _spd(rng, 3, k)
        inv = np.asarray(schur_spd_inverse(A, base=64))
        ref = np.linalg.inv(A.astype(np.float64))
        # relative error scales with condition; these are well-conditioned
        np.testing.assert_allclose(inv, ref, rtol=0, atol=2e-4 * np.abs(ref).max())
        # inverse property
        eye = np.einsum("bij,bjk->bik", A, inv)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(k), eye.shape), atol=2e-3)


def test_spd_solve_methods_agree(rng):
    A = _spd(rng, 4, 120)
    B = rng.randn(4, 120, 9).astype(np.float32)
    x_chol = np.asarray(spd_solve(A, B, method="cholesky"))
    x_schur = np.asarray(spd_solve(A, B, method="schur"))
    ref = np.linalg.solve(A.astype(np.float64), B.astype(np.float64))
    np.testing.assert_allclose(x_chol, ref, atol=5e-4 * np.abs(ref).max())
    np.testing.assert_allclose(x_schur, ref, atol=5e-4 * np.abs(ref).max())


def test_schur_solver_in_searchlight_regime(rng):
    """Realistic searchlight conditioning: alpha=1 gram from standardized data."""
    n, k = 400, 96
    X = rng.randn(4, n, k).astype(np.float32)
    A = np.einsum("bnk,bnl->bkl", X, X) + 1.0 * np.eye(k, dtype=np.float32)
    B = rng.randn(4, k, 8).astype(np.float32)
    ref = np.linalg.solve(A.astype(np.float64), B.astype(np.float64))
    x = np.asarray(spd_solve(A, B, method="schur", precision=None or __import__("jax").lax.Precision.HIGHEST))
    rel = np.abs(x - ref).max() / np.abs(ref).max()
    assert rel < 5e-3, rel


def test_new_solver_methods_agree(rng):
    """schur-cb / tri-inv match cholesky to f32 accuracy; bf16 variants are
    within their documented tolerance bands across the reference alpha range."""
    X = rng.randn(600, 64).astype(np.float32)
    G = (X.T @ X).astype(np.float32)
    B = rng.randn(64, 9).astype(np.float32)
    for alpha in (1e-1, 1e2, 1e5):
        A = (G + alpha * np.eye(64, dtype=np.float32))[None]
        ref = np.asarray(spd_solve(A, B[None], method="cholesky"))
        scale = np.abs(ref).max()
        for method, tol in (("schur-cb", 5e-5), ("tri-inv", 5e-5),
                            ("schur-cb16", 2e-2), ("schur-cb16-ns", 2e-4)):
            got = np.asarray(spd_solve(A, B[None], method=method))
            rel = np.abs(got - ref).max() / scale
            assert rel < tol, (method, alpha, rel)


def test_tri_lower_inverse_blocked(rng):
    from multimodal_decoding_tpu.ops.solvers import tri_lower_inverse

    A = _spd(rng, 2, 150)
    L = np.linalg.cholesky(A)
    L_inv = np.asarray(tri_lower_inverse(L, base=48))
    eye = np.einsum("bij,bjk->bik", L, L_inv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(150), eye.shape), atol=2e-3)
    # strictly lower-triangular output
    assert np.allclose(np.triu(L_inv, 1), 0.0, atol=1e-6)
