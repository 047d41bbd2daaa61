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
