"""Batched SPD solvers: Cholesky (LAPACK-style) vs MXU-native Schur recursion.

TPU triangular solves vectorise poorly (sequential panels off the MXU), and
profiling shows the searchlight block is solver-bound once grams run at
default MXU precision.  ``schur_spd_inverse`` re-expresses the batched SPD
inverse as a recursion of block matmuls:

    inv([[P, Q], [Qt, S]]) via P_inv (recursive), Schur T = S - Qt P_inv Q,
    T_inv (recursive), and matmul reassembly

so >95% of the FLOPs are MXU GEMMs; the recursion bottoms out at a small
``base`` block handled by jnp.linalg.inv.  For alpha-regularised gram
matrices (SPD, kappa ~ N*K/alpha) the f32 error matches the Cholesky path's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _matmul(a, b, precision):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32, precision=precision)


def schur_spd_inverse(A: jnp.ndarray, base: int = 128,
                      precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """Batched SPD inverse via recursive Schur complements.

    A [..., K, K] SPD -> A^-1, with only GEMMs above ``base`` block size.
    """
    k = A.shape[-1]
    if k <= base:
        return jnp.linalg.inv(A)
    half = (k + 1) // 2
    P = A[..., :half, :half]
    Q = A[..., :half, half:]
    S = A[..., half:, half:]

    P_inv = schur_spd_inverse(P, base, precision)
    PiQ = _matmul(P_inv, Q, precision)  # [.., h, k-h]
    T = S - _matmul(jnp.swapaxes(Q, -1, -2), PiQ, precision)
    T_inv = schur_spd_inverse(T, base, precision)

    TL = P_inv + _matmul(_matmul(PiQ, T_inv, precision), jnp.swapaxes(PiQ, -1, -2), precision)
    TR = -_matmul(PiQ, T_inv, precision)
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bottom = jnp.concatenate([BL, T_inv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def spd_solve(A: jnp.ndarray, B: jnp.ndarray, method: str = "cholesky",
              precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """Solve A X = B for batched SPD A.

    method="cholesky": jax.scipy cho_factor/cho_solve (exact-parity default).
    method="schur": MXU-native inverse + GEMM (fast path on TPU).
    """
    if method == "cholesky":
        cho = jax.scipy.linalg.cho_factor(A, lower=True)
        return jax.scipy.linalg.cho_solve(cho, B)
    if method == "schur":
        return _matmul(schur_spd_inverse(A, precision=precision), B, precision)
    raise ValueError(f"unknown SPD solver: {method}")
