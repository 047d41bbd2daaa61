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


def _base_inverse(A: jnp.ndarray, method: str) -> jnp.ndarray:
    """Inverse of the recursion's base block.

    "lu": jnp.linalg.inv (partial-pivoting LU — sequential panels on TPU).
    "cholesky": L = chol(A), L^-1 by triangular solve vs I, A^-1 = L^-T L^-1 —
    for SPD blocks this avoids pivoting and keeps the heavy part a GEMM.
    """
    if method == "lu":
        return jnp.linalg.inv(A)
    if method == "cholesky":
        L = jnp.linalg.cholesky(A)
        eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
        L_inv = jax.lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True, transpose_a=False
        )
        return jnp.matmul(jnp.swapaxes(L_inv, -1, -2), L_inv,
                          preferred_element_type=jnp.float32)
    if method == "pallas":
        from multimodal_decoding_tpu.ops.pallas_solvers import chol_inv_panel

        L_inv = chol_inv_panel(A.astype(jnp.float32))
        return jnp.matmul(jnp.swapaxes(L_inv, -1, -2), L_inv,
                          preferred_element_type=jnp.float32)
    raise ValueError(f"unknown base inverse method: {method}")


def schur_spd_inverse(A: jnp.ndarray, base: int = 128,
                      precision=jax.lax.Precision.DEFAULT,
                      base_method: str = "lu") -> jnp.ndarray:
    """Batched SPD inverse via recursive Schur complements.

    A [..., K, K] SPD -> A^-1, with only GEMMs above ``base`` block size.
    The recursion keeps intermediates in A's dtype: pass a bfloat16 A for
    half the HBM traffic (the recursion is memory-bound on TPU — see
    benchmarks/profile_solvers.py); base blocks always factorise in f32.
    """
    k = A.shape[-1]
    dt = A.dtype

    def mm(a, b):
        return _matmul(a, b, precision).astype(dt)

    if k <= base:
        return _base_inverse(A.astype(jnp.float32), base_method).astype(dt)
    half = (k + 1) // 2
    P = A[..., :half, :half]
    Q = A[..., :half, half:]
    S = A[..., half:, half:]

    P_inv = schur_spd_inverse(P, base, precision, base_method)
    PiQ = mm(P_inv, Q)  # [.., h, k-h]
    T = (S.astype(jnp.float32)
         - _matmul(jnp.swapaxes(Q, -1, -2), PiQ, precision)).astype(dt)
    T_inv = schur_spd_inverse(T, base, precision, base_method)

    TL = (P_inv.astype(jnp.float32)
          + _matmul(mm(PiQ, T_inv), jnp.swapaxes(PiQ, -1, -2), precision)).astype(dt)
    TR = -mm(PiQ, T_inv)
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bottom = jnp.concatenate([BL, T_inv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def tri_lower_inverse(L: jnp.ndarray, base: int = 128,
                      precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """Batched lower-triangular inverse via blocked GEMM recursion.

    inv([[L11, 0], [L21, L22]]) = [[L11i, 0], [-L22i L21 L11i, L22i]];
    only GEMMs above ``base``, one small triangular solve vs I at the base.
    """
    k = L.shape[-1]
    if k <= base:
        eye = jnp.broadcast_to(jnp.eye(k, dtype=L.dtype), L.shape)
        return jax.lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True, transpose_a=False
        )
    half = (k + 1) // 2
    L11 = L[..., :half, :half]
    L21 = L[..., half:, :half]
    L22 = L[..., half:, half:]
    L11i = tri_lower_inverse(L11, base, precision)
    L22i = tri_lower_inverse(L22, base, precision)
    BL = -_matmul(_matmul(L22i, L21, precision), L11i, precision)
    zeros = jnp.zeros(L.shape[:-2] + (half, k - half), dtype=L.dtype)
    top = jnp.concatenate([L11i, zeros], axis=-1)
    bottom = jnp.concatenate([BL, L22i], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def spd_inverse_via_tri(A: jnp.ndarray, base: int = 128,
                        precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """SPD inverse = one Cholesky + blocked triangular inverse + one GEMM:
    A^-1 = L^-T L^-1.  Avoids the big [K, K] vs [K, D] triangular solves that
    dominate the block step (benchmarks/profile_solvers.py)."""
    L = jnp.linalg.cholesky(A)
    L_inv = tri_lower_inverse(L, base, precision)
    return _matmul(jnp.swapaxes(L_inv, -1, -2), L_inv, precision)


def spd_inverse(A: jnp.ndarray, method: str = "schur-pallas",
                precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """Batched SPD inverse with the same method vocabulary as spd_solve.

    For callers that reuse the inverse against several right-hand sides
    (the fused CV fold scorer applies it to U = XtY Yv_n^T instead of XtY,
    contracting through K < D)."""
    if method == "cholesky":
        cho = jax.scipy.linalg.cho_factor(A, lower=True)
        eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
        return jax.scipy.linalg.cho_solve(cho, eye)
    if method == "schur":
        return schur_spd_inverse(A, precision=precision)
    if method == "schur-cb":
        return schur_spd_inverse(A, precision=precision, base_method="cholesky")
    if method == "schur-pallas":
        return schur_spd_inverse(A, base=192, precision=precision,
                                 base_method="pallas")
    if method == "pallas":
        from multimodal_decoding_tpu.ops.pallas_solvers import blocked_spd_inverse

        return blocked_spd_inverse(A, precision=precision)
    raise ValueError(f"unknown SPD inverse method: {method}")


def spd_solve(A: jnp.ndarray, B: jnp.ndarray, method: str = "cholesky",
              precision=jax.lax.Precision.DEFAULT, apply_dtype=None) -> jnp.ndarray:
    """Solve A X = B for batched SPD A.

    method="cholesky": jax.scipy cho_factor/cho_solve (exact-parity default).
    method="schur": recursive-Schur MXU inverse + GEMM.
    method="schur-cb": schur with Cholesky-inverse base blocks (no LU).
    method="schur-cb16"/"schur-cb16-ns": bf16-storage recursion, optionally
      with one f32 Newton-Schulz refinement step (selection-grade).
    method="tri-inv": one Cholesky + blocked GEMM triangular inverse + GEMMs.
    method="pallas": Pallas panel-kernel blocked inverse (ops/pallas_solvers).
    method="schur-pallas": XLA Schur recursion with Pallas base blocks — the
      measured fastest on TPU (benchmarks/profile_solvers.py).

    ``apply_dtype`` (inverse-based methods only, selection-grade): cast the
    inverse and RHS to a narrow dtype for the APPLY GEMM so it runs
    single-pass on the MXU with f32 accumulation.  The recursion/factorise
    stays f32 — bf16 storage through the recursion measured SLOWER (the
    casts eat the traffic saving, docs/PERF_NOTES.md solver ladder); only
    the big clean apply GEMM benefits.
    """

    def apply(inv, rhs):
        if apply_dtype is not None:
            return _matmul(inv.astype(apply_dtype), rhs.astype(apply_dtype), precision)
        return _matmul(inv, rhs, precision)

    if method == "cholesky":
        cho = jax.scipy.linalg.cho_factor(A, lower=True)
        return jax.scipy.linalg.cho_solve(cho, B)
    if method == "schur":
        return apply(schur_spd_inverse(A, precision=precision), B)
    if method == "schur-cb":
        return apply(
            schur_spd_inverse(A, precision=precision, base_method="cholesky"), B
        )
    if method in ("schur-cb16", "schur-cb16-ns"):
        # bfloat16-storage recursion (memory-bound op: ~2x traffic saving);
        # scale-normalise first so bf16's 8-bit mantissa spans the alpha
        # range 1e2..1e7 without overflow/underflow of the Schur complements
        scale = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1)[..., None, None]
        A_s = A / scale
        inv = schur_spd_inverse(
            A_s.astype(jnp.bfloat16), precision=precision, base_method="cholesky"
        ).astype(jnp.float32)
        if method == "schur-cb16-ns":
            # one Newton-Schulz step X1 = X0 (2I - A X0): two GEMMs that
            # square the bf16 inverse's relative error — they must run at
            # true f32 (HIGHEST) or the correction is itself bf16-quality
            hi = jax.lax.Precision.HIGHEST
            eye2 = 2.0 * jnp.eye(A.shape[-1], dtype=jnp.float32)
            inv = _matmul(inv, eye2 - _matmul(A_s, inv, hi), hi)
        return _matmul(inv / scale, B, precision)
    if method == "tri-inv":
        return apply(spd_inverse_via_tri(A, precision=precision), B)
    if method == "pallas":
        from multimodal_decoding_tpu.ops.pallas_solvers import blocked_spd_inverse

        return apply(blocked_spd_inverse(A, precision=precision), B)
    if method == "schur-pallas":
        # XLA Schur recursion for the big GEMMs, Pallas batched chol-inverse
        # kernel at the (large) base blocks: the two measured winners fused
        return apply(
            schur_spd_inverse(A, base=192, precision=precision, base_method="pallas"),
            B,
        )
    raise ValueError(f"unknown SPD solver: {method}")
