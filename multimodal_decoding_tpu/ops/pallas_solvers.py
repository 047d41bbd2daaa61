"""Pallas TPU kernels for the searchlight's batched SPD inverse.

Why this exists (measured, benchmarks/profile_solvers.py): XLA's batched
``cholesky`` on [B, 750, 750] costs 28.6 ms — ~300x off the MXU roofline —
and the SPD solve dominates the CV searchlight block (30 solves/block).
The best XLA-only reformulation (Cholesky-base Schur inverse) still pays
~22.8 ms because every recursion level round-trips HBM.

Design (follows the Pallas guide's "vectorise across the batch" rule):

* The only part XLA does badly is the *panel* factorisation.  A Pallas
  kernel factorises a [B, PB, PB] diagonal panel with Cholesky outer-product
  steps vectorised ACROSS the vertex batch — each of the PB sequential steps
  is a [B, PB(, PB)] VPU op (B x PB lanes busy), never a scalar loop — and
  immediately forward-substitutes the panel's triangular inverse the same
  way.  PB sequential steps per panel is the algorithmic minimum; the batch
  dimension keeps the VPU full while they run.

* Everything else — the off-diagonal panel application, the trailing-matrix
  rank-PB updates, assembling L^-1, and A^-1 = L^-T L^-1 — is big batched
  GEMMs that XLA schedules well; they stay at the JAX level.

The public entry is ``blocked_spd_inverse`` (driver) and the ``"pallas"``
method in ops/solvers.spd_solve.  K is padded to a panel multiple with an
identity diagonal; the pad block is exactly identity in the inverse, so
slicing back is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PANEL = 64


BASE = 8  # leaf size for the in-kernel recursion


def _bmm(a, b, precision):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _swap(a):
    return jnp.swapaxes(a, -1, -2)


def _chol_inv_masked(A):
    """Masked-loop Cholesky inverse for a small [BT, n, n] leaf.

    n sequential steps, each a [BT, n(, n)] VPU op — only used at n<=BASE
    where the O(n^3)-masked-work overhead is negligible.
    """
    pb = A.shape[-1]
    row2 = jax.lax.broadcasted_iota(jnp.int32, (pb, pb), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (pb, pb), 1)
    row = row2[None]
    col = col2[None]
    # [1, PB] index along the last axis (2D iota, TPU-safe)
    idx_last = jax.lax.broadcasted_iota(jnp.int32, (1, pb), 1)

    def chol_step(j, carry):
        A, L = carry
        diag = jnp.sum(jnp.where((row == j) & (col == j), A, 0.0),
                       axis=2, keepdims=True)  # [B, PB, 1] row j holds d^2
        diag = jnp.sum(diag, axis=1)  # [B, 1]
        inv_d = jax.lax.rsqrt(diag)  # [B, 1]
        # column j of L: rows >= j of A[:, j] / sqrt(d)  (row j lands at sqrt(d))
        a_col = jnp.sum(jnp.where(col == j, A, 0.0), axis=2)  # [B, PB]
        l_col = jnp.where(idx_last >= j, a_col * inv_d, 0.0)  # [B, PB]
        # trailing update A[i,k] -= l_col[i] l_col[k] for i,k > j
        upd = l_col[:, :, None] * l_col[:, None, :]
        A = jnp.where((row > j) & (col > j), A - upd, A)
        L = jnp.where(col == j, l_col[:, :, None], L)
        return A, L

    L = jnp.zeros_like(A)
    _, L = jax.lax.fori_loop(0, pb, chol_step, (A, L))

    inv_diag = 1.0 / jnp.sum(jnp.where(row == col, L, 0.0), axis=2)  # [B, PB]

    def subst_step(j, M):
        # M[j, :] = (e_j - sum_{k<j} L[j,k] M[k, :]) / L[j,j]
        l_row = jnp.sum(jnp.where(row == j, L, 0.0), axis=1)  # [B, PB]
        l_row = jnp.where(idx_last < j, l_row, 0.0)
        # batched matvec as broadcast-multiply-reduce: Mosaic rejects the
        # no-non-contracting-dims dot_general this would otherwise lower to
        t = jnp.sum(l_row[:, :, None] * M, axis=1)  # [B, PB]
        e_j = (idx_last == j).astype(jnp.float32)  # [1, PB]
        inv_djj = jnp.sum(jnp.where(idx_last == j, inv_diag, 0.0),
                          axis=1, keepdims=True)  # [B, 1]
        m_row = (e_j - t) * inv_djj
        return jnp.where(row == j, m_row[:, None, :], M)

    M0 = jnp.zeros_like(A)
    return jax.lax.fori_loop(0, pb, subst_step, M0)


def _chol_inv_recursive(A, precision):
    """L^-1 of chol(A) via static halving: batched MXU GEMMs above BASE,
    masked loops at the leaves.  All shapes static; runs on VMEM values."""
    n = A.shape[-1]
    if n <= BASE:
        return _chol_inv_masked(A)
    h = n // 2
    l11i = _chol_inv_recursive(A[:, :h, :h], precision)
    l21 = _bmm(A[:, h:, :h], _swap(l11i), precision)  # A21 @ L11^-T
    s = A[:, h:, h:] - _bmm(l21, _swap(l21), precision)
    l22i = _chol_inv_recursive(s, precision)
    bl = -_bmm(_bmm(l22i, l21, precision), l11i, precision)
    zeros = jnp.zeros(A.shape[:-2] + (h, n - h), dtype=jnp.float32)
    top = jnp.concatenate([l11i, zeros], axis=-1)
    bottom = jnp.concatenate([bl, l22i], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _chol_inv_panel_kernel(a_ref, linv_ref):
    """Factor a [BT, PB, PB] SPD panel and emit its triangular inverse.

    Recursive halving on VMEM values: the heavy work is batched MXU GEMMs
    at HIGHEST precision (Cholesky stability needs true f32); only the
    BASE-sized leaves run the masked sequential loop.
    """
    linv_ref[:] = _chol_inv_recursive(a_ref[:], jax.lax.Precision.HIGHEST)


def chol_inv_panel(a: jnp.ndarray, interpret: bool | None = None,
                   batch_tile: int = 32) -> jnp.ndarray:
    """[B, PB, PB] SPD panel -> L^-1 of its Cholesky factor (lower).

    The batch is gridded in ``batch_tile`` chunks so two [BT, PB, PB] f32
    buffers stay well under VMEM even at PB=128.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, pb = a.shape[0], a.shape[-1]
    # the kernel's recursion holds ~5 [BT, PB, PB] f32 live buffers; keep the
    # scoped-VMEM footprint under ~12 MB (16 MB hard limit)
    vmem_cap = max(1, (12 << 20) // (5 * 4 * pb * pb))
    bt = min(batch_tile, b, vmem_cap)
    while b % bt != 0:
        bt -= 1
    return pl.pallas_call(
        _chol_inv_panel_kernel,
        grid=(b // bt,),
        in_specs=[pl.BlockSpec((bt, pb, pb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, pb, pb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
        interpret=interpret,
    )(a.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("panel", "precision", "interpret"))
def blocked_spd_inverse(A: jnp.ndarray, panel: int = PANEL,
                        precision=jax.lax.Precision.DEFAULT,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Batched SPD inverse: Pallas panel factor/inverse + XLA GEMM updates.

    A [B, K, K] SPD -> A^-1.  K is padded to a multiple of ``panel`` with an
    identity diagonal (exact: the pad block is decoupled).
    """
    b, k = A.shape[0], A.shape[-1]
    k_pad = ((k + panel - 1) // panel) * panel
    if k_pad != k:
        pad = k_pad - k
        A = jnp.pad(A, ((0, 0), (0, pad), (0, pad)))
        eye_pad = jnp.pad(jnp.zeros((k, k), A.dtype), ((0, pad), (0, pad)),
                          constant_values=0).at[k:, k:].set(jnp.eye(pad, dtype=A.dtype))
        A = A + eye_pad[None]
    n_panels = k_pad // panel

    def mm(x, y):
        return jnp.matmul(x, y, preferred_element_type=jnp.float32, precision=precision)

    # ---- blocked right-looking Cholesky: L panels + panel inverses --------
    work = A.astype(jnp.float32)
    l_cols = []   # l_cols[p]: [B, k_pad, panel] column-panel of L (zero above)
    d_invs = []   # d_invs[p]: [B, panel, panel] inverse of the diagonal block
    for p in range(n_panels):
        lo = p * panel
        diag_block = jax.lax.dynamic_slice(
            work, (0, lo, lo), (b, panel, panel)
        )
        linv_pp = chol_inv_panel(diag_block, interpret=interpret)  # [B, PB, PB]
        # L[:, lo:, lo:lo+PB] = A_work[:, lo:, lo:lo+PB] @ L_pp^-T, rows >= lo
        a_col = jax.lax.dynamic_slice(work, (0, 0, lo), (b, k_pad, panel))
        l_col = mm(a_col, jnp.swapaxes(linv_pp, -1, -2))  # [B, k_pad, PB]
        r = jnp.arange(k_pad)[None, :, None]
        l_col = jnp.where(r >= lo, l_col, 0.0)
        # trailing update: A -= l_col l_col^T (only indices > panel matter;
        # masking keeps processed rows/cols inert)
        work = work - mm(l_col, jnp.swapaxes(l_col, -1, -2)) * (
            (jnp.arange(k_pad)[None, :, None] >= lo + panel)
            & (jnp.arange(k_pad)[None, None, :] >= lo + panel)
        ).astype(jnp.float32)
        l_cols.append(l_col)
        d_invs.append(linv_pp)

    L = jnp.concatenate(l_cols, axis=-1)  # [B, k_pad, k_pad] lower

    # ---- blocked forward substitution for L^-1 ----------------------------
    # row-panel p of L^-1: M[p] = D_inv_p @ (I_p - L[p, :] @ M_prev)
    M = jnp.zeros((b, k_pad, k_pad), dtype=jnp.float32)
    eye_full = jnp.eye(k_pad, dtype=jnp.float32)
    for p in range(n_panels):
        lo = p * panel
        l_row = jax.lax.dynamic_slice(L, (0, lo, 0), (b, panel, k_pad))
        # zero the diagonal-and-above part of this row-panel so only the
        # strictly-below-panel contribution enters the GEMM
        c = jnp.arange(k_pad)[None, None, :]
        l_row_strict = jnp.where(c < lo, l_row, 0.0)
        t = mm(l_row_strict, M)  # [B, panel, k_pad]
        rhs = eye_full[lo:lo + panel][None] - t
        m_row = mm(d_invs[p], rhs)
        M = jax.lax.dynamic_update_slice(M, m_row, (0, lo, 0))

    inv = mm(jnp.swapaxes(M, -1, -2), M)
    return inv[:, :k, :k]
