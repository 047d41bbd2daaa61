"""Pallas streaming pairwise-accuracy scorer for the CV selection path.

XLA computes the CV fold scores by materialising a [B, nv, nv] cosine
distance matrix per (fold, alpha) — at production scale 1.37 GB per matrix,
~41 GB of HBM traffic per block (measured +278 ms, profile_cv_stages C5).
The accuracy only needs ``count(sim_ij < sim_ii)``, so this kernel streams
similarity TILES through VMEM and reduces them to per-row counts on the fly,
flash-attention style: the [nv, nv] matrix never exists.

Status: selection-parity-validated on device (512/512 alpha agreement,
final-score delta 0.0).  With the scale-invariant treatment (predictions
unnormalised, like the XLA scorer) it measures 153 v/s in the CV block vs
158 v/s for the XLA scale-invariant scorer — per-call dispatch of 30 pallas
launches per block eats the distance-matrix saving.  cv_scorer="xla" stays
the default; this kernel wins when HBM capacity (not bandwidth) binds.

Rounding-consistency note (learned the hard way): an earlier version
computed the diagonal in exact f32 on the XLA side while the kernel's
similarity tiles carried bf16 MXU rounding — near-tie comparisons flipped
and on-device alpha agreement collapsed to 29%.  The kernel therefore
extracts each row's diagonal FROM ITS OWN SIM TILE (every tile holds all
NV columns), so diagonal and off-diagonals share the exact same GEMM
rounding — the same property that makes the XLA path self-consistent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _count_kernel(p_ref, y_ref, out_ref, *, nv: int, ti: int, precision):
    """One (vertex-tile, row-tile) step: counts[b, i] = #{j < nv: sim_ij < sim_ii}.

    The diagonal sim_ii is pulled out of the tile itself: row r of row-tile
    t corresponds to global row t*TI + r, and the tile holds all NV columns.
    """
    sim = jax.lax.dot_general(
        p_ref[:], y_ref[:],
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [BT, TI, NV_pad]
    t = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ti, sim.shape[-1]), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ti, sim.shape[-1]), 2)
    diag = jnp.sum(jnp.where(col == row + t * ti, sim, 0.0),
                   axis=-1, keepdims=True)  # [BT, TI, 1]
    # out rides as [.., TI, 1] blocks (TPU block rule: the last two dims
    # must be (8k, 128m) or the full array dims — a trailing 1 qualifies)
    beaten = jnp.logical_and(sim < diag, col < nv)
    out_ref[:] = jnp.sum(beaten.astype(jnp.float32), axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def streamed_pairwise_acc(preds: jnp.ndarray, latents: jnp.ndarray,
                          precision=jax.lax.Precision.DEFAULT,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Pairwise 2-AFC accuracy [B] for preds [B, nv, D] vs latents [nv, D].

    Equivalent to ``pairwise_acc_from_dist(cosine_distances(preds, latents))``
    without materialising the distance matrix.
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, nv, d = preds.shape

    # scale-invariance: prediction row norms cancel in the per-row rank
    # comparisons (the diagonal comes from the same sim rows), so only the
    # latents need unit rows — saves a [B, nv, D] materialisation
    p = preds
    y = latents / jnp.linalg.norm(latents, axis=-1, keepdims=True)

    ti = 128
    nv_pad = _round_up(nv, ti)
    d_pad = _round_up(d, 128)
    p = jnp.pad(p, ((0, 0), (0, nv_pad - nv), (0, d_pad - d)))
    y = jnp.pad(y, ((0, nv_pad - nv), (0, d_pad - d)))

    # tile the vertex batch so (P tile + Y + sim tile) stays under VMEM
    bt = 4
    while b % bt != 0:
        bt -= 1

    counts = pl.pallas_call(
        functools.partial(_count_kernel, nv=nv, ti=ti, precision=precision),
        grid=(b // bt, nv_pad // ti),
        in_specs=[
            pl.BlockSpec((bt, ti, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv_pad, d_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ti, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nv_pad, 1), jnp.float32),
        interpret=interpret,
    )(p, y)

    total = jnp.sum(counts[:, :nv, 0], axis=-1)
    return total / (nv * nv - nv)


def _factor_count_kernel(x_ref, z_ref, out_ref, diag_ref, *, nv: int, ti: int,
                         n_tiles: int, precision):
    """One (batch, row-tile, col-tile) step of the K-factored streamed scorer.

    sim tile = X row-tile @ Z col-tile computed in VMEM; the COLUMN tiles are
    visited in shifted-diagonal order (col j maps to tile (row + j) % n),
    so step j=0 of every row is its diagonal tile: the diagonal is extracted
    from the kernel's own GEMM output (rounding-consistent with every
    off-diagonal comparison — the property that keeps alpha agreement exact)
    and cached in VMEM scratch for the remaining column tiles.
    """
    t = pl.program_id(1)
    j = pl.program_id(2)
    sim = jax.lax.dot_general(
        x_ref[:], z_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [BT, TI, TI]
    col_tile = jax.lax.rem(t + j, n_tiles)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ti, ti), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ti, ti), 2)

    @pl.when(j == 0)
    def _():
        diag_ref[:] = jnp.sum(jnp.where(col == row, sim, 0.0),
                              axis=-1, keepdims=True)  # [BT, TI, 1]
        out_ref[:] = jnp.zeros_like(out_ref)

    valid = (col_tile * ti + col) < nv
    beaten = jnp.logical_and(sim < diag_ref[:], valid)
    out_ref[:] += jnp.sum(beaten.astype(jnp.float32), axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def streamed_acc_from_factors(Xv_b: jnp.ndarray, Z: jnp.ndarray,
                              precision=jax.lax.Precision.DEFAULT,
                              interpret: bool | None = None) -> jnp.ndarray:
    """Pairwise accuracy [B] of sim = Xv_b @ Z without materialising sim.

    ``Xv_b`` [B, nv, K] fold patches (leading-batch layout), ``Z`` [B, K, nv]
    = (G+aI)^-1 (XtY Yv_n^T): the K-factored form of preds @ Yv_n^T.  The
    [B, nv, nv] similarity matrix (1.4 GB at production shapes, 30x per
    block) exists only as VMEM tiles.  Scale-invariant counting semantics of
    pairwise_acc_from_sim.
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, nv, k = Xv_b.shape
    ti = 128
    nv_pad = _round_up(nv, ti)
    k_pad = _round_up(k, 128)
    x = jnp.pad(Xv_b, ((0, 0), (0, nv_pad - nv), (0, k_pad - k)))
    z = jnp.pad(Z, ((0, 0), (0, k_pad - k), (0, nv_pad - nv)))
    n_tiles = nv_pad // ti

    bt = 2
    while b % bt != 0:
        bt -= 1

    counts = pl.pallas_call(
        functools.partial(_factor_count_kernel, nv=nv, ti=ti, n_tiles=n_tiles,
                          precision=precision),
        grid=(b // bt, n_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((bt, ti, k_pad), lambda i, t, j: (i, t, 0),
                         memory_space=pltpu.VMEM),
            # shifted-diagonal column order: j=0 is the diagonal tile
            pl.BlockSpec((bt, k_pad, ti),
                         lambda i, t, j, _n=n_tiles: (i, 0, (t + j) % _n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ti, 1), lambda i, t, j: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nv_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, ti, 1), jnp.float32)],
        interpret=interpret,
    )(x, z)

    total = jnp.sum(counts[:, :nv, 0], axis=-1)
    return total / (nv * nv - nv)
