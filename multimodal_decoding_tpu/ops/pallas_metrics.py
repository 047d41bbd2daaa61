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


def _kernel_precision(precision):
    """Mosaic's dot lowering takes lax.Precision only — map the XLA-level
    DotAlgorithmPreset spellings to their in-kernel pass-count equivalent."""
    if isinstance(precision, jax.lax.DotAlgorithmPreset):
        if precision == jax.lax.DotAlgorithmPreset.BF16_BF16_F32:
            return jax.lax.Precision.DEFAULT
        if precision == jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3:
            return jax.lax.Precision.HIGH
        return jax.lax.Precision.HIGHEST
    return precision


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
        functools.partial(_count_kernel, nv=nv, ti=ti,
                          precision=_kernel_precision(precision)),
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


def _inv_count_kernel(x_ref, inv_ref, u_ref, out_ref, z_ref, *, nv: int,
                      ti: int, precision):
    """Fully fused alpha step: Z = inv @ U in VMEM scratch (once per batch
    index, at the first row tile), then count sim = X_tile @ Z rows.

    Removes the [B, K, nv] Z HBM roundtrip (~1.3 GB per fold-alpha) that the
    two-stage XLA-GEMM + count-kernel form pays.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z_ref[:] = jax.lax.dot_general(
            inv_ref[0], u_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    sim = jax.lax.dot_general(
        x_ref[0], z_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )[None]  # [1, TI, NV_pad]
    row = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 2)
    diag = jnp.sum(jnp.where(col == row + t * ti, sim, 0.0),
                   axis=-1, keepdims=True)
    beaten = jnp.logical_and(sim < diag, col < nv)
    out_ref[:] = jnp.sum(beaten.astype(jnp.float32), axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def streamed_acc_from_inv(Xv_b: jnp.ndarray, inv: jnp.ndarray, U: jnp.ndarray,
                          precision=jax.lax.Precision.DEFAULT,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Pairwise accuracy [B] of sim = Xv_b @ (inv @ U), Z never in HBM.

    ``Xv_b`` [B, nv, K], ``inv`` [B, K, K] = (G+aI)^-1, ``U`` [B, K, nv]
    = XtY_tr @ Yv_n^T.  Counting semantics of pairwise_acc_from_sim.
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, nv, k = Xv_b.shape
    ti = 256
    nv_pad = _round_up(nv, ti)
    k_pad = _round_up(k, 128)
    x = jnp.pad(Xv_b, ((0, 0), (0, nv_pad - nv), (0, k_pad - k)))
    iv = jnp.pad(inv, ((0, 0), (0, k_pad - k), (0, k_pad - k)))
    u = jnp.pad(U, ((0, 0), (0, k_pad - k), (0, nv_pad - nv)))

    counts = pl.pallas_call(
        functools.partial(_inv_count_kernel, nv=nv, ti=ti,
                          precision=_kernel_precision(precision)),
        grid=(b, nv_pad // ti),
        in_specs=[
            pl.BlockSpec((1, ti, k_pad), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, k_pad), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, nv_pad), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ti, 1), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nv_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k_pad, nv_pad), jnp.float32)],
        # inv + U + Z scratch + sim tile ~ 22 MB at production shapes —
        # above the 16 MB scoped-VMEM default, well under the 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(x, iv, u)

    total = jnp.sum(counts[:, :nv, 0], axis=-1)
    return total / (nv * nv - nv)


def _factor_count_kernel(x_ref, z_ref, out_ref, *, nv: int, ti: int, precision):
    """One (batch, row-tile) step of the K-factored streamed scorer.

    The FULL per-vertex factor Z [K, nv] stays resident in VMEM across all
    row tiles of a batch index (its block index ignores the row-tile axis,
    so Mosaic skips the re-fetch): at production shapes Z is only ~5 MB, so
    every row tile sees all NV columns from one GEMM — the diagonal is
    extracted from the kernel's own output (rounding-consistent with every
    off-diagonal comparison, the property that keeps alpha agreement exact).
    An earlier (t, j) column-tiled version re-streamed Z n_tiles times per
    fold-alpha (~8 GB) and lost to the dense XLA scorer.
    """
    sim = jax.lax.dot_general(
        x_ref[:], z_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [1, TI, NV_pad]
    t = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 2)
    diag = jnp.sum(jnp.where(col == row + t * ti, sim, 0.0),
                   axis=-1, keepdims=True)  # [1, TI, 1]
    beaten = jnp.logical_and(sim < diag, col < nv)
    out_ref[:] = jnp.sum(beaten.astype(jnp.float32), axis=-1, keepdims=True)


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
    ti = 256
    nv_pad = _round_up(nv, ti)
    k_pad = _round_up(k, 128)
    x = jnp.pad(Xv_b, ((0, 0), (0, nv_pad - nv), (0, k_pad - k)))
    z = jnp.pad(Z, ((0, 0), (0, k_pad - k), (0, nv_pad - nv)))

    counts = pl.pallas_call(
        functools.partial(_factor_count_kernel, nv=nv, ti=ti,
                          precision=_kernel_precision(precision)),
        grid=(b, nv_pad // ti),
        in_specs=[
            pl.BlockSpec((1, ti, k_pad), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            # full Z for this batch index, resident across row tiles
            pl.BlockSpec((1, k_pad, nv_pad), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ti, 1), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nv_pad, 1), jnp.float32),
        interpret=interpret,
    )(x, z)

    total = jnp.sum(counts[:, :nv, 0], axis=-1)
    return total / (nv * nv - nv)
