"""Pallas streaming pairwise-accuracy scorer for the CV selection path.

XLA computes the CV fold scores by materialising a [B, nv, nv] cosine
distance matrix per (fold, alpha) — at production scale 1.37 GB per matrix,
~41 GB of HBM traffic per block (measured +278 ms, profile_cv_stages C5).
The accuracy only needs ``count(sim_ij < sim_ii)``, so this kernel streams
similarity TILES through VMEM and reduces them to per-row counts on the fly,
flash-attention style: the [nv, nv] matrix never exists.

STATUS: EXPERIMENTAL — interpret-mode exact, but NOT selection-parity-safe
on TPU at DEFAULT precision (measured: 28.9% alpha agreement): the kernel's
diagonal is computed in exact f32 while the off-diagonal similarities carry
bf16 MXU rounding, so near-tie comparisons flip; the XLA path is consistent
because diagonal and off-diagonals come from the SAME GEMM.  It also loses
~5% wall-clock to per-grid-step re-DMA of the constant latent block.  Fix
plan (round 3): take the diagonal from the sim tiles themselves and pin the
latents in VMEM across grid steps.  Until then cv_scorer="xla" stays the
default everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _count_kernel(p_ref, y_ref, diag_ref, out_ref, *, nv: int, precision):
    """One (vertex-tile, row-tile) step: counts[b, i] = #{j < nv: sim_ij < sim_ii}."""
    sim = jax.lax.dot_general(
        p_ref[:], y_ref[:],
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [BT, TI, NV_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sim.shape[-1]), 2)
    # diag/out ride as [.., TI, 1] blocks (TPU block rule: the last two dims
    # must be (8k, 128m) or the full array dims — a trailing 1 qualifies)
    beaten = jnp.logical_and(sim < diag_ref[:], col < nv)
    out_ref[:] = jnp.sum(beaten.astype(jnp.float32), axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def streamed_pairwise_acc(preds: jnp.ndarray, latents: jnp.ndarray,
                          precision=jax.lax.Precision.DEFAULT,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Pairwise 2-AFC accuracy [B] for preds [B, nv, D] vs latents [nv, D].

    Equivalent to ``pairwise_acc_from_dist(cosine_distances(preds, latents))``
    without materialising the distance matrix.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, nv, d = preds.shape

    p = preds / jnp.linalg.norm(preds, axis=-1, keepdims=True)
    y = latents / jnp.linalg.norm(latents, axis=-1, keepdims=True)
    diag = jnp.sum(p * y[None], axis=-1)  # [B, nv]

    ti = 128
    nv_pad = _round_up(nv, ti)
    d_pad = _round_up(d, 128)
    p = jnp.pad(p, ((0, 0), (0, nv_pad - nv), (0, d_pad - d)))
    y = jnp.pad(y, ((0, nv_pad - nv), (0, d_pad - d)))
    diag = jnp.pad(diag, ((0, 0), (0, nv_pad - nv)))

    # tile the vertex batch so (P tile + Y + sim tile) stays under VMEM
    bt = 4
    while b % bt != 0:
        bt -= 1

    counts = pl.pallas_call(
        functools.partial(_count_kernel, nv=nv, precision=precision),
        grid=(b // bt, nv_pad // ti),
        in_specs=[
            pl.BlockSpec((bt, ti, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv_pad, d_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ti, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ti, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nv_pad, 1), jnp.float32),
        interpret=interpret,
    )(p, y, diag[..., None])

    total = jnp.sum(counts[:, :nv, 0], axis=-1)
    return total / (nv * nv - nv)
