"""Multi-chip compute steps: shard_map over a device mesh.

The two sharded primitives matching this project's parallelism inventory
(SURVEY.md §2b):

* ``sharded_gram``: the whole-brain gram ``K = X X^T`` with the FEATURE axis
  (voxels, up to ~327k) sharded across devices — each chip multiplies its
  feature slab, a psum over ICI reduces the partial grams.  This is the
  tensor-parallel analogue for the dual ridge solve.

* ``sharded_searchlight_step``: the fused searchlight block (gather -> gram
  -> Cholesky -> predict -> score) with the VERTEX axis sharded — the
  project's "sequence parallelism" (the vertex dim is the long axis).  Betas
  are replicated, per-device vertex blocks compute locally, score maps are
  all-gathered.

Both are exercised on an N-virtual-device CPU mesh by tests and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from multimodal_decoding_tpu.decoding.searchlight_engine import (
    TestLayout,
    fit_block,
    gather_patches,
    predict_block,
    score_block,
)
from multimodal_decoding_tpu.ops.ridge import dual_ridge_fit, dual_ridge_predict

HIGHEST = jax.lax.Precision.HIGHEST


def sharded_gram(X: jax.Array, mesh: Mesh, axis: str = "f") -> jax.Array:
    """K = X X^T with X [n, F] sharded over features; psum over ICI.

    Per-chip compute is a [n, F/d] x [F/d, n] matmul; the reduction is one
    psum of [n, n] partials (reduce_scatter-equivalent collective cost).
    """

    def local_gram(x_local):
        k_part = jnp.matmul(
            x_local, x_local.T, preferred_element_type=jnp.float32, precision=HIGHEST
        )
        return jax.lax.psum(k_part, axis)

    fn = shard_map(
        local_gram, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, None)
    )
    return fn(X)


def sharded_searchlight_step(mesh: Mesh, layout: TestLayout, n_train: int, n_test: int,
                             alpha: float = 1.0):
    """Build a jitted multi-chip searchlight step.

    Returns fn(X_all [N, V_pad], Y_train, Y_test, Y_imag, idx [B, K]) ->
    {metric: [B]} with idx sharded over the vertex axis and everything else
    replicated; the output score maps are implicitly all-gathered by the
    out_spec.
    """

    def local_step(X_all, Y_train, Y_test, Y_imag, idx):
        patches = gather_patches(X_all, idx)  # local vertex block
        Xtr = patches[:n_train]
        Xte = patches[n_train : n_train + n_test]
        Xim = patches[n_train + n_test :]
        W = fit_block(Xtr, Y_train, alpha)
        scores = score_block(
            predict_block(Xte, W), predict_block(Xim, W), Y_test, Y_imag, layout
        )
        return scores

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("v", None)),
        out_specs=P("v"),
    )
    return jax.jit(fn)


def sharded_searchlight_cv_step(mesh: Mesh, layout: TestLayout, n_train: int,
                                n_test: int, alphas, cv_solver: str | None = None,
                                cv_dtype="shipped", cv_precision=None):
    """Vertex-sharded alpha-CV searchlight block (the BASELINE config).

    Selection runs the SHIPPED fast path by default — ``cv_solver=None`` and
    ``cv_dtype="shipped"`` resolve through the same per-platform functions the
    production driver uses (decoding.searchlight.default_cv_solver /
    default_cv_dtype: schur-pallas + bf16 selection storage on TPU, the
    schur-cb/f32 fallback elsewhere) so a dry run of this step certifies the
    production configuration, not a sibling.  The refit stays HIGHEST
    cholesky (collective-free inside shard_map) either way.
    """
    from multimodal_decoding_tpu.decoding.searchlight import (
        default_cv_dtype,
        default_cv_solver,
    )
    from multimodal_decoding_tpu.decoding.searchlight_engine import fit_block_cv

    if cv_solver is None:
        cv_solver = default_cv_solver()
    if cv_dtype == "shipped":
        cv_dtype = default_cv_dtype()
    if cv_precision is None:
        cv_precision = jax.lax.Precision.DEFAULT
    alphas_arr = jnp.asarray(alphas, dtype=jnp.float32)

    def local_step(X_all, Y_train, Y_test, Y_imag, idx):
        patches = gather_patches(X_all, idx)
        Xtr = patches[:n_train]
        Xte = patches[n_train : n_train + n_test]
        Xim = patches[n_train + n_test :]
        W, best_alpha, _ = fit_block_cv(
            Xtr, Y_train, alphas_arr,
            cv_precision=cv_precision, cv_solver=cv_solver, cv_dtype=cv_dtype,
        )
        scores = score_block(
            predict_block(Xte, W), predict_block(Xim, W), Y_test, Y_imag, layout
        )
        return dict(scores, best_alpha=best_alpha)

    # check_vma=False: pallas_call (the schur-pallas leaf) does not annotate
    # its outputs' varying-mesh-axes, which the default vma check rejects
    # inside shard_map; the specs here are plain SPMD (everything either
    # replicated or vertex-sharded) so the check adds nothing.
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("v", None)),
        out_specs=P("v"),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_null_t_maps(scores, permutations, popmean: float, mesh: Mesh):
    """Group-permutation null t-maps with the PERMUTATION axis sharded.

    The reference fans 10k permutations out over joblib processes writing
    HDF5 shards (permutation_testing.py:452-556); here each device computes
    its slice of the [P_group, V] t-map tensor from replicated per-subject
    scores — collective-free until the implicit output all-gather.
    ``permutations`` length must be divisible by the mesh size (pad with
    repeats and slice, or chunk upstream like decoding/permutation.py does).
    """
    from multimodal_decoding_tpu.ops.stats import null_t_maps

    n_dev = mesh.devices.size
    if len(permutations) % n_dev != 0:
        raise ValueError(
            f"len(permutations)={len(permutations)} must be divisible by the "
            f"mesh size {n_dev}; pad with repeats and slice, or chunk "
            "upstream (decoding/permutation.py pads for you)"
        )

    def local(scores_rep, perms_local):
        return null_t_maps(scores_rep, perms_local, popmean)

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(), P("v", None)), out_specs=P("v", None)
    )
    # Inputs arrive replicated via an explicit sharding (multi-process safe:
    # every host passes the same full arrays) and the output is re-replicated
    # by out_shardings — one all-gather over ICI.  Without it the [P, V]
    # result stays permutation-sharded, which np.asarray on a multi-HOST run
    # rejects (not fully addressable); fully-replicated arrays convert fine.
    from multimodal_decoding_tpu.parallel.multihost import replicated_from_host

    rep = NamedSharding(mesh, P())
    scores_d = replicated_from_host(np.asarray(scores), mesh)
    perms_d = replicated_from_host(np.asarray(permutations), mesh)
    return jax.jit(fn, out_shardings=rep)(scores_d, perms_d)


def multichip_training_step(mesh_v: Mesh, mesh_f: Mesh):
    """One full 'training step' of the framework across a mesh.

    Composes both sharding patterns on tiny shapes: (1) the feature-sharded
    whole-brain gram + dual ridge fit + prediction (tensor parallel), (2) the
    vertex-sharded searchlight block (sequence/data parallel over vertices).
    Used by __graft_entry__.dryrun_multichip.
    """
    n_dev = len(mesh_v.devices.flatten())
    rng = np.random.RandomState(0)
    n_train, n_test, n_imag, d = 24, 10, 3, 6
    v = 8 * n_dev  # vertex axis divisible by mesh
    f = 16 * n_dev  # feature axis divisible by mesh
    k = 5

    X_train = rng.randn(n_train, f).astype(np.float32)
    Y_train = rng.randn(n_train, d).astype(np.float32)
    X_test = rng.randn(n_test, f).astype(np.float32)

    # (1) feature-sharded gram + dual ridge + predict
    X_sharded = jax.device_put(X_train, NamedSharding(mesh_f, P(None, "f")))
    K = sharded_gram(X_sharded, mesh_f)
    dual = dual_ridge_fit(K, jnp.asarray(Y_train), 10.0)
    K_q = jnp.asarray(X_test) @ X_sharded.T
    preds_wb = dual_ridge_predict(K_q, dual)

    # (2) vertex-sharded searchlight block
    stim_types = np.array(["caption"] * (n_test // 2) + ["image"] * (n_test - n_test // 2))
    layout = TestLayout.from_stim_types(stim_types)
    X_all = rng.randn(n_train + n_test + n_imag, v).astype(np.float32)
    Y_test = rng.randn(n_test, d).astype(np.float32)
    Y_imag = rng.randn(n_imag, d).astype(np.float32)
    idx = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)

    # input pipeline: rows arrive as per-host shards and are replicated by
    # one all-gather (parallel/multihost.py), not by a host broadcast
    from multimodal_decoding_tpu.parallel.multihost import (
        global_from_host_shards,
        replicate_rows,
    )

    n_rows = n_train + n_test + n_imag
    pad_rows = (-n_rows) % n_dev
    X_padded = np.concatenate(
        [X_all, np.zeros((pad_rows, v), np.float32)]) if pad_rows else X_all
    x_row_sharded = global_from_host_shards(X_padded, 0, len(X_padded), mesh_v)
    X_all_rep = replicate_rows(x_row_sharded, mesh_v)[:n_rows]

    step = sharded_searchlight_step(mesh_v, layout, n_train, n_test, alpha=1.0)
    idx_sharded = jax.device_put(idx, NamedSharding(mesh_v, P("v", None)))
    scores = step(
        X_all_rep,
        jnp.asarray(Y_train), jnp.asarray(Y_test), jnp.asarray(Y_imag), idx_sharded,
    )

    # (3) vertex-sharded alpha-CV block (the BASELINE searchlight config) at
    # the SHIPPED selection settings: solver/dtype resolve per-platform
    # through decoding.searchlight.default_cv_solver/default_cv_dtype, so
    # this step validates the production path (schur-pallas + bf16 selection
    # on TPU; the documented schur-cb/f32 fallback on CPU meshes)
    from multimodal_decoding_tpu.decoding.searchlight import (
        default_cv_dtype,
        default_cv_solver,
    )

    print(
        f"multichip CV step shipped config: cv_solver={default_cv_solver()}, "
        f"cv_dtype={default_cv_dtype()}"
    )
    cv_step = sharded_searchlight_cv_step(
        mesh_v, layout, n_train, n_test, alphas=[1e-1, 1e1, 1e3]
    )
    cv_scores = cv_step(
        X_all_rep,
        jnp.asarray(Y_train), jnp.asarray(Y_test), jnp.asarray(Y_imag), idx_sharded,
    )
    scores = dict(scores, **{f"cv_{m}": s for m, s in cv_scores.items()})

    # (3b) the TPU-shipped combination EXPLICITLY (schur-pallas + bf16
    # selection storage): on a CPU mesh the Pallas leaf runs under the
    # interpreter, so this certifies that the production solver/dtype
    # combination compiles and executes under shard_map even when the dry
    # run has no TPU attached
    cv_step_tpu_cfg = sharded_searchlight_cv_step(
        mesh_v, layout, n_train, n_test, alphas=[1e-1, 1e1, 1e3],
        cv_solver="schur-pallas", cv_dtype=jnp.bfloat16,
    )
    cv_scores_tpu_cfg = cv_step_tpu_cfg(
        X_all_rep,
        jnp.asarray(Y_train), jnp.asarray(Y_test), jnp.asarray(Y_imag), idx_sharded,
    )
    scores = dict(
        scores, **{f"cvtpu_{m}": s for m, s in cv_scores_tpu_cfg.items()}
    )

    # (4) permutation-sharded group-null t-maps with per-host-sharded null
    # ingestion (the production permutation pipeline's multi-chip path)
    from multimodal_decoding_tpu.ops.stats import group_permutations
    from multimodal_decoding_tpu.parallel.multihost import (
        host_shard_bounds,
        replicate_host_filled,
    )

    n_subj, p_within = 4, 6
    subj_null = rng.rand(n_subj, p_within, v).astype(np.float32)

    def fill(host_idx):
        lo, hi = host_shard_bounds(n_subj, host_idx, n_dev)
        f = np.zeros_like(subj_null)
        f[lo:hi] = subj_null[lo:hi]
        return f

    null_scores = replicate_host_filled([fill(d) for d in range(n_dev)], mesh_v)
    perms = group_permutations(p_within, n_subj, 2 * n_dev)
    null_t = sharded_null_t_maps(null_scores, perms, 0.5, mesh_v)
    scores["perm_null_t"] = null_t.max(axis=1)

    return np.asarray(preds_wb), {m: np.asarray(s) for m, s in scores.items()}
