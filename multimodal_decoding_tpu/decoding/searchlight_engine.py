"""Batched surface-searchlight engine: vmapped closed-form ridge + fused scoring.

TPU-native replacement for the reference's per-vertex sklearn loop
(/root/reference/analyses/decoding/searchlight/searchlight.py:38-149):

* Per-vertex "fit Ridge on X[:, neighbors]" becomes, for a block of B
  vertices, one gather ``X[:, idx]`` -> [N, B, K], one batched gram einsum
  [B, K, K] (MXU), one batched Cholesky solve, and batched prediction
  einsums.  K is static (n_neighbors mode) or padded+masked (radius mode), so
  every shape is compile-time constant.

* The ~10-metric score family per vertex becomes batched row-normalisations +
  GEMMs over [B, n_test, D] prediction tensors.

* Null-distribution scoring is reformulated: a permutation of the latent rows
  only permutes *columns* of the per-vertex cosine-distance matrix, so each
  shuffle's accuracy is a gather of "how many columns beat the permuted
  diagonal" from a per-vertex rank-count tensor computed ONCE.  Cost per
  shuffle drops from O(n^2 cdist) (reference searchlight.py:61-79) to O(n)
  gathers.

Precision: inputs are float32 by default with HIGHEST-precision MXU passes
(reference uses float16 inputs + float64 sklearn solves, searchlight.py:247);
``fast_math=True`` switches storage to bfloat16 single-pass for ~6x faster
grams when bit-parity is not required.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_decoding_tpu.ops import metrics as M
from multimodal_decoding_tpu.ops.ridge import first_argmax_with_tol, kfold_indices
from multimodal_decoding_tpu.ops.solvers import spd_solve

HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Fit + predict for one vertex block
# ---------------------------------------------------------------------------


def gather_patches(X: jnp.ndarray, idx: jnp.ndarray, mask=None) -> jnp.ndarray:
    """X [N, V], idx [B, K] -> patches [N, B, K] (masked cols zeroed).

    Zeroing a column is exactly equivalent to excluding that neighbour from
    the ridge fit (its gram row/col vanish; regulariser pins its weight to 0),
    which turns the reference's ragged radius-mode neighbourhoods
    (searchlight.py:164-171) into static shapes.
    """
    patches = X[:, idx]
    if mask is not None:
        patches = patches * mask[None].astype(patches.dtype)
    return patches


def fit_block(X_train_g: jnp.ndarray, Y_train: jnp.ndarray, alpha, precision=HIGHEST,
              solver: str = "cholesky"):
    """Batched closed-form ridge over a vertex block.

    X_train_g [N, B, K], Y_train [N, D] -> W [B, K, D].
    Replaces estimator.fit per vertex (searchlight.py:56).  ``solver`` picks
    the batched SPD backend (ops/solvers.py): "cholesky" (final-score parity
    default) through "schur-pallas" (fastest, 3x; can flip 1/6-granularity
    imagery ties vs cholesky — see docs/PERF_NOTES.md round-2 notes).
    """
    G = jnp.einsum(
        "nbk,nbl->bkl", X_train_g, X_train_g, preferred_element_type=jnp.float32,
        precision=precision,
    )
    XtY = jnp.einsum(
        "nbk,nd->bkd", X_train_g, Y_train, preferred_element_type=jnp.float32,
        precision=precision,
    )
    K = G.shape[-1]
    A = G + jnp.asarray(alpha, G.dtype) * jnp.eye(K, dtype=G.dtype)
    return spd_solve(A, XtY, method=solver, precision=precision)


def predict_block(X_query_g: jnp.ndarray, W: jnp.ndarray, precision=HIGHEST) -> jnp.ndarray:
    """X_query_g [M, B, K], W [B, K, D] -> preds [B, M, D]."""
    return jnp.einsum(
        "mbk,bkd->bmd", X_query_g, W, preferred_element_type=jnp.float32, precision=precision
    )


# ---------------------------------------------------------------------------
# Per-vertex CV alpha sweep (BASELINE.json searchlight config: "alpha CV")
# ---------------------------------------------------------------------------


def fit_block_cv(
    X_train_g: jnp.ndarray,
    Y_train: jnp.ndarray,
    alphas: jnp.ndarray,
    n_splits: int = 5,
    precision=HIGHEST,
    solver: str = "cholesky",
    cv_precision=None,
    cv_solver: str | None = None,
    cv_scorer: str = "xla",
    cv_dtype=None,
    cv_unroll: bool = False,
    cv_alpha_batch: bool = False,
):
    """Per-vertex alpha selection via K-fold CV (sklearn-split parity).

    Returns (W [B, K, D] refit at each vertex's best alpha, best_alpha [B],
    cv_scores [B, n_alphas]).  Fold grams are computed as differences from
    the full gram, so the 5-fold sweep costs ~2 gram passes instead of 5.

    ``cv_precision``/``cv_solver`` apply ONLY to the alpha-SELECTION path
    (fold grams, per-alpha solves, validation predictions and scoring) —
    its sole parity obligation is a stable argmax over 6 alphas, so it can
    run at DEFAULT precision with the MXU-native schur solver while the
    final refit keeps ``precision``/``solver`` for BASELINE 1e-4 accuracy
    parity.  Defaults (None) inherit the strict settings.

    ``cv_scorer`` picks the validation-fold scorer: "xla" (default) uses the
    scale-invariant formulation (predictions unnormalised — row norms cancel
    in the rank comparisons, saving a [nv, B, D] materialisation per
    (fold, alpha)); "strict" materialises cosine-distance matrices exactly
    like the final metrics; "pallas" streams similarity tiles
    (ops/pallas_metrics.py).

    ``cv_dtype`` (e.g. jnp.bfloat16) stores the SELECTION-path operands —
    fold patches, per-alpha weights, scorer inputs — in a narrow dtype so
    the selection GEMMs run single-pass on the MXU (f32 accumulation via
    preferred_element_type).  The reference itself feeds float16 inputs to
    every fit (searchlight.py:247-248), so bf16 selection is morally
    licensed; the refit gram/solve and the full-gram fold differences stay
    in f32 at ``precision``.  Gate any default change on the on-device
    alpha-agreement run (benchmarks/check_cv_parity.py).

    ``cv_unroll``, ``cv_alpha_batch`` and the ``fused*`` scorers are
    retained as MEASURED-DEAD experiments (docs/PERF_NOTES.md round-3
    ladder): none beats the shipped xla path at production shapes, and the
    table there records why — keep them for re-evaluation on future chips,
    do not ship them as defaults.
    """
    cv_precision = precision if cv_precision is None else cv_precision
    cv_solver = solver if cv_solver is None else cv_solver
    if cv_alpha_batch and cv_scorer != "xla":
        # the alpha-batched path implements only the xla scale-invariant
        # fold scorer; with "strict"/"pallas" it would silently substitute
        # it, and the fused branches would silently ignore the batching
        raise ValueError(
            f"cv_alpha_batch requires cv_scorer='xla'; got {cv_scorer!r}")
    n = X_train_g.shape[0]
    Kdim = X_train_g.shape[-1]
    folds = kfold_indices(n, n_splits)
    # cv_dtype casts happen on the PER-FOLD slices below, never on the full
    # patch tensor: a whole-X bf16 copy coexists with the f32 original that
    # the refit-parity gram needs, and that extra 1.5 GB OOMs B=128 on the
    # 16 GB chip (measured).  Per-fold slice casts are ~300 MB transients.
    Y_sel = Y_train if cv_dtype is None else Y_train.astype(cv_dtype)

    G_full = jnp.einsum(
        "nbk,nbl->bkl", X_train_g, X_train_g, preferred_element_type=jnp.float32,
        precision=precision,
    )
    XtY_full = jnp.einsum(
        "nbk,nd->bkd", X_train_g, Y_train, preferred_element_type=jnp.float32,
        precision=precision,
    )
    eye = jnp.eye(Kdim, dtype=G_full.dtype)

    def fold_scores(val_idx):
        # contiguous KFold ranges lower to SLICES, not integer-array gathers
        # (the whole-brain CV sweep lost 13x to gather lowering of exactly
        # this pattern — docs/PERF_NOTES.md round-3 whole-brain section)
        lo, hi = int(val_idx[0]), int(val_idx[-1]) + 1
        if np.array_equal(val_idx, np.arange(lo, hi)):
            Xv, Yv, Yv_sel_rows = X_train_g[lo:hi], Y_train[lo:hi], Y_sel[lo:hi]
        else:
            Xv, Yv, Yv_sel_rows = X_train_g[val_idx], Y_train[val_idx], Y_sel[val_idx]
        if cv_dtype is not None:
            Xv = Xv.astype(cv_dtype)
        # scale-invariance: the fold scorer only normalises the latents —
        # prediction row norms cancel in the rank comparisons
        # (M.pairwise_acc_scale_invariant)
        Yv_n = Yv / jnp.linalg.norm(Yv, axis=-1, keepdims=True)
        Yv_n_sel = Yv_n if cv_dtype is None else Yv_n.astype(cv_dtype)
        G_val = jnp.einsum(
            "nbk,nbl->bkl", Xv, Xv, preferred_element_type=jnp.float32,
            precision=cv_precision,
        )
        XtY_val = jnp.einsum(
            "nbk,nd->bkd", Xv, Yv_sel_rows, preferred_element_type=jnp.float32,
            precision=cv_precision,
        )
        G_tr = G_full - G_val
        XtY_tr = XtY_full - XtY_val

        if cv_scorer in ("fused", "fused-pallas", "fused-inv"):
            # sim = Xv W Yv_n^T reassociated through K:
            #   U = XtY_tr Yv_n^T  (once per FOLD, not per alpha)
            #   sim_a = (Xv) (G+aI)^-1 U  — no [B, nv, D] predictions at all.
            # Per (fold, alpha) FLOPs drop ~31% vs solve+preds+sim-through-D;
            # scale-invariant and diag-self-consistent like the xla scorer.
            # Measured on device (N=8192, B=128): "fused" through the dense
            # XLA sim is SLOWER than "xla" (135 vs 158 v/s — same [B,nv,nv]
            # materialisation, and the Z apply has nv > D columns); only the
            # "fused-pallas" streamed-count form banks the FLOP cut.  The
            # per-FOLD transpose below is deliberate: a whole-X [B, N, K]
            # pre-transpose doubles patch storage and OOMs the 16 GB chip.
            from multimodal_decoding_tpu.ops.solvers import spd_inverse

            U = jnp.einsum(
                "bkd,nd->bkn", XtY_tr, Yv_n_sel,
                preferred_element_type=jnp.float32, precision=cv_precision,
            )
            Xv_b = jnp.swapaxes(Xv, 0, 1)  # [B, nv, K], once per fold

            def one_alpha_fused(alpha):
                inv = spd_inverse(G_tr + alpha * eye, method=cv_solver,
                                  precision=cv_precision)
                if cv_scorer == "fused-inv":
                    # fully fused: Z = inv @ U lives only in the count
                    # kernel's VMEM scratch — no [B, K, nv] HBM roundtrip
                    from multimodal_decoding_tpu.ops.pallas_metrics import (
                        streamed_acc_from_inv,
                    )

                    return streamed_acc_from_inv(Xv_b, inv, U,
                                                 precision=cv_precision)
                Z = jnp.matmul(inv, U, preferred_element_type=jnp.float32,
                               precision=cv_precision)  # [B, K, nv]
                if cv_scorer == "fused-pallas":
                    from multimodal_decoding_tpu.ops.pallas_metrics import (
                        streamed_acc_from_factors,
                    )

                    return streamed_acc_from_factors(Xv_b, Z,
                                                     precision=cv_precision)
                sim = jnp.matmul(Xv_b, Z, preferred_element_type=jnp.float32,
                                 precision=cv_precision)  # [B, nv, nv]
                return M.pairwise_acc_from_sim(sim)

            if cv_unroll:
                return jnp.stack(
                    [one_alpha_fused(alphas[i]) for i in range(len(alphas))]
                )
            return jax.lax.map(one_alpha_fused, alphas)  # [A, B]

        def one_alpha(alpha):
            W = spd_solve(G_tr + alpha * eye, XtY_tr, method=cv_solver,
                          precision=cv_precision,
                          apply_dtype=cv_dtype)  # [B, K, D] f32
            W_sel = W if cv_dtype is None else W.astype(cv_dtype)
            # with cv_dtype set, emit the predictions directly in the narrow
            # dtype (MXU still accumulates f32 internally): the [B, nv, D]
            # f32 intermediate was the HBM peak that barred bf16 at B=128
            preds = jnp.einsum(
                "nbk,bkd->bnd", Xv, W_sel,
                preferred_element_type=jnp.float32 if cv_dtype is None else cv_dtype,
                precision=cv_precision,
            )
            if cv_scorer == "xla":
                # scale-invariant: predictions stay unnormalised (row norms
                # cancel in the rank comparisons).  NOTE: the reassociated
                # form sim = Xv (W Yv_n^T) has fewer FLOPs (contracts K < D)
                # but measured SLOWER (142 vs 158 v/s): the mid-batch Xv
                # layout forces an operand copy per (fold, alpha).
                return M.pairwise_acc_scale_invariant(preds, Yv_n_sel,
                                                      precision=cv_precision)
            if cv_scorer == "pallas":
                from multimodal_decoding_tpu.ops.pallas_metrics import (
                    streamed_pairwise_acc,
                )

                return streamed_pairwise_acc(preds, Yv, precision=cv_precision)
            dist = M.cosine_distances(preds, Yv, precision=cv_precision)
            return M.pairwise_acc_from_dist(dist)  # [B]

        if cv_alpha_batch:
            # ONE inverse over a CHUNK of alpha-shifted systems at once:
            # [chunk*B, K, K] instead of chunk sequential batch-B recursions.
            # Same FLOPs, but the recursion's sequential critical path (panel
            # factorisations, level dependencies) is paid once per chunk —
            # the measured per-solve rate (~7 TF/s at B=128) is dependency-
            # bound, not FLOP-bound, so the bigger batch feeds the idle MXU.
            # Chunking bounds the extra HBM: full 6-alpha batching costs
            # 2x [6, B, K, K] f32 transients (~3.4 GB) and OOMs B=128
            # alongside the 3 GB patch tensor (measured); chunk=2/3 keeps
            # most of the win at ~1.1-1.7 GB.
            from multimodal_decoding_tpu.ops.solvers import spd_inverse

            a_cnt = alphas.shape[0]
            chunk = a_cnt if cv_alpha_batch is True else int(cv_alpha_batch)
            if a_cnt % chunk != 0:
                raise ValueError(
                    f"cv_alpha_batch={chunk} must divide n_alphas={a_cnt}")
            Bb = G_tr.shape[0]

            def one_alpha_b(inv):
                W = jnp.matmul(inv, XtY_tr, preferred_element_type=jnp.float32,
                               precision=cv_precision)
                W_sel = W if cv_dtype is None else W.astype(cv_dtype)
                preds = jnp.einsum(
                    "nbk,bkd->bnd", Xv, W_sel,
                    preferred_element_type=jnp.float32 if cv_dtype is None else cv_dtype,
                    precision=cv_precision,
                )
                return M.pairwise_acc_scale_invariant(preds, Yv_n_sel,
                                                      precision=cv_precision)

            def chunk_scores(al_c):
                A_all = G_tr[None] + al_c[:, None, None, None] * eye
                inv_all = spd_inverse(
                    A_all.reshape((chunk * Bb,) + G_tr.shape[1:]),
                    method=cv_solver, precision=cv_precision,
                ).reshape(A_all.shape)
                return jax.lax.map(one_alpha_b, inv_all)  # [chunk, B]

            return jax.lax.map(
                chunk_scores, alphas.reshape(a_cnt // chunk, chunk)
            ).reshape(a_cnt, Bb)  # [A, B]

        if cv_unroll:
            # unrolled alpha sweep: lax.map compiles ONE iteration and runs
            # it serially, so the solver's sequential recursion tail cannot
            # overlap the next alpha's scorer GEMMs; unrolling lets XLA
            # software-pipeline the 6 alphas (bigger program, same math)
            return jnp.stack([one_alpha(alphas[i]) for i in range(len(alphas))])
        return jax.lax.map(one_alpha, alphas)  # [A, B]

    scores = jnp.mean(
        jnp.stack([fold_scores(np.asarray(v)) for _, v in folds]), axis=0
    )  # [A, B]
    # Epsilon-band first-argmax: ties exact in sklearn's float64 can split
    # by f32 noise here, so the first alpha within the band wins — full
    # semantics (incl. the documented sub-tol deviation from sklearn) at
    # ops.ridge.first_argmax_with_tol.
    best = first_argmax_with_tol(scores, axis=0)  # [B]
    best_alpha = alphas[best]

    A_mat = G_full + best_alpha[:, None, None] * eye
    W = spd_solve(A_mat, XtY_full, method=solver, precision=precision)
    return W, best_alpha, scores.T


# ---------------------------------------------------------------------------
# Scoring
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TestLayout:
    """Static index layout of the test set for jit-time closure.

    ``caption_sel``/``image_sel``: positions in the prediction rows (X order);
    the latent rows follow the same stim_types array in the reference call
    (searchlight.py:69,82 passes TEST_STIM_TYPES for both).
    """

    caption_sel: tuple
    image_sel: tuple

    @staticmethod
    def from_stim_types(stim_types, caption="caption", image="image") -> "TestLayout":
        st = np.asarray(stim_types)
        return TestLayout(
            caption_sel=tuple(np.where(st == caption)[0].tolist()),
            image_sel=tuple(np.where(st == image)[0].tolist()),
        )


def _acc(dist):
    return M.pairwise_acc_from_dist(dist)


def score_block(
    preds_test: jnp.ndarray,
    preds_imag: jnp.ndarray,
    Y_test: jnp.ndarray,
    Y_imag: jnp.ndarray,
    layout: TestLayout,
    comp_cross_decoding_scores: bool = True,
) -> dict:
    """Full main score family for a vertex block -> {metric: [B]}.

    Mirrors train_and_test's main scoring (searchlight.py:81-88):
    calc_all_pairwise_accuracy_scores(standardize_predictions=True) plus the
    *_no_std imagery variants.
    """
    cap = np.asarray(layout.caption_sel)
    img = np.asarray(layout.image_sel)

    P_cap = M.standardize(preds_test[:, cap, :])
    P_img = M.standardize(preds_test[:, img, :])
    L_cap = Y_test[cap]
    L_img = Y_test[img]

    out = {
        M.ACC_CAPTIONS: _acc(M.cosine_distances(P_cap, L_cap)),
        M.ACC_IMAGES: _acc(M.cosine_distances(P_img, L_img)),
    }
    if comp_cross_decoding_scores:
        out[M.ACC_CROSS_CAPTIONS_TO_IMAGES] = _acc(M.cosine_distances(P_cap, L_img))
        out[M.ACC_CROSS_IMAGES_TO_CAPTIONS] = _acc(M.cosine_distances(P_img, L_cap))

    P_im_std = M.standardize(preds_imag)
    L_whole = jnp.concatenate((Y_imag, Y_test), axis=0)
    out[M.ACC_IMAGERY] = _acc(M.cosine_distances(P_im_std, Y_imag))
    out[M.ACC_IMAGERY_WHOLE_TEST] = _acc(M.cosine_distances(P_im_std, L_whole))
    out[M.ACC_IMAGERY + "_no_std"] = _acc(M.cosine_distances(preds_imag, Y_imag))
    out[M.ACC_IMAGERY_WHOLE_TEST + "_no_std"] = _acc(M.cosine_distances(preds_imag, L_whole))
    return out


# number of metric families null_score_block emits: captions, images, and
# the two imagery variants each with a _no_std twin.  The runner sizes its
# device-memory flush budget from this; test_null_scores keeps it in sync.
N_NULL_METRICS = 6


def _rank_counts(dist: jnp.ndarray) -> jnp.ndarray:
    """C[..., i, c] = #{c': dist[..., i, c] < dist[..., i, c']}.

    The permutation-invariant rank structure of a distance matrix: any
    column-permuted accuracy is mean of C at the permuted diagonal.
    """
    return jnp.sum(dist[..., :, None] < dist[..., None, :], axis=-1)


def _gather_perm_diag(C: jnp.ndarray, perm: jnp.ndarray,
                      mode: str = "gather") -> jnp.ndarray:
    """Permuted-diagonal pick: out[b, p, i] = C[b, i, perm[(b,) p, i]].

    ``mode`` selects the formulation for the shared 2-D [P, n] shuffle
    permutations (per-(b, p, i) derangement picks, perm.ndim == 3, are tiny
    [B, P, 3] gathers and always use the gather path):

    * "gather": advanced-index gather (runs on the TPU's scalar/vector
      units, not the MXU).
    * "onehot": one-hot @ counts einsum — per-i batched [B, m] x [m, P]
      matmuls, MXU-native, bit-exact (0/1 selection of integer counts).
    * "onehot-bf16": same with bf16 operands and f32 accumulation.  STILL
      exact: rank counts are integers <= m-1 < 256, all exactly
      representable in bf16's 8-bit mantissa, and the one-hot rows select a
      single term so no rounding can occur.  Halves the einsum operand
      traffic.  Exactness requires m <= 256 (counts reach m-1; bf16 is
      integer-exact to 256); larger test layouts fall back to "onehot",
      which is exact at any size.

    Which mode wins is measured on device (benchmarks/profile_null_variants
    .py); exactness of the one-hot modes is asserted bitwise there too.
    """
    if mode not in ("gather", "onehot", "onehot-bf16"):
        raise ValueError(f"unknown null-gather mode {mode!r} "
                         "(expected 'gather', 'onehot', or 'onehot-bf16')")
    if perm.ndim == 2 and mode != "gather":
        if mode == "onehot-bf16" and C.shape[-1] > 256:
            # bf16 represents integers exactly only up to 256; rank counts
            # reach m-1, so m > 256 would silently lose bit-exactness
            mode = "onehot"
        dt = jnp.bfloat16 if mode == "onehot-bf16" else jnp.float32
        eye = jnp.eye(C.shape[-1], dtype=dt)
        E = eye[perm]  # [P, n, m] one-hot rows
        return jnp.einsum(
            "bim,pim->bpi", C.astype(dt), E,
            preferred_element_type=jnp.float32,
        )
    if perm.ndim == 2:
        perm = jnp.broadcast_to(perm[None], (C.shape[0],) + perm.shape)
    b_idx = jnp.arange(C.shape[0])[:, None, None]
    i_idx = jnp.arange(C.shape[1])[None, None, :]
    return C[b_idx, i_idx, perm]


def null_score_block(
    preds_test: jnp.ndarray,
    preds_imag: jnp.ndarray,
    Y_test: jnp.ndarray,
    Y_imag: jnp.ndarray,
    layout: TestLayout,
    shuffles: jnp.ndarray,
    imagery_derangements: jnp.ndarray,
    null_gather: str = "gather",
) -> dict:
    """Null-distribution score family for every shuffle -> {metric: [B, P]}.

    ``shuffles`` [P, n_test] permutes test latent rows within modality
    (data.py:554-561); ``imagery_derangements`` [B, P] selects one of the two
    3-element derangements per (vertex, shuffle), the batched analogue of the
    reference's per-vertex np.random.choice (searchlight.py:65).

    Semantics per shuffle mirror train_and_test (searchlight.py:61-79):
    calc_all_pairwise_accuracy_scores with standardize_predictions=True and
    comp_cross_decoding_scores=False, plus *_no_std imagery variants.
    """
    cap = np.asarray(layout.caption_sel)
    img = np.asarray(layout.image_sel)
    n_cap, n_img = len(cap), len(img)
    n_imag = preds_imag.shape[-2]

    if preds_imag.shape[-2] != 3:
        raise ValueError(
            "null scoring uses the reference's 3-element imagery derangements "
            f"(searchlight.py:35); got {preds_imag.shape[-2]} imagery stimuli"
        )
    derangements = jnp.asarray(
        [[1, 2, 0], [2, 0, 1]], dtype=jnp.int32
    )  # DERANGEMENTS_THREE_DIMS (searchlight.py:35)
    der_idx = derangements[imagery_derangements]  # [B, P, 3]

    def gather_perm_diag(C, perm):
        """C [B, n, m], perm [B, P, n] or [P, n] -> C[b, i, perm[.., i]] [B, P, n]."""
        return _gather_perm_diag(C, perm, null_gather)

    # Shuffle restricted to each modality's latent rows: the latent rows for
    # modality m are Y_test[sel]; within-modality closure of the shuffles
    # (data.py:554-561) guarantees sigma[sel] stays inside sel.
    def modality_score(P_std, L, sel):
        dist = M.cosine_distances(P_std, L)  # [B, n, n]
        C = _rank_counts(dist)
        sel_arr = jnp.asarray(sel)
        inv = jnp.zeros((Y_test.shape[0],), dtype=jnp.int32).at[sel_arr].set(
            jnp.arange(len(sel), dtype=jnp.int32)
        )
        local = inv[shuffles[:, sel_arr]]  # [P, n] local permutation
        gathered = gather_perm_diag(C, local)  # [B, P, n]
        n = len(sel)
        return jnp.sum(gathered, axis=-1) / (n * n - n)  # [B, P]

    P_cap = M.standardize(preds_test[:, cap, :])
    P_img = M.standardize(preds_test[:, img, :])
    out = {
        M.ACC_CAPTIONS: modality_score(P_cap, Y_test[cap], cap),
        M.ACC_IMAGES: modality_score(P_img, Y_test[img], img),
    }

    L_whole = jnp.concatenate((Y_imag, Y_test), axis=0)

    for suffix, P_im in (("", M.standardize(preds_imag)), ("_no_std", preds_imag)):
        d_im = M.cosine_distances(P_im, Y_imag)
        C_im = _rank_counts(d_im)  # [B, 3, 3]
        g = gather_perm_diag(C_im, der_idx)  # [B, P, 3]
        out[M.ACC_IMAGERY + suffix] = jnp.sum(g, axis=-1) / (n_imag * n_imag - n_imag)

        d_iw = M.cosine_distances(P_im, L_whole)  # [B, 3, 3+n_test]
        C_iw = _rank_counts(d_iw)
        g = gather_perm_diag(C_iw, der_idx)  # diagonal lives in the imagery cols
        m = L_whole.shape[0]
        out[M.ACC_IMAGERY_WHOLE_TEST + suffix] = jnp.sum(g, axis=-1) / (n_imag * m - n_imag)

    return out


def score_and_null_block(
    preds_test: jnp.ndarray,
    preds_imag: jnp.ndarray,
    Y_test: jnp.ndarray,
    Y_imag: jnp.ndarray,
    layout: TestLayout,
    shuffles: jnp.ndarray,
    imagery_derangements: jnp.ndarray,
    comp_cross_decoding_scores: bool = True,
    null_gather: str = "gather",
) -> tuple:
    """Main + null score families sharing the distance/rank-count tensors.

    score_block and null_score_block each standardised the same predictions
    and materialised the same cosine-distance matrices (VERDICT round-2 #9:
    "the refit predictions' rank counts are computed twice").  The main
    accuracy is exactly the rank-count diagonal — ``acc = sum_i C[i, i]`` is
    the identity-permutation gather — so one distance matrix + one C per
    metric family serves both outputs, bitwise identically: same einsums at
    the same precision, same strict comparisons.
    """
    cap = np.asarray(layout.caption_sel)
    img = np.asarray(layout.image_sel)
    n_imag = preds_imag.shape[-2]
    if n_imag != 3:
        raise ValueError(
            "null scoring uses the reference's 3-element imagery derangements "
            f"(searchlight.py:35); got {n_imag} imagery stimuli"
        )
    derangements = jnp.asarray([[1, 2, 0], [2, 0, 1]], dtype=jnp.int32)
    der_idx = derangements[imagery_derangements]  # [B, P, 3]

    def gather_perm_diag(C, perm):
        return _gather_perm_diag(C, perm, null_gather)

    def main_acc_from_counts(C, n, m):
        diag = jnp.diagonal(C, axis1=-2, axis2=-1)
        return jnp.sum(diag, axis=-1) / (n * m - min(n, m))

    P_cap = M.standardize(preds_test[:, cap, :])
    P_img = M.standardize(preds_test[:, img, :])
    L_cap = Y_test[cap]
    L_img = Y_test[img]

    main, null = {}, {}

    def modality(P_std, L, sel, name):
        n = len(sel)
        dist = M.cosine_distances(P_std, L)
        C = _rank_counts(dist)
        main[name] = main_acc_from_counts(C, n, n)
        sel_arr = jnp.asarray(sel)
        inv = jnp.zeros((Y_test.shape[0],), dtype=jnp.int32).at[sel_arr].set(
            jnp.arange(len(sel), dtype=jnp.int32)
        )
        local = inv[shuffles[:, sel_arr]]
        null[name] = jnp.sum(gather_perm_diag(C, local), axis=-1) / (n * n - n)

    modality(P_cap, L_cap, cap, M.ACC_CAPTIONS)
    modality(P_img, L_img, img, M.ACC_IMAGES)
    if comp_cross_decoding_scores:
        main[M.ACC_CROSS_CAPTIONS_TO_IMAGES] = _acc(M.cosine_distances(P_cap, L_img))
        main[M.ACC_CROSS_IMAGES_TO_CAPTIONS] = _acc(M.cosine_distances(P_img, L_cap))

    L_whole = jnp.concatenate((Y_imag, Y_test), axis=0)
    m_whole = L_whole.shape[0]
    for suffix, P_im in (("", M.standardize(preds_imag)), ("_no_std", preds_imag)):
        C_im = _rank_counts(M.cosine_distances(P_im, Y_imag))
        main[M.ACC_IMAGERY + suffix] = main_acc_from_counts(C_im, n_imag, n_imag)
        null[M.ACC_IMAGERY + suffix] = jnp.sum(
            gather_perm_diag(C_im, der_idx), axis=-1
        ) / (n_imag * n_imag - n_imag)

        C_iw = _rank_counts(M.cosine_distances(P_im, L_whole))
        main[M.ACC_IMAGERY_WHOLE_TEST + suffix] = main_acc_from_counts(
            C_iw, n_imag, m_whole
        )
        null[M.ACC_IMAGERY_WHOLE_TEST + suffix] = jnp.sum(
            gather_perm_diag(C_iw, der_idx), axis=-1
        ) / (n_imag * m_whole - n_imag)

    # key order parity with score_block/null_score_block outputs
    main_order = [M.ACC_CAPTIONS, M.ACC_IMAGES]
    if comp_cross_decoding_scores:
        main_order += [M.ACC_CROSS_CAPTIONS_TO_IMAGES, M.ACC_CROSS_IMAGES_TO_CAPTIONS]
    main_order += [M.ACC_IMAGERY, M.ACC_IMAGERY_WHOLE_TEST,
                   M.ACC_IMAGERY + "_no_std", M.ACC_IMAGERY_WHOLE_TEST + "_no_std"]
    null_order = [M.ACC_CAPTIONS, M.ACC_IMAGES,
                  M.ACC_IMAGERY, M.ACC_IMAGERY_WHOLE_TEST,
                  M.ACC_IMAGERY + "_no_std", M.ACC_IMAGERY_WHOLE_TEST + "_no_std"]
    return ({k: main[k] for k in main_order}, {k: null[k] for k in null_order})


# ---------------------------------------------------------------------------
# Jitted block step factories
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("layout", "comp_cross", "precision", "n_train", "n_test", "solver"),
)
def searchlight_block(
    X_all,
    Y_train,
    Y_test,
    Y_imag,
    idx,
    mask,
    alpha,
    *,
    layout: TestLayout,
    n_train: int,
    n_test: int,
    comp_cross: bool = True,
    precision=HIGHEST,
    solver: str = "cholesky",
):
    """One fused block step: gather -> fit -> predict -> score.

    X_all [N_all, V] = concat(train, test, imagery) rows (searchlight.py:234);
    idx [B, K]; mask [B, K] or None.  Returns {metric: [B]}.
    """
    patches = gather_patches(X_all, idx, mask)  # [N_all, B, K]
    Xtr = patches[:n_train]
    Xte = patches[n_train : n_train + n_test]
    Xim = patches[n_train + n_test :]
    W = fit_block(Xtr, Y_train, alpha, precision=precision, solver=solver)
    preds_test = predict_block(Xte, W, precision=precision)
    preds_imag = predict_block(Xim, W, precision=precision)
    return score_block(
        preds_test, preds_imag, Y_test, Y_imag, layout, comp_cross_decoding_scores=comp_cross
    )


@functools.partial(
    jax.jit,
    static_argnames=("layout", "comp_cross", "precision", "n_train", "n_test", "solver",
                     "null_gather"),
)
def searchlight_block_with_null(
    X_all,
    Y_train,
    Y_test,
    Y_imag,
    idx,
    mask,
    alpha,
    shuffles,
    imagery_derangements,
    *,
    layout: TestLayout,
    n_train: int,
    n_test: int,
    comp_cross: bool = True,
    precision=HIGHEST,
    solver: str = "cholesky",
    null_gather: str = "gather",
):
    """Block step that also emits the per-shuffle null score family."""
    patches = gather_patches(X_all, idx, mask)
    Xtr = patches[:n_train]
    Xte = patches[n_train : n_train + n_test]
    Xim = patches[n_train + n_test :]
    W = fit_block(Xtr, Y_train, alpha, precision=precision, solver=solver)
    preds_test = predict_block(Xte, W, precision=precision)
    preds_imag = predict_block(Xim, W, precision=precision)
    return score_and_null_block(
        preds_test, preds_imag, Y_test, Y_imag, layout, shuffles,
        imagery_derangements, comp_cross_decoding_scores=comp_cross,
        null_gather=null_gather,
    )


@functools.partial(
    jax.jit,
    static_argnames=("layout", "comp_cross", "precision", "n_train", "n_test", "n_splits",
                     "solver", "cv_precision", "cv_solver", "cv_scorer", "cv_dtype",
                     "cv_unroll", "cv_alpha_batch", "null_gather"),
)
def searchlight_block_cv_with_null(
    X_all,
    Y_train,
    Y_test,
    Y_imag,
    idx,
    mask,
    alphas,
    shuffles,
    imagery_derangements,
    *,
    layout: TestLayout,
    n_train: int,
    n_test: int,
    n_splits: int = 5,
    comp_cross: bool = True,
    precision=HIGHEST,
    solver: str = "cholesky",
    cv_precision=None,
    cv_solver: str | None = None,
    cv_scorer: str = "xla",
    cv_dtype=None,
    cv_unroll: bool = False,
    cv_alpha_batch: bool = False,
    null_gather: str = "gather",
):
    """CV block step that also emits the per-shuffle null score family.

    Goes beyond the reference, whose null runs always use a fixed alpha
    (searchlight.py:240,345): here each vertex's null scores are computed
    from the decoder refit at that vertex's CV-selected alpha, so the
    BASELINE "alpha CV" configuration can produce null distributions too.
    The rank-count reformulation makes the extra shuffles ~free relative to
    the CV fit itself.
    """
    patches = gather_patches(X_all, idx, mask)
    Xtr = patches[:n_train]
    Xte = patches[n_train : n_train + n_test]
    Xim = patches[n_train + n_test :]
    W, best_alpha, _ = fit_block_cv(Xtr, Y_train, alphas, n_splits,
                                    precision=precision, solver=solver,
                                    cv_precision=cv_precision, cv_solver=cv_solver,
                                    cv_scorer=cv_scorer, cv_dtype=cv_dtype,
                                    cv_unroll=cv_unroll,
                                    cv_alpha_batch=cv_alpha_batch)
    preds_test = predict_block(Xte, W, precision=precision)
    preds_imag = predict_block(Xim, W, precision=precision)
    main, null = score_and_null_block(
        preds_test, preds_imag, Y_test, Y_imag, layout, shuffles,
        imagery_derangements, comp_cross_decoding_scores=comp_cross,
        null_gather=null_gather,
    )
    main = dict(main)
    main["best_alpha"] = best_alpha
    return main, null


@functools.partial(
    jax.jit,
    static_argnames=("layout", "comp_cross", "precision", "n_train", "n_test", "n_splits",
                     "solver", "cv_precision", "cv_solver", "cv_scorer", "cv_dtype",
                     "cv_unroll", "cv_alpha_batch"),
)
def searchlight_block_cv(
    X_all,
    Y_train,
    Y_test,
    Y_imag,
    idx,
    mask,
    alphas,
    *,
    layout: TestLayout,
    n_train: int,
    n_test: int,
    n_splits: int = 5,
    comp_cross: bool = True,
    precision=HIGHEST,
    solver: str = "cholesky",
    cv_precision=None,
    cv_solver: str | None = None,
    cv_scorer: str = "xla",
    cv_dtype=None,
    cv_unroll: bool = False,
    cv_alpha_batch: bool = False,
):
    """Block step with per-vertex CV alpha selection (BASELINE searchlight config)."""
    patches = gather_patches(X_all, idx, mask)
    Xtr = patches[:n_train]
    Xte = patches[n_train : n_train + n_test]
    Xim = patches[n_train + n_test :]
    W, best_alpha, cv_scores = fit_block_cv(Xtr, Y_train, alphas, n_splits,
                                            precision=precision, solver=solver,
                                            cv_precision=cv_precision,
                                            cv_solver=cv_solver, cv_scorer=cv_scorer,
                                            cv_dtype=cv_dtype, cv_unroll=cv_unroll,
                                            cv_alpha_batch=cv_alpha_batch)
    preds_test = predict_block(Xte, W, precision=precision)
    preds_imag = predict_block(Xim, W, precision=precision)
    scores = score_block(
        preds_test, preds_imag, Y_test, Y_imag, layout, comp_cross_decoding_scores=comp_cross
    )
    scores = dict(scores)
    scores["best_alpha"] = best_alpha
    return scores
