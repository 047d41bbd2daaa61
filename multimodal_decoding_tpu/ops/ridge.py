"""Closed-form ridge regression with vectorized alpha sweep & CV.

TPU-native replacement for the reference's sklearn stack
(``Ridge(fit_intercept=False)`` inside ``GridSearchCV`` —
/root/reference/analyses/decoding/ridge_regression_decoding.py:111-130):

* **Dual (kernel) form** for wide problems (n_samples << n_features, the
  whole-brain decode: ~9k stimuli x up to ~327k voxels): one gram matrix
  ``K = X X^T`` (a single huge MXU matmul, shardable over the feature axis
  with a psum), then every (fold, alpha) fit is a small [n, n] Cholesky
  solve.  Predictions never materialise the [V, D] weight matrix:
  ``pred(Xq) = (Xq X^T) dual_coef``.

* **Primal form** for tall problems (searchlight patches: 750 features):
  per-vertex [K, K] gram + Cholesky, batched over vertices with vmap.

Both forms are algebraically identical to sklearn's ridge (its 'auto' solver
picks the same primal/dual split).  CV reproduces sklearn's
``KFold(shuffle=False)`` consecutive-block folds and GridSearchCV's
first-argmax tie-breaking up to an epsilon band: fold scores here are f32
device reductions, so exact-in-float64 ties can split by f32 noise; the
selection therefore picks the FIRST alpha within 1e-6 of the max (see
``first_argmax_with_tol``).  This deviates from sklearn only when a later
alpha genuinely wins by less than 1e-6 — empirically never at production
shapes (on-device gate: 1024/1024 agreement, benchmarks/check_cv_parity.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_decoding_tpu.ops.metrics import pairwise_accuracy


#: Width of the alpha-selection tie band (see first_argmax_with_tol).
ALPHA_TIE_TOL = 1e-6


def first_argmax_with_tol(scores, axis: int = 0, tol: float = ALPHA_TIE_TOL):
    """First index whose score is within ``tol`` of the max along ``axis``.

    The CV alpha-selection rule, shared by the whole-brain (ridge_cv_dual)
    and searchlight (fit_block_cv) paths.  Semantics, precisely:

    * exact ties -> FIRST index, like sklearn GridSearchCV's ``np.argmax``;
    * scores within ``tol`` of the max count as tied, so when a LATER index
      beats an earlier one by less than ``tol`` the EARLIER index wins.

    The band exists because fold scores are f32 device reductions: ties that
    are exact in sklearn's float64 pipeline can split by f32 rounding here,
    and without the band the selection would be noise-determined.  The cost
    is the documented (second) deviation from sklearn when a sub-tol win is
    genuine — property-tested in tests/test_ridge.py and empirically absent
    at production shapes (benchmarks/check_cv_parity.py: 1024/1024
    agreement on device).
    """
    mx = jnp.max(scores, axis=axis, keepdims=True)
    return jnp.argmax(scores >= mx - tol, axis=axis)


def kfold_indices(n_samples: int, n_splits: int):
    """Consecutive-block K-fold split, sklearn ``KFold(shuffle=False)`` parity.

    First ``n_samples % n_splits`` folds have size ``n//k + 1``; returns a
    list of (train_idx, val_idx) numpy arrays.
    """
    indices = np.arange(n_samples)
    fold_sizes = np.full(n_splits, n_samples // n_splits, dtype=int)
    fold_sizes[: n_samples % n_splits] += 1
    folds = []
    current = 0
    for size in fold_sizes:
        val = indices[current : current + size]
        train = np.concatenate([indices[:current], indices[current + size :]])
        folds.append((train, val))
        current += size
    return folds


# ---------------------------------------------------------------------------
# Primal form: small feature dim (searchlight patches)
# ---------------------------------------------------------------------------


def ridge_fit_primal(X: jnp.ndarray, Y: jnp.ndarray, alpha) -> jnp.ndarray:
    """W = (X^T X + alpha I)^-1 X^T Y.  X [..., n, f], Y [..., n, d] -> W [..., f, d]."""
    G = jnp.matmul(
        jnp.swapaxes(X, -1, -2), X, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    XtY = jnp.matmul(jnp.swapaxes(X, -1, -2), Y, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(G.shape[-1], dtype=G.dtype)
    A = G + alpha * eye
    cho = jax.scipy.linalg.cho_factor(A, lower=True)
    return jax.scipy.linalg.cho_solve(cho, XtY)


def ridge_predict(X: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(X, W, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Dual form: wide problems (whole-brain)
# ---------------------------------------------------------------------------


def _feature_sharded(xc: jnp.ndarray, mesh) -> jax.Array:
    """Place a [n, F_block] column block with the feature axis sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    f = xc.shape[1]
    n_dev = mesh.devices.size
    pad = (-f) % n_dev
    if pad:
        xc = jnp.pad(xc, ((0, 0), (0, pad)))  # zero cols contribute nothing
    return jax.device_put(xc, NamedSharding(mesh, P(None, mesh.axis_names[0])))


def gram_matrix(X: np.ndarray, block_cols: int = 16384, mesh=None) -> jax.Array:
    """K = X X^T streamed over feature blocks (host -> device).

    The full X (e.g. [9k, 327k] f32 ~ 12 GB) need not fit on device: each
    block is transferred, multiplied on the MXU at full f32 precision, and
    accumulated.  Replaces the reference's in-RAM sklearn gram
    (ridge_regression_decoding.py:123 via sklearn's _solve_cholesky_kernel).

    With a ``mesh`` (1-D, feature axis — parallel.mesh.feature_mesh), each
    block is sharded over the devices and GSPMD inserts the psum: the
    tensor-parallel whole-brain gram (SURVEY.md §2b row 2).
    """
    n, f = X.shape

    @jax.jit
    def acc(k, xc):
        return k + jnp.matmul(
            xc, xc.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )

    k = jnp.zeros((n, n), dtype=jnp.float32)
    for start in range(0, f, block_cols):
        xc = jnp.asarray(X[:, start : start + block_cols], dtype=jnp.float32)
        if mesh is not None:
            xc = _feature_sharded(xc, mesh)
        k = acc(k, xc)
    return k


def dual_ridge_fit(K: jnp.ndarray, Y: jnp.ndarray, alpha) -> jnp.ndarray:
    """dual_coef = (K + alpha I)^-1 Y;  K [n, n], Y [n, d]."""
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    cho = jax.scipy.linalg.cho_factor(K + alpha * eye, lower=True)
    return jax.scipy.linalg.cho_solve(cho, Y)


def dual_ridge_predict(K_query: jnp.ndarray, dual_coef: jnp.ndarray) -> jnp.ndarray:
    """pred = (Xq X^T) dual_coef;  K_query [m, n]."""
    return jnp.matmul(K_query, dual_coef, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def cross_matrix(X_query: np.ndarray, X_train: np.ndarray, block_cols: int = 16384,
                 mesh=None) -> jax.Array:
    """K_query = Xq X^T streamed over feature blocks (optionally feature-sharded)."""
    m, f = X_query.shape

    @jax.jit
    def acc(k, xq, xt):
        return k + jnp.matmul(
            xq, xt.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )

    k = jnp.zeros((m, X_train.shape[0]), dtype=jnp.float32)
    for start in range(0, f, block_cols):
        xq = jnp.asarray(X_query[:, start : start + block_cols], dtype=jnp.float32)
        xt = jnp.asarray(X_train[:, start : start + block_cols], dtype=jnp.float32)
        if mesh is not None:
            xq = _feature_sharded(xq, mesh)
            xt = _feature_sharded(xt, mesh)
        k = acc(k, xq, xt)
    return k


# ---------------------------------------------------------------------------
# CV alpha sweep (GridSearchCV parity)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("scorer", "solver"))
def _cv_fold_scores(K_tt, K_vt, Y_tr, Y_va, alphas, scorer=None,
                    solver: str | None = None):
    """Scores for all alphas on one fold.  Returns [n_alphas].

    ``solver=None`` (strict): per-alpha HIGHEST-precision cho_solve — the
    sklearn-parity oracle.  A solver name ("schur-cb"/"schur-pallas")
    switches the SELECTION solves to the batched Schur SPD inverse at
    DEFAULT precision: the CV sweep is Cholesky-dominated (5.85 s of the
    7.4 s whole-brain stage sum; vmap over alphas measured IDENTICAL to
    lax.map — batched large Choleskys serialise either way), while the
    Schur inverse is GEMM-dominated and MXU-friendly.  Selection-grade
    only: its obligation is the alpha argmax; the refit in ridge_cv_dual
    never changes.
    """

    def one_alpha(alpha):
        dual = dual_ridge_fit(K_tt, Y_tr, alpha)
        preds = dual_ridge_predict(K_vt, dual)
        if scorer is None:
            return pairwise_accuracy(Y_va, preds)
        return scorer(Y_va, preds)

    if solver is None:
        # lax.map, NOT vmap: they measured identical (batched large
        # Choleskys serialise anyway) and vmap materialises all n_alphas
        # [n_tr, n_tr] systems + factors at once (~2 GB at whole-brain
        # shapes; a denser alpha grid would OOM for no gain)
        return jax.lax.map(one_alpha, alphas)

    from multimodal_decoding_tpu.ops.solvers import spd_inverse

    DEF = jax.lax.Precision.DEFAULT
    eye = jnp.eye(K_tt.shape[-1], dtype=K_tt.dtype)
    A_all = K_tt[None] + alphas[:, None, None] * eye  # [A, n_tr, n_tr]
    inv_all = spd_inverse(A_all, method=solver, precision=DEF)

    def one_alpha_fast(inv):
        dual = jnp.matmul(inv, Y_tr, preferred_element_type=jnp.float32,
                          precision=DEF)
        preds = jnp.matmul(K_vt, dual, preferred_element_type=jnp.float32,
                           precision=DEF)
        if scorer is None:
            return pairwise_accuracy(Y_va, preds)
        return scorer(Y_va, preds)

    return jax.lax.map(one_alpha_fast, inv_all)


@functools.partial(jax.jit, static_argnames=("lo", "hi", "scorer", "solver"))
def _cv_fold_scores_sliced(K, Y, lo: int, hi: int, alphas, scorer=None,
                           solver: str | None = None):
    """_cv_fold_scores with the fold-block assembly INSIDE the jit.

    KFold validation folds are contiguous [lo:hi) ranges, so the train
    blocks are 2x2 slice concats of the full gram.  Doing this eagerly
    materialises ~0.5 GB of intermediates per fold next to whatever else is
    resident (it OOMed the whole-brain bench beside the 10.7 GB X); inside
    jit XLA fuses the slices into the consumers.  Static (lo, hi) costs one
    compile per distinct fold geometry (<= n_splits, cached across
    subjects/models of the production sweep).
    """
    K_tt = jnp.concatenate([
        jnp.concatenate([K[:lo, :lo], K[:lo, hi:]], axis=1),
        jnp.concatenate([K[hi:, :lo], K[hi:, hi:]], axis=1),
    ], axis=0)
    K_vt = jnp.concatenate([K[lo:hi, :lo], K[lo:hi, hi:]], axis=1)
    Y_tr = jnp.concatenate([Y[:lo], Y[hi:]], axis=0)
    return _cv_fold_scores(K_tt, K_vt, Y_tr, Y[lo:hi], alphas,
                           scorer=scorer, solver=solver)


def ridge_cv_dual(
    K: jax.Array,
    Y: jax.Array,
    alphas: Sequence[float],
    n_splits: int = 5,
    scorer: Callable | None = None,
    cv_solver: str | None = None,
):
    """GridSearchCV(Ridge, scoring=pairwise_accuracy, cv=KFold) on the gram.

    Returns (best_alpha_idx, mean_scores [n_alphas], full-train dual_coef for
    the best alpha).  Reproduces sklearn semantics: unshuffled consecutive
    folds (ridge_regression_decoding.py:115 ``cv=5``), unweighted mean of
    fold scores, refit on the full train set; the tie-break is sklearn's
    first-argmax up to the epsilon band of ``first_argmax_with_tol`` (f32
    fold scores make exact-float64 parity unattainable — see its docstring).

    ``cv_solver``: selection fast path (see _cv_fold_scores) — the refit
    below always stays at the strict HIGHEST cho_solve regardless.
    """
    n = K.shape[0]
    alphas_arr = jnp.asarray(alphas, dtype=jnp.float32)
    # commit Y to device ONCE: numpy fold slices would re-upload ~[n_tr, D]
    # per jitted fold call (5x ~20 MB per CV at production shapes — noise on
    # PCIe hosts, seconds through a dev tunnel)
    Y = jnp.asarray(Y)
    K = jnp.asarray(K)
    fold_scores = []
    for train_idx, val_idx in kfold_indices(n, n_splits):
        # KFold validation folds are CONTIGUOUS ranges (sklearn unshuffled
        # cv=5), so the fold blocks assemble from slices — inside the jit.
        # The previous K[np.ix_(tr, tr)] double-axis gather of ~27M elements
        # dominated the whole CV sweep on TPU (5.9 s of which ~5 s was
        # gathers — swapping the solver didn't move the total; see
        # benchmarks/profile_whole_brain_stages.py).  Slice assembly took it
        # to 453 ms.
        lo, hi = int(val_idx[0]), int(val_idx[-1]) + 1
        if np.array_equal(val_idx, np.arange(lo, hi)):
            fold_scores.append(
                _cv_fold_scores_sliced(K, Y, lo, hi, alphas_arr,
                                       scorer=scorer, solver=cv_solver)
            )
        else:
            # gather fallback for non-contiguous folds (a bare assert would
            # vanish under python -O and silently slice wrong rows)
            K_tt = K[np.ix_(train_idx, train_idx)]
            K_vt = K[np.ix_(val_idx, train_idx)]
            fold_scores.append(
                _cv_fold_scores(K_tt, K_vt, Y[train_idx], Y[val_idx],
                                alphas_arr, scorer=scorer, solver=cv_solver)
            )
    mean_scores = jnp.mean(jnp.stack(fold_scores), axis=0)
    # epsilon-band first-argmax — semantics documented at first_argmax_with_tol
    best_idx = int(first_argmax_with_tol(mean_scores))
    dual_coef = dual_ridge_fit(K, Y, float(alphas[best_idx]))
    return best_idx, np.asarray(mean_scores), dual_coef


# ---------------------------------------------------------------------------
# Batched multi-alpha spectral sweep (for dense alpha grids on one gram)
# ---------------------------------------------------------------------------


def dual_ridge_fit_all_alphas_eigh(K: jnp.ndarray, Y: jnp.ndarray, alphas: jnp.ndarray):
    """All-alphas dual coefficients via one eigendecomposition.

    eigh(K) = U diag(lam) U^T; dual(alpha) = U diag(1/(lam+alpha)) U^T Y.
    One O(n^3) factorisation amortised over the whole alpha grid — the
    TPU-native equivalent of GridSearchCV's embarrassingly parallel refits.
    Returns [n_alphas, n, d].
    """
    lam, U = jnp.linalg.eigh(K)
    UtY = jnp.matmul(U.T, Y, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    def per_alpha(alpha):
        scaled = UtY / (lam + alpha)[:, None]
        return jnp.matmul(U, scaled, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(per_alpha)(alphas)
