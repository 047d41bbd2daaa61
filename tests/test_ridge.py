"""Parity tests: closed-form ridge vs sklearn Ridge / GridSearchCV."""

import numpy as np
from sklearn.linear_model import Ridge
from sklearn.metrics import make_scorer
from sklearn.model_selection import GridSearchCV, KFold

from multimodal_decoding_tpu.ops import ridge as R
from multimodal_decoding_tpu.ops.metrics import pairwise_accuracy


def _ref_pairwise_acc(y_true, y_pred):
    from scipy.spatial.distance import cdist

    dist = cdist(y_pred, y_true, metric="cosine")
    diag = dist.diagonal().reshape(-1, 1)
    return (diag < dist).sum() / (dist.size - diag.size)


def test_kfold_matches_sklearn():
    for n in [23, 100, 47]:
        ours = R.kfold_indices(n, 5)
        ref = list(KFold(n_splits=5, shuffle=False).split(np.zeros((n, 1))))
        for (otr, ova), (rtr, rva) in zip(ours, ref):
            np.testing.assert_array_equal(otr, rtr)
            np.testing.assert_array_equal(ova, rva)


def test_primal_ridge_matches_sklearn(rng):
    X = rng.randn(60, 20).astype(np.float32)
    Y = rng.randn(60, 5).astype(np.float32)
    Xq = rng.randn(15, 20).astype(np.float32)
    for alpha in [1.0, 100.0]:
        W = np.asarray(R.ridge_fit_primal(X, Y, alpha))
        ref_model = Ridge(alpha=alpha, fit_intercept=False).fit(X, Y)
        # coefficients agree to f32-arithmetic precision...
        np.testing.assert_allclose(W, ref_model.coef_.T, atol=5e-3)
        # ...and predictions tightly (the quantity that feeds the accuracy metric)
        preds = np.asarray(R.ridge_predict(Xq, W))
        np.testing.assert_allclose(preds, ref_model.predict(Xq), atol=2e-3)


def test_dual_ridge_matches_sklearn_wide(rng):
    # wide problem: n_samples < n_features (whole-brain regime)
    X = rng.randn(40, 200).astype(np.float32)
    Y = rng.randn(40, 6).astype(np.float32)
    Xq = rng.randn(10, 200).astype(np.float32)
    alpha = 1e3

    K = np.asarray(R.gram_matrix(X, block_cols=64))
    dual = R.dual_ridge_fit(K, Y, alpha)
    Kq = np.asarray(R.cross_matrix(Xq, X, block_cols=64))
    preds = np.asarray(R.dual_ridge_predict(Kq, dual))

    ref_preds = Ridge(alpha=alpha, fit_intercept=False).fit(X, Y).predict(Xq)
    np.testing.assert_allclose(preds, ref_preds, atol=2e-4)


def test_eigh_alpha_sweep_matches_cholesky(rng):
    X = rng.randn(30, 100).astype(np.float32)
    Y = rng.randn(30, 4).astype(np.float32)
    K = np.asarray(R.gram_matrix(X, block_cols=32))
    alphas = np.array([1e2, 1e4, 1e6], dtype=np.float32)
    duals_eigh = np.asarray(R.dual_ridge_fit_all_alphas_eigh(K, Y, alphas))
    for i, a in enumerate(alphas):
        dual_chol = np.asarray(R.dual_ridge_fit(K, Y, float(a)))
        np.testing.assert_allclose(duals_eigh[i], dual_chol, atol=1e-4)


def test_cv_alpha_selection_matches_gridsearchcv(rng):
    """Exact GridSearchCV semantic parity: same folds, same scorer, same argmax."""
    n, f, d = 75, 120, 8
    # structured data so there is a real optimum
    W_true = rng.randn(f, d)
    X = rng.randn(n, f).astype(np.float32)
    Y = (X @ W_true + 3.0 * rng.randn(n, d)).astype(np.float32)
    alphas = [1e0, 1e1, 1e2, 1e3, 1e4]

    clf = GridSearchCV(
        estimator=Ridge(fit_intercept=False),
        param_grid=dict(alpha=alphas),
        scoring=make_scorer(_ref_pairwise_acc, greater_is_better=True),
        cv=5,
        refit=True,
    )
    clf.fit(X, Y)

    K = np.asarray(R.gram_matrix(X, block_cols=64))
    best_idx, mean_scores, dual = R.ridge_cv_dual(K, Y, alphas, n_splits=5)

    np.testing.assert_allclose(
        mean_scores, clf.cv_results_["mean_test_score"], atol=1e-4
    )
    assert alphas[best_idx] == clf.best_params_["alpha"]

    # refit predictions match sklearn's best_estimator_
    Xq = rng.randn(12, f).astype(np.float32)
    Kq = np.asarray(R.cross_matrix(Xq, X, block_cols=64))
    preds = np.asarray(R.dual_ridge_predict(Kq, dual))
    ref_preds = clf.best_estimator_.predict(Xq)
    np.testing.assert_allclose(preds, ref_preds, atol=2e-3)

    # and the accuracy computed from them is within the BASELINE tolerance
    acc_ours = float(pairwise_accuracy(Y[:12], preds))
    acc_ref = _ref_pairwise_acc(Y[:12], ref_preds)
    assert abs(acc_ours - acc_ref) < 1e-4


def test_cv_fast_solver_selection_matches_strict():
    """schur-cb selection fast path picks the same alpha as the strict
    HIGHEST cho_solve oracle on planted-signal problems."""
    import jax.numpy as jnp

    from multimodal_decoding_tpu.ops.ridge import ridge_cv_dual

    n, v, d = 120, 300, 16
    for seed in range(3):
        r = np.random.RandomState(seed)
        W = r.randn(v, d).astype(np.float32)
        X = r.randn(n, v).astype(np.float32)
        Y = (X @ W + 3.0 * r.randn(n, d)).astype(np.float32)
        K = jnp.asarray(X @ X.T)
        best_strict, scores_strict, _ = ridge_cv_dual(K, Y, [1e0, 1e2, 1e4], n_splits=5)
        best_fast, scores_fast, _ = ridge_cv_dual(K, Y, [1e0, 1e2, 1e4], n_splits=5,
                                                  cv_solver="schur-cb")
        assert best_fast == best_strict, seed
        np.testing.assert_allclose(scores_fast, scores_strict, atol=2e-3)


def test_first_argmax_tie_band_semantics():
    """Property-test the documented epsilon-band tie-break (VERDICT r3 #5).

    The selection rule is: first index within ALPHA_TIE_TOL of the max.
    That means (a) exact ties pick the first index (sklearn parity), and
    (b) a LATER index that wins by LESS than the tolerance loses to the
    earlier one — the documented deviation from sklearn's exact float64
    argmax.  Wins larger than the tolerance behave exactly like argmax.
    """
    import jax.numpy as jnp

    from multimodal_decoding_tpu.ops.ridge import ALPHA_TIE_TOL, first_argmax_with_tol

    # (a) exact tie -> first index
    assert int(first_argmax_with_tol(jnp.array([0.5, 0.5, 0.4]))) == 0
    # (b) sub-tolerance win by a later alpha -> the EARLIER alpha still wins
    sub = ALPHA_TIE_TOL / 4
    assert int(first_argmax_with_tol(jnp.array([0.5, 0.5 + sub, 0.4]))) == 0
    # (c) super-tolerance win -> plain argmax
    sup = ALPHA_TIE_TOL * 4
    assert int(first_argmax_with_tol(jnp.array([0.5, 0.5 + sup, 0.4]))) == 1
    # (d) batched axis semantics match the scalar rule per column
    scores = jnp.array([
        [0.5, 0.5, 0.5],
        [0.5, 0.5 + sub, 0.5 + sup],
        [0.4, 0.4, 0.4],
    ])  # [n_alphas, B]
    np.testing.assert_array_equal(
        np.asarray(first_argmax_with_tol(scores, axis=0)), [0, 0, 1]
    )
    # (e) randomized: the chosen index is always within tol of the max and
    # is the first such index
    r = np.random.RandomState(0)
    for _ in range(50):
        s = r.rand(6).astype(np.float32)
        i = int(first_argmax_with_tol(jnp.asarray(s)))
        assert s[i] >= s.max() - ALPHA_TIE_TOL
        assert not np.any(s[:i] >= s.max() - ALPHA_TIE_TOL)
