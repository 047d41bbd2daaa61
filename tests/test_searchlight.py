"""Searchlight engine parity vs a per-vertex sklearn reference loop.

The reference loop reimplements the semantics of
/root/reference/analyses/decoding/searchlight/searchlight.py:38-90 directly
with sklearn/scipy (fit Ridge per vertex on X[:, neighbors], score with the
pairwise-accuracy family).
"""

import numpy as np
import pytest
from scipy.spatial.distance import cdist
from sklearn.linear_model import Ridge
from sklearn.preprocessing import StandardScaler

import jax

from multimodal_decoding_tpu.decoding import searchlight_engine as E
from multimodal_decoding_tpu.ops import metrics as M
from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight
from multimodal_decoding_tpu.parallel.mesh import vertex_mesh


def ref_acc(latents, preds, std_preds=False):
    if std_preds:
        preds = StandardScaler().fit_transform(preds)
    dist = cdist(preds, latents, metric="cosine")
    diag = dist.diagonal().reshape(-1, 1)
    return (diag < dist).sum() / (dist.size - diag.size)


def make_problem(rng, v=24, k=6, n_train=40, d=5, n_cap=5, n_img=5, n_imag=3):
    X_train = rng.randn(n_train, v).astype(np.float32)
    X_test = rng.randn(n_cap + n_img, v).astype(np.float32)
    X_imag = rng.randn(n_imag, v).astype(np.float32)
    Y_train = rng.randn(n_train, d).astype(np.float32)
    Y_test = rng.randn(n_cap + n_img, d).astype(np.float32)
    Y_imag = rng.randn(n_imag, d).astype(np.float32)
    stim_types = np.array(["caption"] * n_cap + ["image"] * n_img)
    adjacency = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)
    return X_train, X_test, X_imag, Y_train, Y_test, Y_imag, stim_types, adjacency


def ref_vertex_scores(Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, nbrs, alpha):
    """train_and_test semantics per vertex (searchlight.py:38-90)."""
    model = Ridge(alpha=alpha, fit_intercept=False)
    model.fit(Xtr[:, nbrs], Ytr)
    pt = model.predict(Xte[:, nbrs])
    pi = model.predict(Xim[:, nbrs])
    cap, img = stim_types == "caption", stim_types == "image"
    out = {
        M.ACC_CAPTIONS: ref_acc(Yte[cap], pt[cap], std_preds=True),
        M.ACC_IMAGES: ref_acc(Yte[img], pt[img], std_preds=True),
        M.ACC_CROSS_CAPTIONS_TO_IMAGES: ref_acc(Yte[img], pt[cap], std_preds=True),
        M.ACC_CROSS_IMAGES_TO_CAPTIONS: ref_acc(Yte[cap], pt[img], std_preds=True),
        M.ACC_IMAGERY: ref_acc(Yim, pi, std_preds=True),
        M.ACC_IMAGERY_WHOLE_TEST: ref_acc(np.concatenate((Yim, Yte)), pi, std_preds=True),
        M.ACC_IMAGERY + "_no_std": ref_acc(Yim, pi),
        M.ACC_IMAGERY_WHOLE_TEST + "_no_std": ref_acc(np.concatenate((Yim, Yte)), pi),
    }
    return out, pt, pi


def test_block_matches_sklearn_loop(rng):
    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng)
    alpha = 10.0
    layout = E.TestLayout.from_stim_types(stim_types)
    X_all = np.concatenate([Xtr, Xte, Xim])

    scores = E.searchlight_block(
        X_all, Ytr, Yte, Yim, adj, None, alpha,
        layout=layout, n_train=len(Xtr), n_test=len(Xte),
    )
    for v in range(len(adj)):
        ref, _, _ = ref_vertex_scores(Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj[v], alpha)
        for metric, val in ref.items():
            assert abs(float(scores[metric][v]) - val) < 1e-4, (metric, v)


def test_radius_mask_equals_column_drop(rng):
    """Zero-masked neighbour columns == dropping those features from the fit."""
    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, k=6)
    layout = E.TestLayout.from_stim_types(stim_types)
    X_all = np.concatenate([Xtr, Xte, Xim])
    mask = np.ones_like(adj, dtype=bool)
    mask[:, 4:] = False  # only first 4 neighbours are real

    scores = E.searchlight_block(
        X_all, Ytr, Yte, Yim, adj, mask, 5.0,
        layout=layout, n_train=len(Xtr), n_test=len(Xte),
    )
    for v in [0, 7, 20]:
        ref, _, _ = ref_vertex_scores(
            Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj[v][:4], 5.0
        )
        for metric, val in ref.items():
            assert abs(float(scores[metric][v]) - val) < 1e-4, (metric, v)


def test_null_scores_match_recomputation(rng):
    """Rank-count gather trick == brute-force shuffled re-scoring."""
    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, v=8)
    layout = E.TestLayout.from_stim_types(stim_types)
    X_all = np.concatenate([Xtr, Xte, Xim])
    n_cap = 5

    # within-modality shuffles (reference data.py:554-561 semantics)
    P = 4
    shuffles = []
    for p in range(P):
        r = np.random.RandomState(100 + p)
        shuffles.append(
            np.concatenate([r.permutation(n_cap), n_cap + r.permutation(n_cap)])
        )
    shuffles = np.stack(shuffles).astype(np.int32)
    ders = np.zeros((len(adj), P), dtype=np.int32)
    ders[:, 1::2] = 1  # deterministic derangement choice for the test

    main, null = E.searchlight_block_with_null(
        X_all, Ytr, Yte, Yim, adj, None, 3.0, shuffles, ders,
        layout=layout, n_train=len(Xtr), n_test=len(Xte),
    )

    DER = [[1, 2, 0], [2, 0, 1]]
    cap, img = stim_types == "caption", stim_types == "image"
    for v in range(len(adj)):
        model = Ridge(alpha=3.0, fit_intercept=False).fit(Xtr[:, adj[v]], Ytr)
        pt = model.predict(Xte[:, adj[v]])
        pi = model.predict(Xim[:, adj[v]])
        for p in range(P):
            y_shuf = Yte[shuffles[p]]
            y_im_shuf = Yim[DER[ders[v, p]]]
            ref = {
                M.ACC_CAPTIONS: ref_acc(y_shuf[cap], pt[cap], std_preds=True),
                M.ACC_IMAGES: ref_acc(y_shuf[img], pt[img], std_preds=True),
                M.ACC_IMAGERY: ref_acc(y_im_shuf, pi, std_preds=True),
                M.ACC_IMAGERY_WHOLE_TEST: ref_acc(
                    np.concatenate((y_im_shuf, y_shuf)), pi, std_preds=True
                ),
                M.ACC_IMAGERY + "_no_std": ref_acc(y_im_shuf, pi),
                M.ACC_IMAGERY_WHOLE_TEST + "_no_std": ref_acc(
                    np.concatenate((y_im_shuf, y_shuf)), pi
                ),
            }
            for metric, val in ref.items():
                assert abs(float(null[metric][v, p]) - val) < 1e-4, (metric, v, p)


def test_cv_block_selects_per_vertex_alpha(rng):
    from sklearn.model_selection import GridSearchCV
    from sklearn.metrics import make_scorer

    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, v=6, k=5, n_train=50)
    # structured signal so CV has a real optimum
    W = rng.randn(6, 5)
    Ytr = (Xtr @ W + 0.7 * rng.randn(50, 5)).astype(np.float32)
    layout = E.TestLayout.from_stim_types(stim_types)
    X_all = np.concatenate([Xtr, Xte, Xim])
    alphas = [1e-1, 1e1, 1e3]

    scores = E.searchlight_block_cv(
        X_all, Ytr, Yte, Yim, adj, None, np.asarray(alphas, dtype=np.float32),
        layout=layout, n_train=len(Xtr), n_test=len(Xte),
    )

    def sk_acc(y_true, y_pred):
        return ref_acc(y_true, y_pred)

    for v in range(len(adj)):
        clf = GridSearchCV(
            Ridge(fit_intercept=False),
            dict(alpha=alphas),
            scoring=make_scorer(sk_acc, greater_is_better=True),
            cv=5,
        ).fit(Xtr[:, adj[v]].astype(np.float64), Ytr.astype(np.float64))
        assert float(scores["best_alpha"][v]) == pytest.approx(clf.best_params_["alpha"])


def test_cv_fast_path_matches_strict(rng):
    """cv_precision=DEFAULT + cv_solver=schur selects the same alphas and
    produces the same final scores as the strict cholesky path (the refit
    itself always runs at the strict settings)."""
    import jax

    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, v=6, k=5, n_train=50)
    W = rng.randn(6, 5)
    Ytr = (Xtr @ W + 0.7 * rng.randn(50, 5)).astype(np.float32)
    layout = E.TestLayout.from_stim_types(stim_types)
    X_all = np.concatenate([Xtr, Xte, Xim])
    alphas = np.asarray([1e-1, 1e1, 1e3], dtype=np.float32)
    common = dict(layout=layout, n_train=len(Xtr), n_test=len(Xte))

    strict = E.searchlight_block_cv(X_all, Ytr, Yte, Yim, adj, None, alphas, **common)
    fast = E.searchlight_block_cv(
        X_all, Ytr, Yte, Yim, adj, None, alphas,
        cv_precision=jax.lax.Precision.DEFAULT, cv_solver="schur", **common,
    )
    np.testing.assert_array_equal(fast["best_alpha"], strict["best_alpha"])
    for m in strict:
        np.testing.assert_allclose(fast[m], strict[m], atol=1e-5, err_msg=m)


def test_runner_sharded_equals_single_device(rng):
    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, v=37)  # odd V: padding
    kwargs = dict(alpha=2.0, block_size=16, progress=False)

    mesh8 = vertex_mesh(jax.devices())
    mesh1 = vertex_mesh(jax.devices()[:1])
    s8, aux8 = run_searchlight(
        Xtr, Xte, Xim, Ytr, Yte, Yim, adj, stim_types, mesh=mesh8, **kwargs
    )
    s1, _ = run_searchlight(
        Xtr, Xte, Xim, Ytr, Yte, Yim, adj, stim_types, mesh=mesh1, **kwargs
    )
    assert set(s8) == set(s1)
    for metric in s8:
        assert s8[metric].shape == (37,)
        np.testing.assert_allclose(s8[metric], s1[metric], atol=1e-6)


def test_schur_solver_block_matches_cholesky(rng):
    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, v=12)
    layout = E.TestLayout.from_stim_types(stim_types)
    X_all = np.concatenate([Xtr, Xte, Xim])
    common = dict(layout=layout, n_train=len(Xtr), n_test=len(Xte))
    s_chol = E.searchlight_block(X_all, Ytr, Yte, Yim, adj, None, 10.0,
                                 solver="cholesky", **common)
    s_schur = E.searchlight_block(X_all, Ytr, Yte, Yim, adj, None, 10.0,
                                  solver="schur", **common)
    for m in s_chol:
        np.testing.assert_allclose(
            np.asarray(s_chol[m]), np.asarray(s_schur[m]), atol=1e-4
        )


@pytest.mark.parametrize("n_train,n_splits,k,d", [
    (47, 5, 5, 3),   # uneven folds (47 % 5 != 0), K > D
    (33, 3, 4, 7),   # uneven folds, D > K, 3 splits
])
def test_cv_alpha_selection_sklearn_sweep(rng, n_train, n_splits, k, d):
    """GridSearchCV-parity across fold-count/shape regimes, fast path."""
    import jax
    from sklearn.metrics import make_scorer
    from sklearn.model_selection import GridSearchCV

    v = 6
    Xtr = rng.randn(n_train, v).astype(np.float32)
    W = rng.randn(v, d)
    Ytr = (Xtr @ W + 0.8 * rng.randn(n_train, d)).astype(np.float32)
    Xte = rng.randn(10, v).astype(np.float32)
    Xim = rng.randn(3, v).astype(np.float32)
    Yte = rng.randn(10, d).astype(np.float32)
    Yim = rng.randn(3, d).astype(np.float32)
    adj = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)
    layout = E.TestLayout.from_stim_types(np.array(["caption"] * 5 + ["image"] * 5))
    X_all = np.concatenate([Xtr, Xte, Xim])
    alphas = [1e-1, 1e1, 1e3, 1e5]

    scores = E.searchlight_block_cv(
        X_all, Ytr, Yte, Yim, adj, None, np.asarray(alphas, dtype=np.float32),
        layout=layout, n_train=n_train, n_test=10, n_splits=n_splits,
        cv_precision=jax.lax.Precision.DEFAULT, cv_solver="schur-pallas",
    )

    for vtx in range(len(adj)):
        clf = GridSearchCV(
            Ridge(fit_intercept=False), dict(alpha=alphas),
            scoring=make_scorer(ref_acc, greater_is_better=True), cv=n_splits,
        ).fit(Xtr[:, adj[vtx]].astype(np.float64), Ytr.astype(np.float64))
        assert float(scores["best_alpha"][vtx]) == pytest.approx(
            clf.best_params_["alpha"]), vtx


def test_cv_parity_gate_runs_in_ci():
    """The CLAUDE.md-mandated parity gate, in CPU mode, as a CI test.

    Validates the SHIPPED platform default solver (the gate resolves it via
    decoding.searchlight.default_cv_solver, so it cannot drift from
    production again — VERDICT round 2, weak #3).
    """
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_cv_parity",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "benchmarks", "check_cv_parity.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run_parity(n_blocks=2)
    assert out["cv_solver"] == "schur-cb"  # CPU platform default
    assert out["alpha_agreement"] == 1.0
    assert out["max_final_score_delta"] == 0.0


def test_cv_bf16_selection_path(rng):
    """cv_dtype=bfloat16 selection: alpha argmax matches strict on planted
    signal, and agreeing vertices get bitwise-identical final scores (the
    refit never touches the bf16 copies)."""
    import jax
    import jax.numpy as jnp

    n_train, k, d, v = 160, 24, 16, 48
    Ytr = rng.randn(n_train, d).astype(np.float32)
    Yte = rng.randn(10, d).astype(np.float32)
    Yim = rng.randn(3, d).astype(np.float32)
    W = rng.randn(d, v).astype(np.float32) * 0.3
    X_all = np.concatenate([Ytr, Yte, Yim]) @ W
    X_all += rng.randn(*X_all.shape).astype(np.float32)
    adj = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)
    layout = E.TestLayout.from_stim_types(np.array(["caption"] * 5 + ["image"] * 5))
    alphas = np.asarray([1e0, 1e2, 1e4], dtype=np.float32)

    kw = dict(layout=layout, n_train=n_train, n_test=10)
    strict = E.searchlight_block_cv(
        X_all, Ytr, Yte, Yim, adj, None, alphas, cv_scorer="strict", **kw
    )
    fast = E.searchlight_block_cv(
        X_all, Ytr, Yte, Yim, adj, None, alphas,
        cv_precision=jax.lax.Precision.DEFAULT, cv_solver="schur-cb",
        cv_dtype=jnp.bfloat16, **kw
    )
    agree = np.asarray(fast["best_alpha"]) == np.asarray(strict["best_alpha"])
    assert agree.mean() >= 0.95, agree.mean()
    for m in strict:
        if m == "best_alpha":
            continue
        np.testing.assert_array_equal(
            np.asarray(fast[m])[agree], np.asarray(strict[m])[agree], err_msg=m
        )


def test_cv_fused_scorers_match_xla(rng):
    """The K-factored fold scorers (fused / fused-pallas streamed tiles)
    reproduce the xla scale-invariant fold scores and alpha selection."""
    import jax

    n_train, k, d, v = 160, 24, 40, 48
    Ytr = rng.randn(n_train, d).astype(np.float32)
    W = rng.randn(d, v).astype(np.float32) * 0.3
    Xtr = (Ytr @ W + rng.randn(n_train, v)).astype(np.float32)
    adj = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)
    alphas = np.asarray([1e0, 1e2, 1e4], dtype=np.float32)
    patches = E.gather_patches(Xtr, adj)

    outs = {}
    for scorer in ("xla", "fused", "fused-pallas", "fused-inv"):
        outs[scorer] = E.fit_block_cv(
            patches, Ytr, alphas, n_splits=5,
            cv_precision=jax.lax.Precision.HIGHEST, cv_solver="schur-cb",
            cv_scorer=scorer,
        )
    _, best_x, scores_x = outs["xla"]
    for scorer in ("fused", "fused-pallas", "fused-inv"):
        _, best, scores = outs[scorer]
        np.testing.assert_allclose(np.asarray(scores), np.asarray(scores_x),
                                   atol=5e-5, err_msg=scorer)
        np.testing.assert_array_equal(np.asarray(best), np.asarray(best_x))
    # the two fused variants see identical sim values -> identical counts
    np.testing.assert_allclose(np.asarray(outs["fused"][2]),
                               np.asarray(outs["fused-pallas"][2]), atol=1e-7)


def test_streamed_acc_from_factors_matches_dense(rng):
    """Kernel semantics across tile boundaries, non-multiple nv, batch tiles."""
    from multimodal_decoding_tpu.ops import metrics as M
    from multimodal_decoding_tpu.ops.pallas_metrics import streamed_acc_from_factors

    for b, nv, k in [(3, 150, 20), (2, 128, 7), (5, 260, 33)]:
        X = rng.randn(b, nv, k).astype(np.float32)
        Z = rng.randn(b, k, nv).astype(np.float32)
        dense = M.pairwise_acc_from_sim(np.einsum("bik,bkj->bij", X, Z))
        streamed = streamed_acc_from_factors(X, Z)
        np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense),
                                   atol=1e-6, err_msg=f"{b},{nv},{k}")


def test_score_and_null_block_matches_separate_paths(rng):
    """The combined main+null scorer is bitwise-identical to the separate
    score_block / null_score_block pair (same einsums, same precision, same
    comparisons — the main accuracy is the identity gather of the shared
    rank counts)."""
    import jax.numpy as jnp

    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, v=8)
    layout = E.TestLayout.from_stim_types(stim_types)
    n_cap = 5
    P = 4
    shuffles = np.stack([
        np.concatenate([np.random.RandomState(7 + p).permutation(n_cap),
                        n_cap + np.random.RandomState(7 + p).permutation(n_cap)])
        for p in range(P)
    ]).astype(np.int32)
    ders = np.random.RandomState(3).randint(0, 2, size=(len(adj), P)).astype(np.int32)

    preds_t = jnp.asarray(rng.randn(len(adj), len(Yte), Yte.shape[1]).astype(np.float32))
    preds_i = jnp.asarray(rng.randn(len(adj), 3, Yim.shape[1]).astype(np.float32))

    main_sep = E.score_block(preds_t, preds_i, Yte, Yim, layout)
    null_sep = E.null_score_block(preds_t, preds_i, Yte, Yim, layout,
                                  jnp.asarray(shuffles), jnp.asarray(ders))
    main_c, null_c = E.score_and_null_block(preds_t, preds_i, Yte, Yim, layout,
                                            jnp.asarray(shuffles), jnp.asarray(ders))
    assert list(main_c) == list(main_sep)
    assert list(null_c) == list(null_sep)
    for m in main_sep:
        np.testing.assert_array_equal(np.asarray(main_c[m]),
                                      np.asarray(main_sep[m]), err_msg=m)
    for m in null_sep:
        np.testing.assert_array_equal(np.asarray(null_c[m]),
                                      np.asarray(null_sep[m]), err_msg=m)


def test_cv_alpha_batch_parity(rng):
    """Chunked alpha-batched inverse selection == per-alpha lax.map path."""
    import jax.numpy as jnp

    n, k, d, v = 60, 8, 6, 12
    Ytr = rng.randn(n, d).astype(np.float32)
    Xtr = (Ytr @ rng.randn(d, v) + rng.randn(n, v)).astype(np.float32)
    adj = np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]).astype(np.int32)
    patches = E.gather_patches(jnp.asarray(Xtr), jnp.asarray(adj))
    alphas = jnp.asarray([1.0, 10.0, 100.0, 1000.0], dtype=jnp.float32)
    _, b0, s0 = E.fit_block_cv(patches, Ytr, alphas, 3, cv_solver="schur-cb")
    for chunk in (2, 4, True):
        _, b1, s1 = E.fit_block_cv(patches, Ytr, alphas, 3, cv_solver="schur-cb",
                                   cv_alpha_batch=chunk)
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_adjacency_cache_roundtrip(tmp_path, rng):
    from multimodal_decoding_tpu.decoding.searchlight import build_adjacency

    coords = rng.randn(64, 3).astype(np.float32)
    idx0, _, _, d0 = build_adjacency(coords, n_neighbors=5,
                                     cache_dir=str(tmp_path))
    files = list(tmp_path.glob("adjacency_*.npz"))
    assert len(files) == 1
    idx1, _, _, d1 = build_adjacency(coords, n_neighbors=5,
                                     cache_dir=str(tmp_path))
    np.testing.assert_array_equal(idx0, idx1)
    np.testing.assert_array_equal(d0, d1)
    # different K -> different cache entry, not a stale hit
    idx2, _, _, _ = build_adjacency(coords, n_neighbors=7,
                                    cache_dir=str(tmp_path))
    assert idx2.shape[1] == 7 and len(list(tmp_path.glob("adjacency_*.npz"))) == 2


def test_null_gather_modes_bitwise_exact():
    """The one-hot (incl. bf16) permuted-diagonal formulations are EXACT:
    rank counts are integers < 256 (bf16-representable) and one-hot rows
    select a single term, so no rounding can occur.  Both full-block null
    outputs must match the gather formulation bitwise."""
    import jax.numpy as jnp

    from multimodal_decoding_tpu.decoding import searchlight_engine as E

    rng = np.random.RandomState(1)
    C = rng.randint(0, 143, (6, 70, 70)).astype(np.int32)
    perm = np.stack([rng.permutation(70) for _ in range(9)]).astype(np.int32)
    g = np.asarray(E._gather_perm_diag(jnp.asarray(C), jnp.asarray(perm), "gather"))
    for mode in ("onehot", "onehot-bf16"):
        o = np.asarray(E._gather_perm_diag(jnp.asarray(C), jnp.asarray(perm), mode))
        assert np.array_equal(o, g.astype(np.float32)), mode

    # end-to-end: searchlight_block_cv_with_null outputs identical per mode
    n_train, n_test, n_imag, d, v, k, b, P = 24, 10, 3, 4, 40, 5, 8, 6
    r = np.random.RandomState(2)
    X_all = jnp.asarray(r.randn(n_train + n_test + n_imag, v).astype(np.float32))
    Y_tr = jnp.asarray(r.randn(n_train, d).astype(np.float32))
    Y_te = jnp.asarray(r.randn(n_test, d).astype(np.float32))
    Y_im = jnp.asarray(r.randn(n_imag, d).astype(np.float32))
    idx = jnp.asarray(np.stack([r.choice(v, k, replace=False) for _ in range(b)]).astype(np.int32))
    n_cap = n_test // 2
    shuffles = jnp.asarray(np.stack([
        np.concatenate([r.permutation(n_cap), n_cap + r.permutation(n_cap)])
        for _ in range(P)]).astype(np.int32))
    ders = jnp.asarray(r.randint(0, 2, (b, P)).astype(np.int32))
    layout = E.TestLayout.from_stim_types(
        np.array(["caption"] * n_cap + ["image"] * (n_test - n_cap)))
    alphas = jnp.asarray([1e0, 1e2], dtype=jnp.float32)
    outs = {}
    for mode in ("gather", "onehot", "onehot-bf16"):
        main, null = E.searchlight_block_cv_with_null(
            X_all, Y_tr, Y_te, Y_im, idx, None, alphas, shuffles, ders,
            layout=layout, n_train=n_train, n_test=n_test, null_gather=mode)
        outs[mode] = {m: np.asarray(val) for m, val in null.items()}
    for mode in ("onehot", "onehot-bf16"):
        for m in outs["gather"]:
            np.testing.assert_array_equal(outs[mode][m], outs["gather"][m],
                                          err_msg=f"{mode}/{m}")


def test_null_gather_mode_validation_and_bf16_bound():
    """ADVICE r4: unknown modes must raise (not silently take the one-hot
    path), and onehot-bf16 with >256 test columns must fall back to the
    exact f32 one-hot rather than silently losing bit-exactness."""
    import jax.numpy as jnp
    import pytest

    from multimodal_decoding_tpu.decoding import searchlight_engine as E

    rng = np.random.RandomState(3)
    C = rng.randint(0, 100, (2, 12, 12)).astype(np.int32)
    perm = np.stack([rng.permutation(12) for _ in range(4)]).astype(np.int32)
    with pytest.raises(ValueError, match="null-gather mode"):
        E._gather_perm_diag(jnp.asarray(C), jnp.asarray(perm), "one-hot")

    # m = 300 > 256: counts reach 299, not bf16-exact -> must match gather
    # exactly anyway (via the documented fallback to f32 one-hot)
    m = 300
    Cb = rng.randint(0, 2 * m, (1, 8, m)).astype(np.int32)
    pb = np.stack([rng.permutation(m)[:8] % m for _ in range(3)]).astype(np.int32)
    # perm indexes columns per row position; shape [P, n] with n == 8 rows
    g = np.asarray(E._gather_perm_diag(jnp.asarray(Cb), jnp.asarray(pb), "gather"))
    o = np.asarray(E._gather_perm_diag(jnp.asarray(Cb), jnp.asarray(pb), "onehot-bf16"))
    np.testing.assert_array_equal(o, g.astype(np.float32))


def test_overwrite_discards_stale_checkpoint(rng, tmp_path):
    """resume=False (the driver's --overwrite semantics) starts from scratch:
    a stale checkpoint with poisoned block results is deleted, never resumed;
    resume=True resumes it, reports resumed_at_block, and rates only the new
    work in vertices_per_sec."""
    Xtr, Xte, Xim, Ytr, Yte, Yim, stim_types, adj = make_problem(rng, v=32)
    kwargs = dict(alpha=2.0, block_size=8, progress=False,
                  mesh=vertex_mesh(jax.devices()[:1]))
    fresh, aux_fresh = run_searchlight(
        Xtr, Xte, Xim, Ytr, Yte, Yim, adj, stim_types, **kwargs)
    assert "resumed_at_block" not in aux_fresh

    def fabricate_ckpt(path):
        # claims blocks 0-1 (16 vertices) done, with poisoned scores
        poisoned = [{m: np.full(8, 99.0, np.float32) for m in fresh}
                    for _ in range(2)]
        np.savez(path.removesuffix(".npz"), done_blocks=1,
                 results=np.array(poisoned, dtype=object),
                 null_results=np.array([], dtype=object))

    ckpt = str(tmp_path / "sl.ckpt.npz")
    fabricate_ckpt(ckpt)
    over, aux_over = run_searchlight(
        Xtr, Xte, Xim, Ytr, Yte, Yim, adj, stim_types,
        checkpoint_path=ckpt, resume=False, **kwargs)
    assert "resumed_at_block" not in aux_over
    for m in fresh:  # the poisoned blocks must NOT leak into the result
        np.testing.assert_allclose(over[m], fresh[m], atol=1e-6, err_msg=m)

    fabricate_ckpt(ckpt)
    res, aux_res = run_searchlight(
        Xtr, Xte, Xim, Ytr, Yte, Yim, adj, stim_types,
        checkpoint_path=ckpt, resume=True, **kwargs)
    assert aux_res["resumed_at_block"] == 2
    key = next(iter(fresh))
    np.testing.assert_array_equal(res[key][:16], np.full(16, 99.0, np.float32))
    np.testing.assert_allclose(res[key][16:], fresh[key][16:], atol=1e-6)
    # rate covers only the 16 vertices this call computed
    assert np.isclose(aux_res["vertices_per_sec"] * aux_res["elapsed_s"], 16.0)
