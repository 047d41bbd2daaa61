"""Parity tests: metrics vs scipy/sklearn reference semantics.

The reference implementations here are written from the documented semantics
of /root/reference/eval.py using scipy/sklearn directly (SURVEY.md §4).
"""

import numpy as np
import pytest
from scipy.spatial.distance import cdist
from sklearn.preprocessing import StandardScaler

from multimodal_decoding_tpu.ops import metrics as M


def ref_pairwise_acc(latents, predictions, standardize_predictions=False, standardize_latents=False):
    if standardize_predictions:
        predictions = StandardScaler().fit_transform(predictions)
    if standardize_latents:
        latents = StandardScaler().fit_transform(latents)
    dist = cdist(predictions, latents, metric="cosine")
    diag = dist.diagonal().reshape(-1, 1)
    return (diag < dist).sum() / (dist.size - diag.size)


def test_pairwise_accuracy_identity():
    # perfect predictions -> accuracy 1.0
    x = np.random.RandomState(0).randn(10, 8).astype(np.float32)
    acc = float(M.pairwise_accuracy(x, x))
    # diag == dist on the diagonal, strictly smaller everywhere else (generic data)
    assert acc == 1.0


def test_pairwise_accuracy_small_exact():
    # hand-checkable 2x2 case: orthogonal unit vectors
    latents = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    preds = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    assert float(M.pairwise_accuracy(latents, preds)) == 1.0
    # swapped predictions -> 0
    preds_swapped = preds[::-1]
    assert float(M.pairwise_accuracy(latents, preds_swapped)) == 0.0


@pytest.mark.parametrize("std_preds,std_lats", [(False, False), (True, False), (True, True)])
def test_pairwise_accuracy_matches_scipy(rng, std_preds, std_lats):
    latents = rng.randn(70, 32).astype(np.float32)
    preds = latents + 0.8 * rng.randn(70, 32).astype(np.float32)
    ours = float(M.pairwise_accuracy(latents, preds, std_preds, std_lats))
    ref = ref_pairwise_acc(latents, preds, std_preds, std_lats)
    assert abs(ours - ref) < 1e-4


def test_pairwise_accuracy_nonsquare(rng):
    # imagery-vs-whole-test shape: [3, 143]
    latents = rng.randn(143, 16).astype(np.float32)
    preds = latents[:3] + 0.5 * rng.randn(3, 16).astype(np.float32)
    ours = float(M.pairwise_accuracy(latents, preds))
    ref = ref_pairwise_acc(latents, preds)
    assert abs(ours - ref) < 1e-4


def test_standardize_matches_sklearn(rng):
    x = rng.randn(50, 7).astype(np.float32)
    x[:, 3] = 2.5  # constant column
    ours = np.asarray(M.standardize(x))
    ref = StandardScaler().fit_transform(x)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_calc_all_scores_matches_reference_semantics(rng):
    n, d = 140, 24
    stim_types = np.array(["caption"] * 70 + ["image"] * 70)
    latents = rng.randn(n, d).astype(np.float32)
    preds = latents + rng.randn(n, d).astype(np.float32)
    imagery_latents = rng.randn(3, d).astype(np.float32)
    imagery_preds = imagery_latents + 0.5 * rng.randn(3, d).astype(np.float32)

    scores = M.calc_all_pairwise_accuracy_scores(
        latents, preds, stim_types, imagery_latents, imagery_preds, standardize_predictions=True
    )

    # reference semantics computed with scipy/sklearn
    for mod, key in [("caption", M.ACC_CAPTIONS), ("image", M.ACC_IMAGES)]:
        sel = stim_types == mod
        ref = ref_pairwise_acc(latents[sel], preds[sel], standardize_predictions=True)
        assert abs(float(scores[key]) - ref) < 1e-4

    # cross-decoding: caption preds vs image latents
    ref_cross = ref_pairwise_acc(
        latents[stim_types == "image"], preds[stim_types == "caption"], standardize_predictions=True
    )
    assert abs(float(scores[M.ACC_CROSS_CAPTIONS_TO_IMAGES]) - ref_cross) < 1e-4

    # imagery
    ref_imagery = ref_pairwise_acc(imagery_latents, imagery_preds, standardize_predictions=True)
    assert abs(float(scores[M.ACC_IMAGERY]) - ref_imagery) < 1e-4
    ref_whole = ref_pairwise_acc(
        np.concatenate((imagery_latents, latents)), imagery_preds, standardize_predictions=True
    )
    assert abs(float(scores[M.ACC_IMAGERY_WHOLE_TEST]) - ref_whole) < 1e-4


def test_imagery_norm_with_test_preds(rng):
    d = 16
    latents = rng.randn(140, d).astype(np.float32)
    preds = rng.randn(140, d).astype(np.float32)
    imagery_latents = rng.randn(3, d).astype(np.float32)
    imagery_preds = rng.randn(3, d).astype(np.float32)

    scores = M.calc_imagery_pairwise_accuracy_scores(
        imagery_latents, imagery_preds, latents, test_set_preds=preds
    )
    # reference: scaler fit on concat(imagery, test) preds, applied to imagery preds only
    scaler = StandardScaler().fit(np.concatenate((imagery_preds, preds)))
    imagery_tf = scaler.transform(imagery_preds)
    ref = ref_pairwise_acc(imagery_latents, imagery_tf)
    assert abs(float(scores[M.ACC_IMAGERY]) - ref) < 1e-4


def test_rsa_matches_scipy(rng):
    from scipy.stats import spearmanr

    a = rng.randn(12, 20)
    b = a + 0.3 * rng.randn(12, 20)

    # reference dissimilarity construction
    sim = spearmanr(a, axis=1)[0]
    dissim = (np.ones_like(sim) - sim)[np.triu_indices(12, 1)]
    ours = M.create_dissimilarity_matrix(a, "spearmanr")
    np.testing.assert_allclose(ours, dissim, atol=1e-10)

    ref_corr = spearmanr([dissim, (np.ones((12, 12)) - spearmanr(b, axis=1)[0])[np.triu_indices(12, 1)]], axis=1)[0]
    ours_corr = M.calc_rsa(a, b)
    assert abs(ours_corr - ref_corr) < 1e-10


def test_batched_pairwise_accuracy(rng):
    """Leading batch axes (the searchlight vertex axis) broadcast correctly."""
    latents = rng.randn(20, 8).astype(np.float32)
    preds = rng.randn(5, 20, 8).astype(np.float32)  # 5 "vertices"
    batched = np.asarray(M.pairwise_accuracy(latents, preds))
    for v in range(5):
        single = float(M.pairwise_accuracy(latents, preds[v]))
        assert abs(batched[v] - single) < 1e-6


def test_euclidean_metric_matches_scipy(rng):
    latents = rng.randn(20, 8).astype(np.float32)
    preds = rng.randn(20, 8).astype(np.float32)
    ours = np.asarray(M.get_distance_matrix(preds, latents, metric="euclidean"))
    ref = cdist(preds, latents, metric="euclidean")
    np.testing.assert_allclose(ours, ref, atol=1e-4)

    acc_ours = float(M.pairwise_accuracy(latents, preds, metric="euclidean"))
    diag = ref.diagonal().reshape(-1, 1)
    acc_ref = (diag < ref).sum() / (ref.size - diag.size)
    assert abs(acc_ours - acc_ref) < 1e-6


def test_pairwise_acc_scale_invariant_matches_dist_path(rng):
    """Scale-invariant scorer == distance-matrix scorer, including under
    arbitrary positive rescaling of prediction rows."""
    from multimodal_decoding_tpu.ops.metrics import (
        cosine_distances,
        pairwise_acc_from_dist,
        pairwise_acc_scale_invariant,
    )

    preds = rng.randn(4, 23, 9).astype(np.float32)
    latents = rng.randn(23, 9).astype(np.float32)
    lat_n = latents / np.linalg.norm(latents, axis=-1, keepdims=True)

    ref = np.asarray(pairwise_acc_from_dist(cosine_distances(preds, latents)))
    got = np.asarray(pairwise_acc_scale_invariant(preds, lat_n))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # positive per-row rescaling of predictions must not change anything
    scales = rng.rand(4, 23, 1).astype(np.float32) * 10 + 0.1
    got2 = np.asarray(pairwise_acc_scale_invariant(preds * scales, lat_n))
    np.testing.assert_allclose(got2, ref, atol=1e-6)
