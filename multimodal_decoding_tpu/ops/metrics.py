"""Pairwise cosine-ranking accuracy & friends, as fused device matmuls.

TPU-native re-design of the reference metric layer (/root/reference/eval.py):
the reference computes `scipy.spatial.distance.cdist(predictions, latents,
'cosine')` per call; here cosine distance is one row-normalisation plus one
matmul (MXU), and every metric in the family is expressed over that distance
matrix so that vmapping over a leading vertex/batch axis turns the whole
searchlight scoring pass into a handful of big batched GEMMs.

Metric names (the strings) are the reference's public API surface
(eval.py:9-79) and are preserved verbatim: downstream result pickles keyed by
these names are interchangeable with the reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_decoding_tpu.config import (
    CAPTION,
    IMAGE,
    METRIC_CAPTIONS_DIFF_MOD_AGNO_MOD_SPECIFIC,
    METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC,
)

# ---------------------------------------------------------------------------
# Metric name constants (reference: eval.py:9-79)
# ---------------------------------------------------------------------------

ACC_MODALITY_AGNOSTIC = "pairwise_acc_modality_agnostic"
ACC_CAPTIONS = "pairwise_acc_captions"
ACC_IMAGES = "pairwise_acc_images"

ACC_CROSS_IMAGES_TO_CAPTIONS = "pairwise_acc_cross_images_to_captions"
ACC_CROSS_CAPTIONS_TO_IMAGES = "pairwise_acc_cross_captions_to_images"

ACC_IMAGES_MOD_AGNOSTIC = "pairwise_acc_images_mod_agnostic"
ACC_CAPTIONS_MOD_AGNOSTIC = "pairwise_acc_captions_mod_agnostic"
ACC_IMAGERY_MOD_AGNOSTIC = "pairwise_acc_imagery_mod_agnostic"
ACC_IMAGERY_WHOLE_TEST_SET_MOD_AGNOSTIC = "pairwise_acc_imagery_whole_test_set_mod_agnostic"

ACC_IMAGERY_NO_STD_MOD_AGNOSTIC = "pairwise_acc_imagery_no_std_mod_agnostic"
ACC_IMAGERY_WHOLE_TEST_SET_NO_STD_MOD_AGNOSTIC = (
    "pairwise_acc_imagery_whole_test_set_no_std_mod_agnostic"
)

ACC_IMAGES_MOD_SPECIFIC_IMAGES = "pairwise_acc_images_mod_specific_images"
ACC_CAPTIONS_MOD_SPECIFIC_IMAGES = "pairwise_acc_captions_mod_specific_images"

ACC_CAPTIONS_MOD_SPECIFIC_CAPTIONS = "pairwise_acc_captions_mod_specific_captions"
ACC_IMAGES_MOD_SPECIFIC_CAPTIONS = "pairwise_acc_images_mod_specific_captions"

ACC_IMAGERY_MOD_SPECIFIC_CAPTIONS = "pairwise_acc_imagery_mod_specific_captions"
ACC_IMAGERY_MOD_SPECIFIC_IMAGES = "pairwise_acc_imagery_mod_specific_images"

ACC_IMAGERY_WHOLE_TEST_SET_MOD_SPECIFIC_CAPTIONS = (
    "pairwise_acc_imagery_whole_test_mod_specific_captions"
)
ACC_IMAGERY_WHOLE_TEST_SET_MOD_SPECIFIC_IMAGES = (
    "pairwise_acc_imagery_whole_test_mod_specific_images"
)

ACC_IMAGERY_NO_STD_MOD_SPECIFIC_CAPTIONS = "pairwise_acc_imagery_no_std_mod_specific_captions"
ACC_IMAGERY_NO_STD_MOD_SPECIFIC_IMAGES = "pairwise_acc_imagery_no_std_mod_specific_images"

ACC_IMAGERY_WHOLE_TEST_SET_NO_STD_MOD_SPECIFIC_CAPTIONS = (
    "pairwise_acc_imagery_whole_test_no_std_mod_specific_captions"
)
ACC_IMAGERY_WHOLE_TEST_SET_NO_STD_MOD_SPECIFIC_IMAGES = (
    "pairwise_acc_imagery_whole_test_no_std_mod_specific_images"
)

ACC_IMAGERY = "pairwise_acc_imagery"
ACC_IMAGERY_WHOLE_TEST = "pairwise_acc_imagery_whole_test_set"

CORR_ALL = "corr"
CORR_CAPTIONS = "corr_captions"
CORR_IMAGES = "corr_images"

CORR_CAPTIONS_MOD_AGNOSTIC = "corr_captions_mod_agnostic"
CORR_IMAGES_MOD_AGNOSTIC = "corr_images_mod_agnostic"
CORR_CAPTIONS_MOD_SPECIFIC_CAPTIONS = "corr_captions_mod_specific_captions"
CORR_IMAGES_MOD_SPECIFIC_CAPTIONS = "corr_images_mod_specific_captions"
CORR_IMAGES_MOD_SPECIFIC_IMAGES = "corr_images_mod_specific_images"
CORR_CAPTIONS_MOD_SPECIFIC_IMAGES = "corr_captions_mod_specific_images"

METRIC_CROSS_ENCODING = "cross_encoding"

DISTANCE_METRIC_COSINE = "cosine"

CHANCE_VALUES = {
    ACC_CAPTIONS_MOD_AGNOSTIC: 0.5,
    ACC_IMAGES_MOD_AGNOSTIC: 0.5,
    ACC_IMAGERY_MOD_AGNOSTIC: 0.5,
    ACC_IMAGERY_WHOLE_TEST_SET_MOD_AGNOSTIC: 0.5,
    ACC_IMAGES_MOD_SPECIFIC_IMAGES: 0.5,
    ACC_CAPTIONS_MOD_SPECIFIC_CAPTIONS: 0.5,
    ACC_CAPTIONS_MOD_SPECIFIC_IMAGES: 0.5,
    ACC_IMAGES_MOD_SPECIFIC_CAPTIONS: 0.5,
    METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC: 0,
    METRIC_CAPTIONS_DIFF_MOD_AGNO_MOD_SPECIFIC: 0,
    CORR_CAPTIONS_MOD_AGNOSTIC: 0,
    CORR_IMAGES_MOD_AGNOSTIC: 0,
    CORR_CAPTIONS_MOD_SPECIFIC_CAPTIONS: 0,
    CORR_IMAGES_MOD_SPECIFIC_CAPTIONS: 0,
    CORR_IMAGES_MOD_SPECIFIC_IMAGES: 0,
    CORR_CAPTIONS_MOD_SPECIFIC_IMAGES: 0,
}


# ---------------------------------------------------------------------------
# Primitives (all pure jnp; batched over arbitrary leading axes)
# ---------------------------------------------------------------------------


def standardize(x: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Column-wise standardisation with sklearn StandardScaler semantics.

    ddof=0 std; zero-variance columns are left unscaled (scale -> 1), matching
    sklearn's ``_handle_zeros_in_scale`` used by ``eval.py:118-120``.
    """
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    scale = jnp.where(std == 0.0, 1.0, std)
    return (x - mean) / scale


def fit_standardizer(x: jnp.ndarray, axis: int = -2):
    """Return (mean, scale) with sklearn semantics; apply via (v - mean)/scale."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    scale = jnp.where(std == 0.0, 1.0, std)
    return mean, scale


def cosine_distances(preds: jnp.ndarray, latents: jnp.ndarray,
                     precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Cosine distance matrix ``1 - <p, l> / (|p||l|)``.

    Equivalent to ``scipy.spatial.distance.cdist(preds, latents, 'cosine')``
    (eval.py:103-104) but expressed as a single MXU matmul after row
    normalisation.  Supports arbitrary leading batch axes on either operand
    (they broadcast).  ``precision`` defaults to HIGHEST (parity); the CV
    selection path passes a cheaper one.
    """
    p = preds / jnp.linalg.norm(preds, axis=-1, keepdims=True)
    l = latents / jnp.linalg.norm(latents, axis=-1, keepdims=True)
    sim = jnp.matmul(p, jnp.swapaxes(l, -1, -2), preferred_element_type=jnp.float32,
                     precision=precision)
    return 1.0 - sim


def euclidean_distances(preds: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix via |p|^2 - 2<p,l> + |l|^2 (one MXU matmul)."""
    p_sq = jnp.sum(preds * preds, axis=-1)[..., :, None]
    l_sq = jnp.sum(latents * latents, axis=-1)[..., None, :]
    cross = jnp.matmul(
        preds, jnp.swapaxes(latents, -1, -2), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sqrt(jnp.maximum(p_sq - 2.0 * cross + l_sq, 0.0))


def get_distance_matrix(predictions, originals, metric: str = "cosine"):
    """Metric dispatch (parity surface of eval.py:103-104)."""
    if metric == "cosine":
        return cosine_distances(jnp.asarray(predictions), jnp.asarray(originals))
    if metric == "euclidean":
        return euclidean_distances(jnp.asarray(predictions), jnp.asarray(originals))
    raise ValueError(f"unsupported distance metric: {metric}")


def pairwise_acc_from_dist(dist: jnp.ndarray) -> jnp.ndarray:
    """Fraction of off-diagonal entries beaten by the diagonal.

    Reference semantics (eval.py:107-113): ``diag < dist`` counted over the
    whole matrix, normalised by ``size - len(diag)``.  Supports non-square
    [n, m] (n <= m) matrices (imagery-vs-whole-test uses [3, 143]) and any
    leading batch axes.
    """
    n, m = dist.shape[-2], dist.shape[-1]
    k = min(n, m)
    diag = jnp.diagonal(dist, axis1=-2, axis2=-1)[..., :, None]
    corrects = jnp.sum(diag < dist, axis=(-2, -1))
    return corrects / (n * m - k)


def pairwise_acc_scale_invariant(predictions: jnp.ndarray,
                                 latents_normalized: jnp.ndarray,
                                 precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Cosine pairwise accuracy WITHOUT normalising the predictions.

    ``dist_ii < dist_ij``  <=>  ``sim_ij < sim_ii`` where sim = P Y-hat^T:
    within row i every entry shares the positive factor 1/|p_i|, so the
    comparison outcome is invariant to prediction row norms — only the
    latents need unit rows.  This removes a [.., n, D] normalise
    materialisation per call (the CV selection path calls this 30x/block;
    see docs/PERF_NOTES.md).  Counting semantics identical to
    pairwise_acc_from_dist (strict inequality; diagonal self-compare false).
    """
    sim = jnp.matmul(predictions, jnp.swapaxes(latents_normalized, -1, -2),
                     preferred_element_type=jnp.float32, precision=precision)
    return pairwise_acc_from_sim(sim)


def pairwise_acc_from_sim(sim: jnp.ndarray) -> jnp.ndarray:
    """Pairwise accuracy from a (row-scale-free) similarity matrix.

    Counting semantics of pairwise_acc_from_dist under the scale-invariant
    transform: ``dist_ii < dist_ij <=> sim_ij < sim_ii``."""
    diag = jnp.diagonal(sim, axis1=-2, axis2=-1)[..., :, None]
    n, m = sim.shape[-2], sim.shape[-1]
    counts = jnp.sum(sim < diag, axis=(-2, -1))
    return counts / (n * m - min(n, m))


def pairwise_accuracy(
    latents: jnp.ndarray,
    predictions: jnp.ndarray,
    standardize_predictions: bool = False,
    standardize_latents: bool = False,
    metric: str = "cosine",
) -> jnp.ndarray:
    """Pairwise 2-AFC accuracy (reference: eval.py:116-123)."""
    if standardize_predictions:
        predictions = standardize(predictions)
    if standardize_latents:
        latents = standardize(latents)
    return pairwise_acc_from_dist(get_distance_matrix(predictions, latents, metric))


# ---------------------------------------------------------------------------
# Score family (reference: eval.py:126-181)
# ---------------------------------------------------------------------------


def calc_imagery_pairwise_accuracy_scores(
    imagery_latents,
    imagery_predictions,
    additional_latents,
    standardize_predictions: bool = False,
    standardize_latents: bool = False,
    test_set_preds=None,
) -> dict:
    """Imagery scored against its own latents and against imagery+test latents.

    Mirrors eval.py:161-181 including the optional normalisation of imagery
    predictions with statistics from (imagery + test) predictions.
    """
    results = {}

    if test_set_preds is not None:
        all_preds = jnp.concatenate((imagery_predictions, test_set_preds), axis=-2)
        mean, scale = fit_standardizer(all_preds)
        imagery_predictions = (imagery_predictions - mean) / scale
        standardize_predictions = False

    results[ACC_IMAGERY] = pairwise_accuracy(
        imagery_latents, imagery_predictions, standardize_predictions, standardize_latents
    )

    target_latents = jnp.concatenate((imagery_latents, additional_latents), axis=-2)
    results[ACC_IMAGERY_WHOLE_TEST] = pairwise_accuracy(
        target_latents, imagery_predictions, standardize_predictions, standardize_latents
    )
    return results


def calc_all_pairwise_accuracy_scores(
    latents,
    predictions,
    stim_types=None,
    imagery_latents=None,
    imagery_predictions=None,
    standardize_predictions: bool = True,
    standardize_latents: bool = False,
    norm_imagery_preds_with_test_preds: bool = False,
    comp_cross_decoding_scores: bool = True,
) -> dict:
    """Per-modality + cross-modal + imagery score family (eval.py:126-158).

    ``stim_types`` is a host-side numpy array of strings ('caption'/'image');
    masking happens on host so the device functions keep static shapes.
    """
    stim_types = np.asarray(stim_types)
    results = {}
    for modality, acc_metric_name in zip([CAPTION, IMAGE], [ACC_CAPTIONS, ACC_IMAGES]):
        sel = stim_types == modality
        results[acc_metric_name] = pairwise_accuracy(
            latents[..., sel, :],
            predictions[..., sel, :],
            standardize_predictions,
            standardize_latents,
        )

    if comp_cross_decoding_scores:
        for mod_preds, mod_latents, acc_metric_name in zip(
            [CAPTION, IMAGE],
            [IMAGE, CAPTION],
            [ACC_CROSS_CAPTIONS_TO_IMAGES, ACC_CROSS_IMAGES_TO_CAPTIONS],
        ):
            results[acc_metric_name] = pairwise_accuracy(
                latents[..., stim_types == mod_latents, :],
                predictions[..., stim_types == mod_preds, :],
                standardize_predictions,
                standardize_latents,
            )

    if imagery_latents is not None:
        results.update(
            calc_imagery_pairwise_accuracy_scores(
                imagery_latents,
                imagery_predictions,
                latents,
                standardize_predictions,
                standardize_latents,
                test_set_preds=predictions if norm_imagery_preds_with_test_preds else None,
            )
        )
    return results


# ---------------------------------------------------------------------------
# RSA (reference: eval.py:184-223).  Host-side helper; small inputs, not hot.
# ---------------------------------------------------------------------------


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average-tie ranks per row (scipy.stats.rankdata equivalent, axis=-1)."""
    from scipy.stats import rankdata

    return rankdata(x, axis=-1)


def create_dissimilarity_matrix(sample_embeds: np.ndarray, matrix_metric: str = "spearmanr"):
    """Upper triangle of 1 - row-correlation matrix (eval.py:184-193)."""
    sample_embeds = np.asarray(sample_embeds)
    if matrix_metric == "spearmanr":
        ranks = _rankdata(sample_embeds)
        sim_mat = np.corrcoef(ranks, rowvar=True)
    elif matrix_metric == "pearsonr":
        sim_mat = np.corrcoef(sample_embeds, rowvar=True)
    else:
        raise RuntimeError("Unknown metric: " + matrix_metric)
    dissim = 1.0 - sim_mat
    iu = np.triu_indices(sample_embeds.shape[0], 1)
    return dissim[iu].reshape(-1)


def rsa_from_matrices(matrix_1, matrix_2, metric: str = "spearmanr") -> float:
    if metric == "spearmanr":
        r1 = _rankdata(np.asarray(matrix_1)[None, :])[0]
        r2 = _rankdata(np.asarray(matrix_2)[None, :])[0]
        return float(np.corrcoef(r1, r2)[0, 1])
    elif metric == "pearsonr":
        return float(np.corrcoef(matrix_1, matrix_2)[0, 1])
    raise RuntimeError("Unknown metric: " + metric)


def calc_rsa(latent_1, latent_2, metric="spearmanr", matrix_metric="spearmanr") -> float:
    m1 = create_dissimilarity_matrix(latent_1, matrix_metric)
    m2 = create_dissimilarity_matrix(latent_2, matrix_metric)
    return rsa_from_matrices(m1, m2, metric=metric)


def calc_rsa_images(latent_1, latent_2, stimulus_types, metric="spearmanr", matrix_metric="spearmanr"):
    stimulus_types = np.asarray(stimulus_types)
    assert len(latent_1) == len(latent_2) == len(stimulus_types)
    return calc_rsa(
        latent_1[stimulus_types == IMAGE], latent_2[stimulus_types == IMAGE], metric, matrix_metric
    )


def calc_rsa_captions(latent_1, latent_2, stimulus_types, metric="spearmanr", matrix_metric="spearmanr"):
    stimulus_types = np.asarray(stimulus_types)
    assert len(latent_1) == len(latent_2) == len(stimulus_types)
    return calc_rsa(
        latent_1[stimulus_types == CAPTION], latent_2[stimulus_types == CAPTION], metric, matrix_metric
    )


def get_distance_matrix_csls(predictions, latents, knn: int = 100):
    """CSLS-adjusted cosine distance matrix.

    The reference implementation (eval.py:82-100) contains an indexing quirk
    (`distances[best_distances_idx]` gathers whole rows); this is the standard
    CSLS formulation instead: hubness-corrected distance
    ``2*d(p,l) - r(p) - r(l)`` with r = mean distance to the knn nearest
    neighbours in the other set.
    """
    preds = jnp.asarray(predictions)
    lats = jnp.asarray(latents)
    d = cosine_distances(preds, lats)

    def knn_mean(dist, k):
        # mean of the k smallest distances along the last axis
        neg_topk, _ = jax.lax.top_k(-dist, k)
        return jnp.mean(-neg_topk, axis=-1)

    r_preds = knn_mean(d, min(knn, d.shape[-1]))  # [n_preds]
    r_lats = knn_mean(jnp.swapaxes(d, -1, -2), min(knn, d.shape[-2]))  # [n_lat]
    return 2.0 * d - r_preds[..., :, None] - r_lats[..., None, :]
