"""Group-level statistics: batched t-maps, composite metrics, p-values.

Replaces the reference's per-vertex Python loops
(/root/reference/analyses/decoding/searchlight/searchlight_permutation_testing.py:213-293)
with whole-map jnp reductions: a [S, V] subject-by-vertex score tensor maps to
a [V] t-map in one fused pass, and the 10k-permutation null distribution is a
[P, S] index tensor driving a single batched gather+reduce instead of joblib
jobs writing HDF5 shards.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_decoding_tpu.config import (
    METRIC_CAPTIONS_DIFF_MOD_AGNO_MOD_SPECIFIC,
    METRIC_CROSS_DECODING,
    METRIC_DIFF_MOD_AGNOSTIC_MOD_SPECIFIC,
    METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC,
    METRIC_MOD_AGNOSTIC_AND_CROSS,
)
from multimodal_decoding_tpu.ops.metrics import (
    ACC_CAPTIONS_MOD_AGNOSTIC,
    ACC_CAPTIONS_MOD_SPECIFIC_CAPTIONS,
    ACC_CAPTIONS_MOD_SPECIFIC_IMAGES,
    ACC_IMAGERY_MOD_AGNOSTIC,
    ACC_IMAGERY_WHOLE_TEST_SET_MOD_AGNOSTIC,
    ACC_IMAGES_MOD_AGNOSTIC,
    ACC_IMAGES_MOD_SPECIFIC_CAPTIONS,
    ACC_IMAGES_MOD_SPECIFIC_IMAGES,
)

# Metrics that get observed + null t-maps (reference: permutation_testing.py:40-46)
T_VAL_METRICS = [
    METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC,
    METRIC_CAPTIONS_DIFF_MOD_AGNO_MOD_SPECIFIC,
    ACC_IMAGES_MOD_SPECIFIC_IMAGES,
    ACC_CAPTIONS_MOD_SPECIFIC_CAPTIONS,
    ACC_IMAGES_MOD_AGNOSTIC,
    ACC_CAPTIONS_MOD_AGNOSTIC,
    ACC_IMAGERY_MOD_AGNOSTIC,
    ACC_IMAGERY_WHOLE_TEST_SET_MOD_AGNOSTIC,
    ACC_CAPTIONS_MOD_SPECIFIC_IMAGES,
    ACC_IMAGES_MOD_SPECIFIC_CAPTIONS,
]

# Composite metrics = nanmin over these constituents (permutation_testing.py:271-291)
COMPOSITE_METRICS = {
    METRIC_MOD_AGNOSTIC_AND_CROSS: [
        ACC_IMAGES_MOD_AGNOSTIC,
        ACC_CAPTIONS_MOD_AGNOSTIC,
        ACC_CAPTIONS_MOD_SPECIFIC_IMAGES,
        ACC_IMAGES_MOD_SPECIFIC_CAPTIONS,
    ],
    METRIC_DIFF_MOD_AGNOSTIC_MOD_SPECIFIC: [
        METRIC_CAPTIONS_DIFF_MOD_AGNO_MOD_SPECIFIC,
        METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC,
        ACC_IMAGES_MOD_AGNOSTIC,
        ACC_CAPTIONS_MOD_AGNOSTIC,
    ],
    METRIC_CROSS_DECODING: [
        ACC_IMAGES_MOD_SPECIFIC_CAPTIONS,
        ACC_CAPTIONS_MOD_SPECIFIC_IMAGES,
    ],
}


def ttest_1samp_no_p(x: jnp.ndarray, sigma: float = 0.0, method: str = "relative") -> jnp.ndarray:
    """One-sample t (no p), MNE 'hat'-adjustable variance.

    Parity with permutation_testing.py:213-242: ``mean / sqrt(var_ddof1 / n)``
    reduced over axis 0.  Trailing axes are batched (vertices).
    """
    n = x.shape[0]
    var = jnp.var(x, axis=0, ddof=1)
    if sigma > 0:
        limit = sigma * jnp.max(var) if method == "relative" else sigma
        var = var + limit
    return jnp.mean(x, axis=0) / jnp.sqrt(var / n)


def t_map(scores: jnp.ndarray, popmean: float, sigma: float = 0.0) -> jnp.ndarray:
    """[S, V] per-subject score maps -> [V] t-map.

    Vertices where all subjects have the identical value get NaN (reference
    ``calc_t_value`` guard, permutation_testing.py:245-251); NaN scores
    propagate to NaN t-values as in numpy.
    """
    t = ttest_1samp_no_p(scores - popmean, sigma=sigma)
    degenerate = jnp.all(scores == scores[0:1], axis=0)
    return jnp.where(degenerate, jnp.nan, t)


def composite_t_maps(t_values: dict) -> dict:
    """Add nanmin-composite metrics to a {metric: [V]} dict (in a copy)."""
    out = dict(t_values)
    for name, members in COMPOSITE_METRICS.items():
        stacked = jnp.stack([out[m] for m in members])
        # nanmin with all-NaN columns -> NaN (numpy emits a warning, same value)
        allnan = jnp.all(jnp.isnan(stacked), axis=0)
        mn = jnp.nanmin(jnp.where(jnp.isnan(stacked), jnp.inf, stacked), axis=0)
        out[name] = jnp.where(allnan, jnp.nan, mn)
    return out


def null_t_maps(scores: jnp.ndarray, permutations: jnp.ndarray, popmean: float) -> jnp.ndarray:
    """Null-distribution t-maps as one batched tensor op.

    ``scores``: [S, P_subj, V] per-subject per-within-subject-permutation score
    maps; ``permutations``: [P_group, S] integer matrix choosing one
    within-subject permutation per subject.  Returns [P_group, V] t-maps.
    Replaces the vertex-sharded joblib/HDF5 pipeline
    (permutation_testing.py:452-556).
    """
    scores = jnp.asarray(scores)
    permutations = jnp.asarray(permutations)

    def one_perm(perm):
        # gather: subject s uses its perm[s]-th within-subject permutation
        data = scores[jnp.arange(scores.shape[0]), perm]  # [S, V]
        return t_map(data, popmean)

    return jax.lax.map(one_perm, permutations)


def group_permutations(n_within: int, n_subjects: int, n_group: int) -> np.ndarray:
    """First ``n_group`` tuples of itertools.permutations(range(n_within), n_subjects).

    Exactly the reference's sampling scheme (permutation_testing.py:504-506):
    deterministic lexicographic enumeration, not random sampling.
    """
    it = itertools.permutations(range(n_within), n_subjects)
    out = list(itertools.islice(it, n_group))
    if len(out) < n_group:
        # the reference dies with a bare StopIteration here
        # (permutation_testing.py:504-506); same bound, clearer error
        raise ValueError(
            f"n_permutations_group_level={n_group} exceeds the "
            f"{len(out)} distinct group permutations available with "
            f"{n_within} within-subject permutations over {n_subjects} "
            "subject(s); raise n_permutations_per_subject or lower the "
            "group count"
        )
    return np.array(out, dtype=np.int32)


def p_values_from_null_max(observed: np.ndarray, null_max_sorted: np.ndarray) -> np.ndarray:
    """Per-vertex p-values via searchsorted into the sorted null max statistics.

    Parity with permutation_testing.py:328-346: only vertices with observed
    statistic > 0 get a p-value; p = 1 - rank/N with the top-rank clamp.
    """
    observed = np.asarray(observed)
    n = len(null_max_sorted)
    p = np.full(observed.shape, np.nan)
    pos = observed > 0
    idx = np.searchsorted(null_max_sorted, observed[pos])
    pv = 1.0 - idx / n
    pv[idx >= n] = 1.0 - (n - 1) / n
    p[pos] = pv
    return p


def significance_cutoff(null_max: np.ndarray, p_value_threshold: float = 0.05):
    """Quantile cutoff over per-permutation max statistics.

    Parity with cluster_analysis.py:155-178 (``method='closest_observation'``,
    exact-max shortcut when threshold == 1/N).
    """
    null_distr = np.sort(np.asarray(null_max))
    n = len(null_distr)
    if p_value_threshold == 1 / n:
        return float(np.max(null_distr)), null_distr
    cutoff = np.quantile(null_distr, 1 - p_value_threshold, method="closest_observation")
    return float(cutoff), null_distr
