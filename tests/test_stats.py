"""Parity tests: t-maps & permutation machinery vs scipy/reference semantics."""

import numpy as np
from scipy import stats as sps

from multimodal_decoding_tpu.data.stimuli import (
    NUM_TEST_STIMULI,
    create_null_distr_shuffled_indices,
    create_shuffled_indices,
)
from multimodal_decoding_tpu.ops import stats as S


def test_ttest_matches_scipy(rng):
    x = rng.randn(6, 50)
    ours = np.asarray(S.ttest_1samp_no_p(x))
    ref = sps.ttest_1samp(x, 0.0, axis=0).statistic
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_t_map_degenerate_nan(rng):
    x = rng.randn(6, 10).astype(np.float32)
    x[:, 3] = 0.7  # all subjects identical -> NaN (reference calc_t_value guard)
    t = np.asarray(S.t_map(x, popmean=0.5))
    assert np.isnan(t[3])
    ref = sps.ttest_1samp(x[:, 0] - 0.5, 0.0).statistic
    assert abs(t[0] - ref) < 1e-5


def test_composite_min_metrics(rng):
    V = 20
    t_values = {m: np.float32(rng.randn(V)) for m in S.T_VAL_METRICS}
    t_values[S.T_VAL_METRICS[0]][2] = np.nan
    out = S.composite_t_maps({k: np.asarray(v) for k, v in t_values.items()})
    for name, members in S.COMPOSITE_METRICS.items():
        ref = np.nanmin(np.stack([t_values[m] for m in members]), axis=0)
        np.testing.assert_allclose(np.asarray(out[name]), ref, atol=1e-6, equal_nan=True)


def test_null_t_maps_batched(rng):
    S_subj, P_within, V = 4, 5, 12
    scores = rng.rand(S_subj, P_within, V).astype(np.float32)
    perms = S.group_permutations(P_within, S_subj, n_group=10)
    out = np.asarray(S.null_t_maps(scores, perms, popmean=0.5))
    assert out.shape == (10, V)
    # spot-check one permutation against scipy
    p = perms[3]
    data = np.stack([scores[s, p[s]] for s in range(S_subj)])
    ref = sps.ttest_1samp(data - 0.5, 0.0, axis=0).statistic
    np.testing.assert_allclose(out[3], ref, atol=1e-5)


def test_group_permutations_lexicographic():
    perms = S.group_permutations(5, 3, 4)
    # itertools.permutations order
    assert perms.tolist() == [[0, 1, 2], [0, 1, 3], [0, 1, 4], [0, 2, 1]]


def test_shuffled_indices_are_derangements_and_deterministic():
    idx_list = create_null_distr_shuffled_indices(5)
    assert len(idx_list) == 5
    for idx in idx_list:
        assert not np.any(idx == np.arange(NUM_TEST_STIMULI))
        # within-modality: first 70 stay in [0,70), last 70 in [70,140)
        assert idx[:70].max() < 70 and idx[70:].min() >= 70
        assert len(np.unique(idx)) == NUM_TEST_STIMULI
    # deterministic: same seeds -> same output
    again = create_null_distr_shuffled_indices(5)
    for a, b in zip(idx_list, again):
        np.testing.assert_array_equal(a, b)


def test_shuffled_indices_match_reference_rng():
    """Bit-parity with the reference's numpy legacy seeding (data.py:554-561)."""
    np.random.seed(0)
    m1 = np.random.choice(range(70), size=70, replace=False)
    m2 = np.random.choice(range(70, 140), size=70, replace=False)
    ref = np.concatenate((m1, m2))
    np.testing.assert_array_equal(create_shuffled_indices(0), ref)


def test_p_values_from_null_max():
    null_max = np.sort(np.arange(100).astype(float))
    observed = np.array([-1.0, 0.0, 50.5, 1000.0, np.nan])
    p = S.p_values_from_null_max(observed, null_max)
    assert np.isnan(p[0]) and np.isnan(p[1])  # only >0 gets a p-value
    assert abs(p[2] - (1 - 51 / 100)) < 1e-12
    assert abs(p[3] - (1 - 99 / 100)) < 1e-12
    assert np.isnan(p[4])


def test_significance_cutoff_closest_observation():
    null_max = np.arange(1, 101).astype(float)
    cutoff, distr = S.significance_cutoff(null_max, 0.05)
    ref = np.quantile(np.sort(null_max), 0.95, method="closest_observation")
    assert cutoff == ref
    # exact-max shortcut when threshold == 1/N
    cutoff_max, _ = S.significance_cutoff(null_max, 1 / 100)
    assert cutoff_max == 100.0
