"""Parity tests: standardizers vs sklearn StandardScaler + NaN-column drop."""

import numpy as np
from sklearn.preprocessing import StandardScaler

from multimodal_decoding_tpu.data import preprocess as P


def test_standardize_latents_matches_sklearn(rng):
    train = rng.randn(30, 8).astype(np.float32)
    test = rng.randn(10, 8).astype(np.float32)
    imagery = rng.randn(3, 8).astype(np.float32)

    otr, ote, oim = P.standardize_latents(train, test, imagery)
    scaler = StandardScaler().fit(train)
    np.testing.assert_allclose(otr, scaler.transform(train), atol=1e-5)
    np.testing.assert_allclose(ote, scaler.transform(test), atol=1e-5)
    np.testing.assert_allclose(oim, scaler.transform(imagery), atol=1e-5)


def test_standardize_betas_drops_nan_columns(rng):
    train = rng.randn(20, 10).astype(np.float32)
    test = rng.randn(5, 10).astype(np.float32)
    train[:, [2, 7]] = np.nan  # medial wall

    otr, ote, nan_loc = P.standardize_fmri_betas(train, test, return_nan_locations=True)
    assert otr.shape == (20, 8) and ote.shape == (5, 8)
    np.testing.assert_array_equal(nan_loc, np.isnan(train[0]))

    keep = ~np.isnan(train[0])
    scaler = StandardScaler().fit(train[:, keep])
    np.testing.assert_allclose(otr, scaler.transform(train[:, keep]), atol=1e-5)
    np.testing.assert_allclose(ote, scaler.transform(test[:, keep]), atol=1e-5)


def test_standardize_betas_bitwise_matches_installed_sklearn(rng):
    """The docstring's element-wise-equality claim: f64-accumulated stats
    rounded to f32 before the in-place transform == sklearn >=1.3's
    ``X -= xp.astype(self.mean_, X.dtype)`` path, bit for bit — on data
    with large offsets where the rounding actually bites."""
    train = (rng.randn(64, 33) * 11.0 + 137.0).astype(np.float32)
    test = (rng.randn(9, 33) * 11.0 + 137.0).astype(np.float32)

    otr, ote = P.standardize_fmri_betas(train.copy(), test.copy())
    scaler = StandardScaler().fit(train)
    np.testing.assert_array_equal(scaler.mean_, train.mean(axis=0, dtype=np.float64))
    np.testing.assert_array_equal(otr, scaler.transform(train.copy()))
    np.testing.assert_array_equal(ote, scaler.transform(test.copy()))


def test_apply_mask(rng):
    betas = rng.randn(4, 10).astype(np.float32)
    mask = {"left": np.array([1, 0, 1, 0, 0]), "right": np.array([0, 1, 1, 0, 0])}
    out = P.apply_mask(mask, [betas])[0]
    np.testing.assert_array_equal(out, betas[:, [0, 2, 6, 7]])
    assert P.apply_mask(None, [betas])[0] is betas
