"""Artifact containers: reference-layout converters, null npz, padding utils."""

import numpy as np

from multimodal_decoding_tpu.io import artifacts as A
from multimodal_decoding_tpu.parallel.mesh import pad_to_multiple


def test_scores_list_roundtrip(rng):
    scores = {"a": rng.rand(7).astype(np.float32), "b": rng.rand(7).astype(np.float32)}
    as_list = A.scores_to_list(scores)
    assert len(as_list) == 7 and as_list[3]["a"] == scores["a"][3]
    back = A.list_to_scores(as_list)
    for k in scores:
        np.testing.assert_allclose(back[k], scores[k], atol=1e-7)


def test_null_scores_npz_roundtrip(tmp_path, rng):
    null = {"m1": rng.rand(10, 4), "m2": rng.rand(10, 4)}
    path = str(tmp_path / "null.npz")
    A.save_null_scores_npz(path, null)
    back = A.load_null_scores_npz(path)
    assert set(back) == {"m1", "m2"}
    np.testing.assert_allclose(back["m1"], null["m1"].astype(np.float32), atol=1e-7)


def test_pad_to_multiple(rng):
    arr = rng.randint(0, 9, size=(10, 3)).astype(np.int32)
    padded, n = pad_to_multiple(arr, 4)
    assert n == 10 and padded.shape == (12, 3)
    np.testing.assert_array_equal(padded[10], arr[0])  # repeats first row
    same, n2 = pad_to_multiple(arr, 5)
    assert n2 == 10 and same.shape == (10, 3)
    filled, _ = pad_to_multiple(arr, 4, fill=0)
    assert np.all(filled[10:] == 0)
