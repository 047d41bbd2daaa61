"""Streaming ingestion (parallel/ingest.py): element-wise parity with the
eager load -> standardize -> concatenate path, in O(chunk) host memory."""

import os

import numpy as np
import pytest

from multimodal_decoding_tpu import config
from multimodal_decoding_tpu.data.synthetic import make_synthetic_dataset
from multimodal_decoding_tpu.io.surface import icosphere
from multimodal_decoding_tpu.parallel.ingest import (
    NpzMemberReader,
    streamed_scaler_fit,
    streamed_x_all_device,
)


def _save_cache(path, arr):
    np.savez(str(path), betas=arr, stim_ids=np.arange(len(arr)),
             stim_types=np.zeros(len(arr), np.int64))
    return str(path)


def test_npz_member_reader_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(23, 17)).astype(np.float32)
    path = _save_cache(tmp_path / "c.npz", arr)
    r = NpzMemberReader(path)
    assert r.shape == (23, 17) and r.dtype == np.float32
    # chunk iteration reuses one buffer; copy each view before advancing
    got = np.concatenate([v.copy() for _, v in r.iter_row_chunks(5)])
    assert np.array_equal(got, arr)
    starts = [r0 for r0, _ in r.iter_row_chunks(5)]
    assert starts == [0, 5, 10, 15, 20]
    assert np.array_equal(r.read_row(7), arr[7])
    assert np.array_equal(r.read_row(0), arr[0])

    comp = str(tmp_path / "z.npz")
    np.savez_compressed(comp, betas=arr)
    with pytest.raises(ValueError, match="compressed"):
        NpzMemberReader(comp)


def test_streamed_scaler_bitwise_vs_eager(tmp_path, rng):
    arr = (rng.normal(size=(64, 33)) * rng.uniform(0.1, 10.0, 33)).astype(np.float32)
    arr[:, 5] = 3.25        # zero-std column -> scale 1.0 (sklearn semantics)
    arr[:, 2] = np.nan      # NaN columns are dropped before fitting
    arr[:, 9] = np.nan
    keep = ~np.isnan(arr[0])

    train = np.ascontiguousarray(arr[:, keep], dtype=np.float32)
    mean64 = train.mean(axis=0, dtype=np.float64)
    std64 = np.sqrt(np.var(train, axis=0, dtype=np.float64))
    scale64 = np.where(std64 == 0.0, 1.0, std64)

    r = NpzMemberReader(_save_cache(tmp_path / "t.npz", arr))
    mean32, scale32 = streamed_scaler_fit(r, keep, chunk_rows=7)
    # row-sequential f64 accumulation reproduces numpy's strided axis-0
    # reduction exactly -> bitwise equality after the f32 rounding
    assert np.array_equal(mean32, mean64.astype(np.float32))
    assert np.array_equal(scale32, scale64.astype(np.float32))
    assert scale32[4] == 1.0  # original col 5 (cols 2 dropped before it)


def test_streamed_x_all_matches_eager(tmp_path, rng):
    from multimodal_decoding_tpu.data.preprocess import standardize_fmri_betas
    from multimodal_decoding_tpu.parallel.mesh import vertex_mesh

    V = 33
    train = (rng.normal(size=(40, V)) * rng.uniform(0.1, 10.0, V)).astype(np.float32)
    test = rng.normal(size=(6, V)).astype(np.float32)
    imag = rng.normal(size=(3, V)).astype(np.float32)
    for a in (train, test, imag):
        a[:, 2] = np.nan
    train[:, 5] = -1.5  # zero-std

    tr_e, te_e, im_e = standardize_fmri_betas(train.copy(), test.copy(), imag.copy())
    eager = np.concatenate([tr_e, te_e, im_e]).astype(np.float32)

    readers = [
        NpzMemberReader(_save_cache(tmp_path / f"{n}.npz", a))
        for n, a in (("train", train), ("test", test), ("imag", imag))
    ]
    keep = ~np.isnan(readers[0].read_row(0))
    mean32, scale32 = streamed_scaler_fit(readers[0], keep, chunk_rows=7)
    mesh = vertex_mesh()
    X_d = streamed_x_all_device(readers, keep, mean32, scale32, mesh, chunk_rows=7)
    assert X_d.shape == eager.shape
    assert np.array_equal(np.asarray(X_d), eager)


@pytest.fixture()
def dataset(tmp_path, monkeypatch):
    mesh = icosphere(subdivisions=1, radius=50.0)
    info = make_synthetic_dataset(
        str(tmp_path), n_train=40, n_vertices=mesh.n_vertices, latent_dim=6
    )
    monkeypatch.setattr(config, "FMRI_STIM_INFO_DIR", info["stim_info_dir"])
    monkeypatch.setattr(config, "LATENT_FEATURES_DIR", info["features_dir"])
    monkeypatch.setattr(config, "BETAS_CACHE_DIR", str(tmp_path / "cache"))
    from multimodal_decoding_tpu.data.features import _load_feature_pickle

    _load_feature_pickle.cache_clear()
    info["mesh_coords"] = {"left": mesh.coordinates}
    return info


def test_run_stream_ingest_matches_eager(dataset, tmp_path):
    """Full run(): stream_ingest='on' reproduces the eager score maps."""
    import pickle

    from multimodal_decoding_tpu.decoding.searchlight import SearchlightConfig, run

    common = dict(
        betas_dir=os.path.join(dataset["betas_dir"], "surface"),
        mesh_coords=dataset["mesh_coords"],
        model=dataset["model"],
        subjects=[dataset["subject"]],
        hemis=["left"],
        n_neighbors=5,
        block_size=8,
        progress=False,
    )
    # eager run also builds the npz betas cache the streaming path reads
    (eager_path,) = run(SearchlightConfig(
        out_dir=str(tmp_path / "sl_eager"), stream_ingest="off", **common))
    (stream_path,) = run(SearchlightConfig(
        out_dir=str(tmp_path / "sl_stream"), stream_ingest="on", **common))

    with open(eager_path, "rb") as f:
        eager = pickle.load(f)
    with open(stream_path, "rb") as f:
        stream = pickle.load(f)
    assert set(eager["score_maps"]) == set(stream["score_maps"])
    for m, vals in eager["score_maps"].items():
        assert np.array_equal(vals, stream["score_maps"][m]), m
    assert np.array_equal(eager["nan_locations"], stream["nan_locations"])


def test_stream_ingest_on_requires_cache(dataset, tmp_path, monkeypatch):
    from multimodal_decoding_tpu.decoding.searchlight import SearchlightConfig, run

    monkeypatch.setattr(config, "BETAS_CACHE_DIR", str(tmp_path / "empty_cache"))
    cfg = SearchlightConfig(
        betas_dir=os.path.join(dataset["betas_dir"], "surface"),
        mesh_coords=dataset["mesh_coords"],
        model=dataset["model"],
        subjects=[dataset["subject"]],
        hemis=["left"],
        n_neighbors=5,
        out_dir=str(tmp_path / "sl"),
        stream_ingest="on",
        progress=False,
    )
    with pytest.raises(FileNotFoundError, match="betas npz cache"):
        run(cfg)
