"""CLI layer integration: argparse surfaces drive the real pipelines."""

import os
import pickle
import sys

import numpy as np
import pytest

from multimodal_decoding_tpu import config
from multimodal_decoding_tpu.data.synthetic import make_synthetic_dataset
from multimodal_decoding_tpu.io.surface import icosphere, write_freesurfer_geometry


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

    # FreeSurfer mesh files for the searchlight CLI's --mesh-dir
    mesh_dir = tmp_path / "surfaces" / "fsaverage7"
    os.makedirs(mesh_dir)
    for fs_hemi in ("lh", "rh"):
        write_freesurfer_geometry(str(mesh_dir / f"{fs_hemi}.inflated"), mesh)
    info["mesh_dir"] = str(tmp_path / "surfaces")
    return info


def test_decode_whole_brain_cli(dataset, tmp_path, monkeypatch):
    from multimodal_decoding_tpu.cli.decode_whole_brain import main

    out_dir = str(tmp_path / "wb_out")
    monkeypatch.setattr(sys, "argv", [
        "prog", "--betas-dir", dataset["betas_dir"], "--subjects", "sub-01",
        "--models", dataset["model"], "--surface",
        "--l2-regularization-alphas", "1", "100",
        "--out-dir", out_dir,
    ])
    main()
    found = []
    for root, _, files in os.walk(out_dir):
        found += [f for f in files if f == "results.p"]
    assert found == ["results.p"]


def test_run_searchlight_cli(dataset, tmp_path, monkeypatch):
    from multimodal_decoding_tpu.cli.run_searchlight import main

    out_dir = str(tmp_path / "sl_out")
    monkeypatch.setattr(sys, "argv", [
        "prog", "--betas-dir", os.path.join(dataset["betas_dir"], "surface"),
        "--subjects", "sub-01", "--model", dataset["model"],
        "--n-neighbors", "5", "--hemis", "left",
        "--mesh-dir", dataset["mesh_dir"], "--out-dir", out_dir,
        "--block-size", "8",
    ])
    main()
    results = []
    for root, _, files in os.walk(out_dir):
        results += [os.path.join(root, f) for f in files
                    if f.startswith("alpha_") and f.endswith(".p")]
    assert len(results) == 1
    with open(results[0], "rb") as f:
        res = pickle.load(f)
    assert "score_maps" in res and "scores" in res
    assert res["adjacency"].shape[1] == 5


def test_make_roi_mask_cli(tmp_path, monkeypatch, rng):
    from multimodal_decoding_tpu.cli.make_roi_mask import main
    from multimodal_decoding_tpu.io.annot import write_annot

    names = ["unknown", "V1"]
    colors = np.array([[0, 0, 0, 0], [10, 20, 30, 0]])
    packed = colors[:, 0] + colors[:, 1] * 256 + colors[:, 2] * 65536
    for fs_hemi in ("lh", "rh"):
        labels = packed[rng.randint(0, 2, size=30)]
        write_annot(str(tmp_path / f"{fs_hemi}.annot"), labels, names, colors)

    out = str(tmp_path / "v1.p")
    monkeypatch.setattr(sys, "argv", [
        "prog", "--annot-lh", str(tmp_path / "lh.annot"),
        "--annot-rh", str(tmp_path / "rh.annot"),
        "--regions", "V1", "--out", out,
    ])
    main()
    with open(out, "rb") as f:
        mask = pickle.load(f)
    assert set(mask) == {"left", "right"}
    assert mask["left"].shape == (30,)


def test_run_study_cli(dataset, tmp_path, monkeypatch):
    """One-command study orchestration: 2 subjects x 3 modes of null
    searchlights -> group permutation stats -> TFCE p-maps."""
    from multimodal_decoding_tpu.cli.run_study import main

    # group t-maps need a second subject (df >= 1)
    make_synthetic_dataset(
        str(tmp_path), subject="sub-02", n_train=40,
        n_vertices=42, latent_dim=6, beta_seed=7,
    )
    sl_out = str(tmp_path / "study_sl")
    perm_out = str(tmp_path / "study_perm")
    monkeypatch.setattr(sys, "argv", [
        "prog", "--betas-dir", os.path.join(dataset["betas_dir"], "surface"),
        "--subjects", "sub-01", "sub-02", "--model", dataset["model"],
        "--hemis", "left", "--mesh-dir", dataset["mesh_dir"],
        "--n-neighbors", "5", "--block-size", "8",
        "--n-permutations-per-subject", "4",
        "--n-permutations-group-level", "12",  # == P(4,2): full enumeration
        "--p-value-threshold", "0.2",
        "--searchlight-out-dir", sl_out, "--permutation-out-dir", perm_out,
    ])
    main()
    # all three training modes' searchlight artifacts exist
    modes = {d for d in os.listdir(sl_out) if not d.startswith(".")}
    assert modes == {"agnostic", "captions", "images"}
    # permutation stage published p-values
    found = []
    for root, _, files in os.walk(perm_out):
        found += [os.path.join(root, f) for f in files
                  if f.startswith("p_values") and f.endswith(".p")]
    assert len(found) == 1
    with open(found[0], "rb") as f:
        p_vals = pickle.load(f)
    assert p_vals["left"].shape == (42,)


def test_run_study_cli_alpha_cv(dataset, tmp_path, monkeypatch):
    """--l2-regularization-alpha cv realises per-vertex alpha-CV in the
    searchlight stage (SearchlightConfig.alphas_cv over DEFAULT_ALPHAS) and
    the permutation stage finds the artifacts under the alpha_cv key."""
    from multimodal_decoding_tpu.cli.run_study import main

    make_synthetic_dataset(
        str(tmp_path), subject="sub-02", n_train=40,
        n_vertices=42, latent_dim=6, beta_seed=7,
    )
    sl_out = str(tmp_path / "study_sl_cv")
    perm_out = str(tmp_path / "study_perm_cv")
    monkeypatch.setattr(sys, "argv", [
        "prog", "--betas-dir", os.path.join(dataset["betas_dir"], "surface"),
        "--subjects", "sub-01", "sub-02", "--model", dataset["model"],
        "--hemis", "left", "--mesh-dir", dataset["mesh_dir"],
        "--n-neighbors", "5", "--block-size", "8",
        "--l2-regularization-alpha", "cv",
        "--n-permutations-per-subject", "3",
        "--n-permutations-group-level", "6",  # <= P(3,2) = 6
        "--p-value-threshold", "0.2",
        "--searchlight-out-dir", sl_out, "--permutation-out-dir", perm_out,
    ])
    main()
    # the searchlight artifacts live under the alpha_cv path key
    cv_artifacts = []
    for root, _, files in os.walk(sl_out):
        cv_artifacts += [os.path.join(root, f) for f in files
                         if f == "alpha_cv.p"]
    assert len(cv_artifacts) == 6  # 3 training modes x 2 subjects
    with open(cv_artifacts[0], "rb") as f:
        res = pickle.load(f)
    # per-vertex CV ran: selected alphas recorded, drawn from DEFAULT_ALPHAS
    assert set(np.unique(res["best_alpha"])) <= set(config.DEFAULT_ALPHAS)
    found = []
    for root, _, files in os.walk(perm_out):
        found += [os.path.join(root, f) for f in files
                  if f.startswith("p_values") and f.endswith(".p")]
    assert len(found) == 1
