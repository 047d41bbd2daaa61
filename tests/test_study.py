"""Full-study orchestrator: one config -> searchlights + group stats."""

import os

import numpy as np
import pytest

from multimodal_decoding_tpu import config
from multimodal_decoding_tpu.data.synthetic import make_synthetic_dataset
from multimodal_decoding_tpu.decoding.study import StudyConfig, run_study
from multimodal_decoding_tpu.io.surface import icosphere

SUBJECTS = ["sub-01", "sub-02", "sub-03", "sub-04"]


def test_run_study_end_to_end(tmp_path, monkeypatch):
    mesh = icosphere(subdivisions=1, radius=50.0)
    for i, subj in enumerate(SUBJECTS):
        make_synthetic_dataset(
            str(tmp_path), subject=subj, n_train=40, n_vertices=mesh.n_vertices,
            latent_dim=6, beta_seed=10 + i, n_nan_vertices=2,
        )
    monkeypatch.setattr(config, "FMRI_STIM_INFO_DIR", str(tmp_path / "stim_info"))
    monkeypatch.setattr(config, "LATENT_FEATURES_DIR", str(tmp_path / "nn_features"))
    monkeypatch.setattr(config, "BETAS_CACHE_DIR", str(tmp_path / "cache"))
    from multimodal_decoding_tpu.data.features import _load_feature_pickle

    _load_feature_pickle.cache_clear()

    cfg = StudyConfig(
        betas_dir=os.path.join(str(tmp_path), "betas", "surface"),
        meshes={"left": mesh, "right": mesh},
        model="clip",
        subjects=SUBJECTS,
        n_neighbors=6,
        n_permutations_per_subject=6,
        n_permutations_group_level=24,
        p_value_threshold=0.1,
        searchlight_out_dir=str(tmp_path / "sl"),
        permutation_out_dir=str(tmp_path / "perm"),
        block_size=8,
        progress=False,
    )
    stats = run_study(cfg)

    # 3 training modes x 4 subjects x 2 hemis searchlight runs
    assert len(stats["searchlight_outputs"]) == 3 * len(SUBJECTS) * 2
    for hemi in ("left", "right"):
        assert stats["p_values"][hemi].shape == (mesh.n_vertices,)
        assert stats["masks"][hemi].dtype == np.uint8
    # strong planted signal -> significant vertices
    assert sum(stats["masks"][h].sum() for h in ("left", "right")) > 0

    # re-run is fully idempotent (every stage cached)
    stats2 = run_study(cfg)
    assert stats2["searchlight_outputs"] == []
    np.testing.assert_array_equal(stats2["masks"]["left"], stats["masks"]["left"])
