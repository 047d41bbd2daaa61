"""End-to-end: synthetic betas-in -> results-pickle-out, vs a full sklearn run.

Exercises config, data contracts (gifti/nifti IO, glob ordering, stim-info
pickles), standardizers, CV ridge, metrics and the artifact schema — the
reference's whole pipeline semantics (SURVEY.md §4 point 4).
"""

import os
import pickle

import numpy as np
import pytest

from multimodal_decoding_tpu import config
from multimodal_decoding_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture()
def dataset(tmp_path, monkeypatch):
    info = make_synthetic_dataset(
        str(tmp_path), n_train=50, n_vertices=30, latent_dim=8, surface=True
    )
    monkeypatch.setattr(config, "FMRI_STIM_INFO_DIR", info["stim_info_dir"])
    monkeypatch.setattr(config, "LATENT_FEATURES_DIR", info["features_dir"])
    monkeypatch.setattr(config, "BETAS_CACHE_DIR", str(tmp_path / "cache"))
    # fresh feature cache (paths differ per test, but be safe)
    from multimodal_decoding_tpu.data.features import _load_feature_pickle

    _load_feature_pickle.cache_clear()
    return info


def _sklearn_reference(train_b, test_b, imag_b, train_l, test_l, imag_l, alphas):
    """The reference compute path: GridSearchCV(Ridge) + pairwise accuracy."""
    from scipy.spatial.distance import cdist
    from sklearn.linear_model import Ridge
    from sklearn.metrics import make_scorer
    from sklearn.model_selection import GridSearchCV

    def acc(y_true, y_pred):
        dist = cdist(y_pred, y_true, metric="cosine")
        diag = dist.diagonal().reshape(-1, 1)
        return (diag < dist).sum() / (dist.size - diag.size)

    clf = GridSearchCV(
        Ridge(fit_intercept=False),
        dict(alpha=list(alphas)),
        scoring=make_scorer(acc, greater_is_better=True),
        cv=5,
        refit=True,
    )
    clf.fit(train_b.astype(np.float32), train_l.astype(np.float32))
    return (
        clf.best_params_["alpha"],
        clf.best_estimator_.predict(test_b),
        clf.best_estimator_.predict(imag_b),
    )


def test_whole_brain_pipeline_matches_sklearn(dataset, tmp_path):
    from multimodal_decoding_tpu.data.betas import get_fmri_data
    from multimodal_decoding_tpu.data.features import get_latent_features
    from multimodal_decoding_tpu.data.preprocess import (
        standardize_fmri_betas,
        standardize_latents,
    )
    from multimodal_decoding_tpu.decoding.whole_brain import WholeBrainConfig, run
    from multimodal_decoding_tpu.config import LatentFeatsConfig
    from multimodal_decoding_tpu.ops import metrics as M

    out_dir = str(tmp_path / "out")
    alphas = (1e0, 1e2, 1e4)
    cfg = WholeBrainConfig(
        betas_dir=dataset["betas_dir"],
        subjects=[dataset["subject"]],
        models=[dataset["model"]],
        alphas=alphas,
        surface=True,
        out_dir=out_dir,
    )
    results = run(cfg)
    assert len(results) == 1
    res = results[0]

    # schema parity with ridge_regression_decoding.py:137-157
    for key in [
        "alpha", "model", "subject", "features", "training_mode", "num_voxels",
        "stimulus_ids", "stimulus_types", "predictions", "imagery_predictions",
        "latents", "imagery_latents",
    ]:
        assert key in res, key

    # results file written at the contract path & skip-if-exists works
    files = []
    for root, _, fnames in os.walk(out_dir):
        files += [os.path.join(root, f) for f in fnames if f == "results.p"]
    assert len(files) == 1
    again = run(cfg)
    assert again == []  # skipped

    # reference (sklearn) run on the same data
    train_b, _, _ = get_fmri_data(dataset["betas_dir"], dataset["subject"], "train", surface=True)
    test_b, _, test_types = get_fmri_data(
        dataset["betas_dir"], dataset["subject"], "test", surface=True
    )
    imag_b, _, _ = get_fmri_data(dataset["betas_dir"], dataset["subject"], "imagery", surface=True)
    train_b, test_b, imag_b = standardize_fmri_betas(train_b, test_b, imag_b)
    fc = LatentFeatsConfig(dataset["model"], verbose=False)
    train_l = get_latent_features(fc, dataset["subject"], "train")
    test_l = get_latent_features(fc, dataset["subject"], "test")
    imag_l = get_latent_features(fc, dataset["subject"], "imagery")
    train_l, test_l, imag_l = standardize_latents(train_l, test_l, imag_l)

    ref_alpha, ref_test_preds, ref_imag_preds = _sklearn_reference(
        train_b, test_b, imag_b, train_l, test_l, imag_l, alphas
    )
    assert res["alpha"] == ref_alpha

    ref_scores = M.calc_all_pairwise_accuracy_scores(
        test_l, ref_test_preds.astype(np.float32), test_types, imag_l,
        ref_imag_preds.astype(np.float32), standardize_predictions=True,
    )
    # BASELINE tolerance: pairwise accuracy within 1e-4 of the sklearn path
    for key in [M.ACC_CAPTIONS, M.ACC_IMAGES, M.ACC_IMAGERY, M.ACC_IMAGERY_WHOLE_TEST]:
        assert abs(res[key] - float(ref_scores[key])) < 1e-4, key

    # planted signal is actually decoded (sanity, not parity)
    assert res[M.ACC_CAPTIONS] > 0.8 and res[M.ACC_IMAGES] > 0.8

    # stored predictions allow offline metric recomputation (checkpoint contract)
    with open(files[0], "rb") as f:
        stored = pickle.load(f)
    re_scores = M.calc_all_pairwise_accuracy_scores(
        stored["latents"], stored["predictions"], stored["stimulus_types"],
        stored["imagery_latents"], stored["imagery_predictions"],
        standardize_predictions=True,
    )
    assert abs(float(re_scores[M.ACC_CAPTIONS]) - res[M.ACC_CAPTIONS]) < 1e-6


def test_data_layer_ordering_contract(dataset):
    """Test split globs image betas before caption betas (data.py:360-362)."""
    from multimodal_decoding_tpu.data.betas import get_fmri_data_paths

    paths, ids, types = get_fmri_data_paths(
        os.path.join(dataset["betas_dir"], "surface"),
        dataset["subject"],
        "test",
        hemi="left",
        file_suffix=".gii",
    )
    n = len(dataset["test_ids"])
    assert list(types[:n]) == ["image"] * n
    assert list(types[n:]) == ["caption"] * n
    # ascending id order within each modality (zero-padded names sort numerically)
    assert list(ids[:n]) == sorted(ids[:n])


def test_imagery_id_resolution(dataset):
    """Imagery beta index -> scene COCO id via IMAGERY_SCENES (data.py:369-371)."""
    from multimodal_decoding_tpu.data.betas import get_fmri_data_paths
    from multimodal_decoding_tpu.data.stimuli import IMAGERY_STIMS_IDS

    _, ids, types = get_fmri_data_paths(
        os.path.join(dataset["betas_dir"], "surface"),
        dataset["subject"],
        "imagery",
        hemi="left",
        file_suffix=".gii",
    )
    assert list(ids) == IMAGERY_STIMS_IDS[dataset["subject"]]
    assert all(t == "imagery" for t in types)


def test_nifti_voxel_path(tmp_path, monkeypatch):
    info = make_synthetic_dataset(
        str(tmp_path), n_train=20, n_vertices=12, latent_dim=6,
        surface=False, n_nan_vertices=0,
    )
    monkeypatch.setattr(config, "FMRI_STIM_INFO_DIR", info["stim_info_dir"])
    monkeypatch.setattr(config, "BETAS_CACHE_DIR", str(tmp_path / "cache"))
    from multimodal_decoding_tpu.data.betas import get_fmri_data

    betas, ids, types = get_fmri_data(info["betas_dir"], info["subject"], "train")
    assert betas.shape == (20, 12)
    assert betas.dtype == np.float32


def test_multi_model_sweep_shares_gram_cache(dataset, tmp_path, monkeypatch):
    """The model-independent kernels are computed once per (subject, mask)."""
    import shutil

    from multimodal_decoding_tpu.decoding import whole_brain as WB

    # second latent model = copy of the first under a new registry name
    src = os.path.join(dataset["features_dir"], f"{dataset['model']}.p")
    shutil.copy(src, os.path.join(dataset["features_dir"], "siglip.p"))

    calls = []
    orig_init = WB.GramCache.__init__

    def counting_init(self, *a, **k):
        calls.append(1)
        orig_init(self, *a, **k)

    monkeypatch.setattr(WB.GramCache, "__init__", counting_init)

    cfg = WB.WholeBrainConfig(
        betas_dir=dataset["betas_dir"], subjects=[dataset["subject"]],
        models=[dataset["model"], "siglip"], alphas=(1e0, 1e2), surface=True,
        out_dir=str(tmp_path / "sweep_out"),
    )
    results = WB.run(cfg)
    assert len(results) == 2
    assert len(calls) == 1  # gram computed once, reused for the second model
    # identical features -> identical accuracies
    from multimodal_decoding_tpu.ops import metrics as M

    assert results[0][M.ACC_CAPTIONS] == results[1][M.ACC_CAPTIONS]
