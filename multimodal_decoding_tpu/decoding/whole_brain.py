"""Whole-brain ridge decoding pipeline (reference entry point #1).

TPU-native rebuild of
/root/reference/analyses/decoding/ridge_regression_decoding.py: the
GridSearchCV(Ridge) process fan-out (:111-117) becomes one feature-streamed
gram matrix + 30 small Cholesky solves on device (ops/ridge.py); predictions
come from the dual form so the [V, D] weight matrix is never materialised.
Results pickles keep the reference's schema (:137-157) and directory
contracts (:24-42, :93-99) including idempotent skip-if-exists.
"""

from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass, field

import numpy as np

from multimodal_decoding_tpu.config import (
    DEFAULT_ALPHAS,
    DEFAULT_MODEL,
    DEFAULT_RESOLUTION,
    MODALITY_AGNOSTIC,
    NUM_CV_SPLITS,
    RESULTS_FILE,
    RIDGE_DECODER_OUT_DIR,
    SELECT_DEFAULT,
    SPLIT_IMAGERY,
    SPLIT_TEST,
    SPLIT_TRAIN,
    SUBJECTS,
    LatentFeatsConfig,
)
from multimodal_decoding_tpu.data.betas import get_fmri_data
from multimodal_decoding_tpu.data.features import get_latent_features
from multimodal_decoding_tpu.data.preprocess import (
    apply_mask,
    standardize_fmri_betas,
    standardize_latents,
)
from multimodal_decoding_tpu.ops import metrics as M
from multimodal_decoding_tpu.ops.ridge import (
    cross_matrix,
    dual_ridge_predict,
    gram_matrix,
    ridge_cv_dual,
)
from multimodal_decoding_tpu.utils.runlog import RunLogger


def get_run_str(betas_dir, feats_config, mask=None, surface=False,
                resolution=DEFAULT_RESOLUTION) -> str:
    """Run-identity string, reference path contract (ridge_regression_decoding.py:24-42)."""
    run_str = f"{feats_config.model}_{feats_config.combined_feats}"
    run_str += f"_{feats_config.vision_features}"
    run_str += f"_{feats_config.lang_features}"
    if betas_dir.endswith(os.sep):
        betas_dir = betas_dir[:-1]
    run_str += f"_{betas_dir.split(os.sep)[-1]}"
    if mask is not None:
        if mask.startswith("functional_") or mask.startswith("anatomical_"):
            run_str += f"_mask_{mask}"
        else:
            run_str += f"_mask_{os.path.basename(mask).replace('.p', '')}"
    if surface:
        run_str += f"_surface_{resolution}"
    return run_str


@dataclass
class WholeBrainConfig:
    betas_dir: str
    training_modes: list = field(default_factory=lambda: [MODALITY_AGNOSTIC])
    subjects: list = field(default_factory=lambda: list(SUBJECTS))
    models: list = field(default_factory=lambda: [DEFAULT_MODEL])
    features: str = SELECT_DEFAULT
    test_features: str = SELECT_DEFAULT
    vision_features: str = SELECT_DEFAULT
    lang_features: str = SELECT_DEFAULT
    alphas: tuple = DEFAULT_ALPHAS
    n_splits: int = NUM_CV_SPLITS
    surface: bool = False
    resolution: str = DEFAULT_RESOLUTION
    masks: list = field(default_factory=lambda: [None])
    overwrite: bool = False
    out_dir: str = RIDGE_DECODER_OUT_DIR
    # feature-sharded kernels over a device mesh (tensor parallel): None =
    # single device; "auto" = all local devices (parallel.mesh.feature_mesh)
    mesh: object = None


class GramCache:
    """Model-independent kernel matrices for one (subject, mask) dataset.

    The gram K = X X^T and the query kernels depend only on the betas — NOT
    on the latent model — so a multi-model sweep (the reference refits
    everything per model, ridge_regression_decoding.py:82-135) amortises the
    single expensive [N, V]-contraction across all models.
    """

    def __init__(self, train_betas, test_betas, imagery_betas, mesh=None):
        t0 = time.time()
        self.K = gram_matrix(train_betas, mesh=mesh)
        self.K_test = cross_matrix(test_betas, train_betas, mesh=mesh)
        self.K_imag = cross_matrix(imagery_betas, train_betas, mesh=mesh)
        self.gram_seconds = time.time() - t0


def default_wb_cv_solver() -> str | None:
    """The shipped whole-brain CV SELECTION solver for the current platform.

    Round 3 left the fast schur-inverse selection OPT-IN after a schur-cb
    tie flip on a PURE-NOISE probe.  Round 5 ran the planted-signal gate at
    production shapes on device (benchmarks/check_wb_cv_parity.py: 16
    decode problems, n=8192/f=16384/D=1024, SNR swept strong -> near-noise):
    BOTH fast solvers agreed with the strict HIGHEST cho_solve oracle on
    every argmax (16/16, max CV-score gap 8.3e-5, zero flips) — on real
    decode problems the tie flip does not occur, so the fast selection
    ships on TPU (docs/PERF_NOTES.md "Round 5: whole-brain CV gate").  The
    refit never leaves strict HIGHEST cholesky either way (ridge_cv_dual),
    so final metrics are untouched; elsewhere the strict oracle stays the
    default (no measured win off-TPU).  The gate reads ridge_cv_dual's
    cv_solver directly, so re-running it validates exactly what ships.
    """
    import jax

    return "schur-pallas" if jax.devices()[0].platform == "tpu" else None


def decode_single(
    train_betas: np.ndarray,
    test_betas: np.ndarray,
    imagery_betas: np.ndarray,
    train_latents: np.ndarray,
    test_latents: np.ndarray,
    imagery_latents: np.ndarray,
    alphas=DEFAULT_ALPHAS,
    n_splits: int = NUM_CV_SPLITS,
    gram_cache: "GramCache | None" = None,
    cv_solver: str | None = "default",
):
    """One decoder fit: CV alpha sweep + refit + test/imagery predictions.

    The compute core of ridge_regression_decoding.py:111-135, device-native.
    Returns (best_alpha, test_preds, imagery_preds, cv_mean_scores, timing).
    ``cv_solver``: "default" resolves per platform (default_wb_cv_solver);
    None forces the strict oracle; any explicit solver is passed through.
    """
    t0 = time.time()
    cache = gram_cache or GramCache(train_betas, test_betas, imagery_betas)
    if cv_solver == "default":
        cv_solver = default_wb_cv_solver()
    best_idx, mean_scores, dual = ridge_cv_dual(
        cache.K, np.asarray(train_latents, np.float32), list(alphas),
        n_splits=n_splits, cv_solver=cv_solver,
    )
    fit_s = time.time() - t0

    test_preds = np.asarray(dual_ridge_predict(cache.K_test, dual))
    imagery_preds = np.asarray(dual_ridge_predict(cache.K_imag, dual))
    return float(alphas[best_idx]), test_preds, imagery_preds, mean_scores, fit_s


def run(cfg: WholeBrainConfig) -> list:
    """Pipeline loop: training_mode x subject x mask x model (parity :45-187)."""
    all_results = []
    for training_mode in cfg.training_modes:
        for subject in cfg.subjects:
            train_full, train_ids, train_types = get_fmri_data(
                cfg.betas_dir, subject, SPLIT_TRAIN, training_mode, surface=cfg.surface
            )
            test_full, test_ids, test_types = get_fmri_data(
                cfg.betas_dir, subject, SPLIT_TEST, surface=cfg.surface
            )
            imag_full, imag_ids, imag_types = get_fmri_data(
                cfg.betas_dir, subject, SPLIT_IMAGERY, surface=cfg.surface
            )
            for mask in cfg.masks:
                mask = None if mask in ("none", "None") else mask
                mask_dict = None
                if mask is not None:
                    if not cfg.surface:
                        raise NotImplementedError("masks require surface data")
                    with open(mask, "rb") as f:
                        mask_dict = pickle.load(f)
                train_b, test_b, imag_b = apply_mask(
                    mask_dict, [train_full, test_full, imag_full]
                )
                train_b, test_b, imag_b = standardize_fmri_betas(train_b, test_b, imag_b)
                print(f"train fMRI betas shape: {train_b.shape}")

                gram_cache = None  # built lazily, shared across the model sweep
                for model in cfg.models:
                    feats_config = LatentFeatsConfig(
                        model, cfg.features, cfg.test_features, cfg.vision_features,
                        cfg.lang_features,
                    )
                    run_str = get_run_str(
                        cfg.betas_dir, feats_config, mask, cfg.surface, cfg.resolution
                    )
                    results_file_path = os.path.join(
                        cfg.out_dir, training_mode, subject, run_str, RESULTS_FILE
                    )
                    if os.path.isfile(results_file_path) and not cfg.overwrite:
                        print(f"Skipping: results already present at {results_file_path}")
                        continue

                    train_lat = get_latent_features(feats_config, subject, SPLIT_TRAIN, training_mode)
                    test_lat = get_latent_features(feats_config, subject, SPLIT_TEST)
                    imag_lat = get_latent_features(feats_config, subject, SPLIT_IMAGERY)
                    train_lat, test_lat, imag_lat = standardize_latents(
                        train_lat, test_lat, imag_lat
                    )

                    if gram_cache is None:
                        mesh = cfg.mesh
                        if mesh == "auto":
                            from multimodal_decoding_tpu.parallel.mesh import feature_mesh

                            mesh = feature_mesh()
                        gram_cache = GramCache(train_b, test_b, imag_b, mesh=mesh)
                    best_alpha, test_preds, imag_preds, cv_scores, fit_s = decode_single(
                        train_b, test_b, imag_b, train_lat, test_lat, imag_lat,
                        cfg.alphas, cfg.n_splits, gram_cache=gram_cache,
                    )
                    print(f"Elapsed time: {int(fit_s)}s | Best alpha: {best_alpha}")

                    results = {
                        "alpha": best_alpha,
                        "model": model,
                        "subject": subject,
                        "features": feats_config.features,
                        "test_features": feats_config.test_features,
                        "vision_features": feats_config.vision_features,
                        "lang_features": feats_config.lang_features,
                        "training_mode": training_mode,
                        "mask": mask,
                        "num_voxels": test_b.shape[1],
                        "stimulus_ids": test_ids,
                        "stimulus_types": test_types,
                        "imagery_stimulus_ids": imag_ids,
                        "predictions": test_preds,
                        "imagery_predictions": imag_preds,
                        "latents": test_lat,
                        "imagery_latents": imag_lat,
                        "surface": cfg.surface,
                        "resolution": cfg.resolution,
                        "cv_mean_scores": cv_scores,
                        "fit_seconds": fit_s,
                    }
                    scores = M.calc_all_pairwise_accuracy_scores(
                        test_lat, test_preds, test_types, imag_lat, imag_preds,
                        standardize_predictions=True,
                    )
                    results.update({k: float(v) for k, v in scores.items()})
                    print(
                        f"Pairwise acc (mean): "
                        f"{np.mean((results[M.ACC_CAPTIONS], results[M.ACC_IMAGES])):.4f} | "
                        f"captions: {results[M.ACC_CAPTIONS]:.2f} | "
                        f"images: {results[M.ACC_IMAGES]:.2f} | "
                        f"imagery: {results[M.ACC_IMAGERY]:.2f} | "
                        f"imagery whole test: {results[M.ACC_IMAGERY_WHOLE_TEST]:.2f}"
                    )

                    os.makedirs(os.path.dirname(results_file_path), exist_ok=True)
                    with open(results_file_path, "wb") as f:
                        pickle.dump(results, f)
                    RunLogger(results_file_path + ".runlog.jsonl", echo=False).event(
                        "whole_brain_decode",
                        subject=subject, model=model, training_mode=training_mode,
                        best_alpha=best_alpha, fit_seconds=fit_s,
                        num_voxels=int(test_b.shape[1]),
                        scores={k: float(v) for k, v in scores.items()},
                    )
                    all_results.append(results)

                    scores_no_std = M.calc_all_pairwise_accuracy_scores(
                        test_lat, test_preds, test_types, imag_lat, imag_preds,
                        standardize_predictions=False,
                    )
                    print(
                        "Without standardization of predictions: "
                        f"captions: {float(scores_no_std[M.ACC_CAPTIONS]):.2f} | "
                        f"images: {float(scores_no_std[M.ACC_IMAGES]):.2f}"
                    )
    return all_results
