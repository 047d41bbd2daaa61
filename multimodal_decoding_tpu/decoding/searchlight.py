"""Surface searchlight pipeline driver (reference entry point #2).

TPU-native rebuild of
/root/reference/analyses/decoding/searchlight/searchlight.py:181-296: the
joblib vertex fan-out becomes the device block engine
(decoding/searchlight_engine.py via parallel/searchlight_runner.py); the
results pickle keeps the reference schema ({nan_locations, adjacency,
n_neighbors, distances, scores}) with scores stored BOTH as the canonical
{metric: [V]} dict ("score_maps") and the reference's per-vertex dict list
("scores") for downstream interchangeability.  Null distributions collapse
from ~327k per-vertex pickles into one npz per (subject, mode, hemi).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np

from multimodal_decoding_tpu.config import (
    DEFAULT_MODEL,
    DEFAULT_RESOLUTION,
    MODALITY_AGNOSTIC,
    SEARCHLIGHT_OUT_DIR,
    SELECT_DEFAULT,
    SPLIT_IMAGERY,
    SPLIT_TEST,
    SPLIT_TRAIN,
    SUBJECTS,
    LatentFeatsConfig,
)
from multimodal_decoding_tpu.data.betas import get_fmri_surface_data
from multimodal_decoding_tpu.data.features import get_latent_features
from multimodal_decoding_tpu.data.preprocess import standardize_fmri_betas
from multimodal_decoding_tpu.data.preprocess import standardize_latents
from multimodal_decoding_tpu.data.stimuli import (
    TEST_STIM_TYPES,
    create_null_distr_shuffled_indices,
)
from multimodal_decoding_tpu.io import artifacts
from multimodal_decoding_tpu.io.surface import knn_adjacency, radius_adjacency
from multimodal_decoding_tpu.ops import metrics as M
from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight
from multimodal_decoding_tpu.utils.runlog import RunLogger


def default_cv_solver() -> str:
    """The shipped CV fast-path solver for the current platform.

    The Pallas solver only pays off on TPU; elsewhere it would run under the
    (slow) interpreter, so fall back to the best XLA-only method.  The parity
    gate (benchmarks/check_cv_parity.py) reads THIS function so it always
    validates exactly what ships.
    """
    import jax

    return "schur-pallas" if jax.devices()[0].platform == "tpu" else "schur-cb"


def default_cv_dtype():
    """The shipped SELECTION-path storage dtype for the current platform.

    bfloat16 on TPU: per-fold slice casts halve the fold-scorer HBM traffic
    (158 -> 164 v/s measured at production shapes) and the on-device parity
    gate holds exactly (1024/1024 alpha agreement, 0.0 final-score delta —
    the refit never touches the bf16 copies).  None elsewhere: CPU bf16 is
    emulated and slower.  The parity gate reads THIS function so it always
    validates exactly what ships.
    """
    import jax

    if jax.devices()[0].platform == "tpu":
        import jax.numpy as jnp

        return jnp.bfloat16
    return None


def default_null_gather() -> str:
    """The shipped null-score permuted-diagonal formulation per platform.

    The one-hot einsum modes are bit-exact reformulations of the gather
    (integer rank counts selected through 0/1 rows — asserted on device by
    benchmarks/profile_null_variants.py and end-to-end in
    tests/test_searchlight.py); which one is FASTER is a per-platform
    measurement.  The parity/ladder scripts read THIS function so they
    always validate what ships.
    """
    import jax

    # measured round 4 on device (profile_null_variants.py, N=8192 B=128
    # P=1000): gather 972.1 ms/block (131.7 v/s) vs onehot 787.8 (162.5 v/s)
    # vs onehot-bf16 789.1 — exactness gate max|delta|=0 for both one-hot
    # modes.  onehot ships on TPU (252 s projected v5e-8, under the 300 s
    # bound); the gather stays the portable default elsewhere (CPU one-hot
    # einsums lose to native gathers).  See docs/PERF_NOTES.md round-4
    # CV+null ladder.
    return "onehot" if jax.devices()[0].platform == "tpu" else "gather"


def searchlight_mode_str(radius=None, n_neighbors=None) -> str:
    """Mode string in results paths (parity: searchlight.py:299-305)."""
    if radius is not None:
        return f"radius_{radius}"
    if n_neighbors is not None:
        return f"n_neighbors_{n_neighbors}"
    raise RuntimeError("Need to set either radius or n_neighbors arg!")


def get_results_dir(feats_config, hemi, subject, training_mode, resolution, mode,
                    out_dir=None) -> str:
    """Directory contract (parity: searchlight.py:308-313)."""
    return os.path.join(
        out_dir or SEARCHLIGHT_OUT_DIR, training_mode, feats_config.model,
        feats_config.combined_feats, feats_config.vision_features,
        feats_config.lang_features, subject, resolution, hemi, mode,
    )


def get_results_file_path(feats_config, hemi, subject, training_mode, resolution, mode,
                          l2_regularization_alpha, out_dir=None) -> str:
    """File contract (parity: searchlight.py:316-318)."""
    return os.path.join(
        get_results_dir(feats_config, hemi, subject, training_mode, resolution, mode, out_dir),
        f"alpha_{str(l2_regularization_alpha)}.p",
    )


@dataclass
class SearchlightConfig:
    betas_dir: str
    mesh_coords: dict  # {hemi: [V, 3] inflated-mesh coordinates}
    model: str = DEFAULT_MODEL
    features: str = SELECT_DEFAULT
    test_features: str = SELECT_DEFAULT
    vision_features: str = SELECT_DEFAULT
    lang_features: str = SELECT_DEFAULT
    subjects: list = field(default_factory=lambda: list(SUBJECTS))
    training_modes: list = field(default_factory=lambda: [MODALITY_AGNOSTIC])
    hemis: list = field(default_factory=lambda: ["left", "right"])
    resolution: str = DEFAULT_RESOLUTION
    l2_regularization_alpha: float = 1.0
    alphas_cv: list | None = None  # per-vertex CV when set (BASELINE config)
    radius: float | None = None
    n_neighbors: int | None = None
    create_null_distr: bool = False
    n_permutations_per_subject: int = 100
    block_size: int | None = None
    out_dir: str | None = None
    overwrite: bool = False
    progress: bool = True
    # fast-math mode: bfloat16 storage + single-pass MXU (the reference uses
    # float16 inputs, searchlight.py:247-248; parity mode is f32 + HIGHEST)
    fast_math: bool = False
    # CV-selection fast path (alphas_cv mode only): alpha selection at
    # DEFAULT precision with the Pallas-base Schur inverse; the refit stays
    # f32-HIGHEST cholesky.  On-device parity vs the strict path is exact
    # (benchmarks/check_cv_parity.py: 768/768 agreement, zero final-score
    # delta) and it is ~3.5x faster, so it defaults on.
    fast_cv: bool = True
    # cache directory for the kNN/radius adjacency build (~680 s single-core
    # at fsaverage7; identical across models/training modes of a subject) —
    # None disables.  Defaults under out_dir at run time.
    adjacency_cache_dir: str | None = None
    # streaming ingestion (parallel/ingest.py): "on"/"off"/"auto" (None ->
    # env MMD_STREAM_INGEST, default "auto" = stream when the npz betas
    # cache exists, the run is single-process, and the train cache is
    # > 2 GB — the regime where the eager path's ~3x fresh-page footprint
    # costs real RAM/wall-clock).  Result is element-wise equal to the
    # eager path (tests/test_ingest.py).
    stream_ingest: bool | str | None = None


def build_adjacency(coords, nan_locations=None, radius=None, n_neighbors=None,
                    cache_dir=None):
    """Adjacency over (optionally NaN-filtered) mesh coords (searchlight.py:152-178).

    Returns (indices [V', K], mask or None, n_neighbors_per_vertex or None,
    distances or None).

    ``cache_dir``: when set, the result is cached as an .npz keyed by the
    (coords, nan mask, radius/K) content hash — the fsaverage7 kNN build is
    ~680 s single-core (benchmarks/profile_run_overheads.py) and identical
    across re-runs, training modes, and models of the same subject/hemi.
    """
    coords = np.asarray(coords)
    if nan_locations is not None:
        coords = coords[~np.asarray(nan_locations)]
    if cache_dir is not None:
        import hashlib

        h = hashlib.sha1()
        h.update(np.ascontiguousarray(coords).tobytes())
        h.update(f"r={radius},k={n_neighbors}".encode())
        cache_path = os.path.join(cache_dir, f"adjacency_{h.hexdigest()[:16]}.npz")
        if os.path.exists(cache_path):
            with np.load(cache_path, allow_pickle=False) as z:
                print(f"Loaded cached adjacency: {cache_path}")
                return (z["idx"],
                        z["mask"] if "mask" in z.files else None,
                        z["counts"] if "counts" in z.files else None,
                        z["dists"] if "dists" in z.files else None)
        out = build_adjacency(coords, None, radius, n_neighbors)
        os.makedirs(cache_dir, exist_ok=True)
        payload = {"idx": out[0]}
        for name, val in zip(("mask", "counts", "dists"), out[1:]):
            if val is not None:
                payload[name] = val
        # atomic publish: a killed run (this codebase explicitly supports
        # resume-after-kill) or a concurrent subject job must never leave a
        # truncated .npz that poisons every later run
        tmp_path = cache_path + f".{os.getpid()}.tmp.npz"  # np.savez appends
        np.savez(tmp_path, **payload)                      # .npz if missing
        os.replace(tmp_path, cache_path)
        return out
    if radius is not None:
        idx, mask, counts = radius_adjacency(coords, radius)
        print(
            f"Number of neighbors within {radius}mm radius: {counts.mean():.1f} "
            f"(max: {counts.max():.0f} | min: {counts.min():.0f})"
        )
        return idx, mask, counts, None
    if n_neighbors is not None:
        idx, dists = knn_adjacency(coords, n_neighbors)
        print(f"Max radius {n_neighbors} neighbors: {dists.max():.2f}mm")
        print(f"Mean radius: {dists.max(axis=1).mean():.2f}mm")
        return idx, None, None, dists
    raise RuntimeError("Need to set either radius or n_neighbors arg!")


def _stream_ingest_readers(cfg: SearchlightConfig, subject, training_mode, hemi):
    """Resolve the streaming-ingestion decision for one (subject, mode, hemi).

    Returns [train, test, imagery] ``NpzMemberReader`` over the betas npz
    caches, or None for the eager path.  "on" raises loudly when the
    prerequisites are missing; "auto" falls back silently (the eager run
    builds the cache, so the NEXT run streams).  See parallel/ingest.py
    for why this exists.
    """
    mode = cfg.stream_ingest
    if mode is None:
        mode = os.environ.get("MMD_STREAM_INGEST", "auto")
    if isinstance(mode, str):
        m = mode.lower()
        if m in ("1", "on", "true"):
            mode = True
        elif m in ("0", "off", "false"):
            mode = False
        elif m == "auto":
            mode = "auto"
        else:
            raise ValueError(f"stream_ingest: {mode!r} (use on/off/auto)")
    if mode is False:
        return None

    import jax

    from multimodal_decoding_tpu.data.betas import surface_cache_path
    from multimodal_decoding_tpu.parallel.ingest import NpzMemberReader

    paths = [
        surface_cache_path(cfg.betas_dir, subject, SPLIT_TRAIN, training_mode, hemi),
        surface_cache_path(cfg.betas_dir, subject, SPLIT_TEST, hemi=hemi),
        surface_cache_path(cfg.betas_dir, subject, SPLIT_IMAGERY, hemi=hemi),
    ]
    missing = [p for p in paths if not os.path.isfile(p)]
    multi = jax.process_count() > 1
    if mode is True:
        if multi:
            raise ValueError(
                "stream_ingest=on is single-process only; multi-process runs "
                "use the per-host-shard ingestion (parallel/multihost.py)"
            )
        if missing:
            raise FileNotFoundError(
                f"stream_ingest=on but the betas npz cache is missing: "
                f"{missing[0]} (run once with the eager loader to build it)"
            )
    elif multi or missing or os.path.getsize(paths[0]) <= (2 << 30):
        return None
    try:
        readers = [NpzMemberReader(p) for p in paths]
    except ValueError:
        if mode is True:
            raise
        return None
    if any(r.dtype != np.float32 for r in readers):
        if mode is True:
            raise ValueError("streaming ingestion requires float32 betas caches")
        return None
    print("Streaming ingestion: standardize + upload in O(chunk) host RAM "
          "(parallel/ingest.py)")
    return readers


def run(cfg: SearchlightConfig) -> list:
    """subject x training_mode x hemi loop (parity: searchlight.py:181-296)."""
    shuffles = None
    if cfg.create_null_distr:
        shuffles = np.stack(
            create_null_distr_shuffled_indices(cfg.n_permutations_per_subject)
        ).astype(np.int32)

    mode_str = searchlight_mode_str(cfg.radius, cfg.n_neighbors)
    outputs = []
    for subject in cfg.subjects:
        for training_mode in cfg.training_modes:
            for hemi in cfg.hemis:
                feats_config = LatentFeatsConfig(
                    cfg.model, cfg.features, cfg.test_features, cfg.vision_features,
                    cfg.lang_features, verbose=False,
                )
                # CV mode stores under alpha_cv (per-vertex alphas live in
                # the results dict); fixed-alpha runs keep the reference's
                # alpha_<value> contract (searchlight.py:316-318)
                alpha_key = "cv" if cfg.alphas_cv is not None else cfg.l2_regularization_alpha
                results_path = get_results_file_path(
                    feats_config, hemi, subject, training_mode, cfg.resolution,
                    mode_str, alpha_key, cfg.out_dir,
                )
                if os.path.isfile(results_path) and not cfg.overwrite:
                    print(f"Skipping searchlight: results at {results_path}")
                    continue

                stream_readers = _stream_ingest_readers(cfg, subject, training_mode, hemi)
                if stream_readers is not None:
                    train_fmri = test_fmri = imagery_fmri = None
                    nan_locations = np.isnan(stream_readers[0].read_row(0))
                else:
                    train_fmri, _, _ = get_fmri_surface_data(
                        cfg.betas_dir, subject, SPLIT_TRAIN, training_mode, hemi
                    )
                    test_fmri, _, _ = get_fmri_surface_data(
                        cfg.betas_dir, subject, SPLIT_TEST, hemi=hemi
                    )
                    imagery_fmri, _, _ = get_fmri_surface_data(
                        cfg.betas_dir, subject, SPLIT_IMAGERY, hemi=hemi
                    )
                    nan_locations = np.isnan(train_fmri[0])
                    train_fmri, test_fmri, imagery_fmri = standardize_fmri_betas(
                        train_fmri, test_fmri, imagery_fmri
                    )

                print(
                    f"\nTRAIN MODE: {training_mode} | SUBJECT: {subject} | "
                    f"MODEL: {feats_config.model} | FEATURES: {feats_config.features} "
                    f"| HEMI: {hemi}"
                )

                train_lat = get_latent_features(feats_config, subject, SPLIT_TRAIN, training_mode)
                test_lat = get_latent_features(feats_config, subject, SPLIT_TEST)
                imag_lat = get_latent_features(feats_config, subject, SPLIT_IMAGERY)
                train_lat, test_lat, imag_lat = standardize_latents(
                    train_lat, test_lat, imag_lat
                )

                adjacency, adj_mask, n_neighbors_per_vertex, distances = build_adjacency(
                    cfg.mesh_coords[hemi], nan_locations, cfg.radius,
                    cfg.n_neighbors, cache_dir=cfg.adjacency_cache_dir,
                )

                import jax as _jax
                import numpy as _np

                x_dtype = _np.dtype("bfloat16") if cfg.fast_math else _np.float32
                mesh = None
                x_all_device = None
                n_rows_split = None
                if stream_readers is not None:
                    from multimodal_decoding_tpu.parallel.ingest import (
                        streamed_scaler_fit,
                        streamed_x_all_device,
                    )
                    from multimodal_decoding_tpu.parallel.mesh import vertex_mesh

                    keep = ~nan_locations
                    mean32, scale32 = streamed_scaler_fit(stream_readers[0], keep)
                    mesh = vertex_mesh()
                    x_all_device = streamed_x_all_device(
                        stream_readers, keep, mean32, scale32, mesh, dtype=x_dtype
                    )
                    n_rows_split = tuple(r.n_rows for r in stream_readers)

                t0 = time.time()
                score_maps, aux = run_searchlight(
                    train_fmri, test_fmri, imagery_fmri,
                    train_lat, test_lat, imag_lat,
                    adjacency,
                    TEST_STIM_TYPES,
                    alpha=cfg.l2_regularization_alpha,
                    alphas_cv=cfg.alphas_cv,
                    adjacency_mask=adj_mask,
                    shuffles=shuffles,
                    block_size=cfg.block_size,
                    progress=cfg.progress,
                    mesh=mesh,
                    x_all_device=x_all_device,
                    n_rows_split=n_rows_split,
                    dtype=x_dtype,
                    precision=_jax.lax.Precision.DEFAULT if cfg.fast_math
                    else _jax.lax.Precision.HIGHEST,
                    cv_precision=(_jax.lax.Precision.DEFAULT
                                  if cfg.fast_cv and cfg.alphas_cv is not None else None),
                    cv_solver=(default_cv_solver()
                               if cfg.fast_cv and cfg.alphas_cv is not None else None),
                    cv_scorer="xla" if cfg.fast_cv else "strict",
                    cv_dtype=(default_cv_dtype()
                              if cfg.fast_cv and cfg.alphas_cv is not None else None),
                    checkpoint_path=results_path + ".ckpt.npz",
                    # --overwrite redoes the work from scratch; a stale
                    # mid-run checkpoint must not silently resume under it
                    resume=not cfg.overwrite,
                )
                print(f"Searchlight time: {int(time.time() - t0)}s "
                      f"({aux['vertices_per_sec']:.0f} vertices/s)")

                for metric in (M.ACC_CAPTIONS, M.ACC_IMAGES, M.ACC_IMAGERY,
                               M.ACC_IMAGERY_WHOLE_TEST):
                    vals = score_maps[metric]
                    print(f"Mean score ({metric}): {np.mean(vals):.2f} | "
                          f"Max score: {np.max(vals):.2f}")

                results_dict = {
                    "nan_locations": nan_locations,
                    "adjacency": adjacency,
                    "n_neighbors": n_neighbors_per_vertex,
                    "distances": distances,
                    "score_maps": score_maps,  # canonical {metric: [V']}
                    "scores": artifacts.scores_to_list(score_maps),  # reference layout
                    "best_alpha": aux.get("best_alpha"),
                    "elapsed_s": aux["elapsed_s"],
                    "vertices_per_sec": aux["vertices_per_sec"],
                }
                artifacts.save_pickle(results_dict, results_path)
                RunLogger(results_path + ".runlog.jsonl", echo=False).event(
                    "searchlight",
                    subject=subject, training_mode=training_mode, hemi=hemi,
                    model=cfg.model, vertices_per_sec=aux["vertices_per_sec"],
                    elapsed_s=aux["elapsed_s"], block_size=aux["block_size"],
                    mean_scores={
                        m: float(np.mean(score_maps[m]))
                        for m in (M.ACC_CAPTIONS, M.ACC_IMAGES, M.ACC_IMAGERY)
                    },
                )
                if "null_scores" in aux:
                    artifacts.save_null_scores_npz(
                        os.path.join(os.path.dirname(results_path), "null_distr.npz"),
                        aux["null_scores"],
                    )
                outputs.append(results_path)
    return outputs
