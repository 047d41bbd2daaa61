"""Group-level permutation testing pipeline (reference entry point #3).

TPU-native rebuild of
/root/reference/analyses/decoding/searchlight/searchlight_permutation_testing.py:

* per-vertex score lists -> full-vertex maps (``process_scores``, :51-99) —
  numpy scatter on dict-of-array score maps;
* observed t-maps + composite min-metrics (:261-293) — one batched jnp pass;
* the 10k-permutation null: instead of joblib jobs writing per-job HDF5
  shards reassembled serially (:442-556), per-subject null score tensors
  [S, P_within, V] live on device and each group permutation is a gather +
  fused t-reduction (ops/stats.null_t_maps), streamed in chunks;
* TFCE of observed + null via the native C++ engine (ops/tfce.py);
* storage: the null pipeline keeps only what inference needs — the
  per-permutation max TFCE statistic across hemispheres (what
  calc_significance_cutoff consumes, cluster_analysis.py:155-178) — instead
  of pickling 10k full maps.  ``keep_null_maps=True`` restores the
  reference's full artifact.

All stage outputs are cached to disk and skipped when present (the
reference's idempotent-resume contract, :297-314, :445-450, :575-578).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from multimodal_decoding_tpu.config import (
    DEFAULT_MODEL,
    DEFAULT_RESOLUTION,
    HEMIS,
    METRIC_CAPTIONS_DIFF_MOD_AGNO_MOD_SPECIFIC,
    METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC,
    METRIC_MOD_AGNOSTIC_AND_CROSS,
    MODALITY_AGNOSTIC,
    MODALITY_SPECIFIC_CAPTIONS,
    MODALITY_SPECIFIC_IMAGES,
    SEARCHLIGHT_PERMUTATION_TESTING_RESULTS_DIR,
    SELECT_DEFAULT,
    SUBJECTS,
    LatentFeatsConfig,
)
from multimodal_decoding_tpu.decoding.searchlight import (
    get_results_file_path,
    searchlight_mode_str,
)
from multimodal_decoding_tpu.io import artifacts
from multimodal_decoding_tpu.io.gifti import export_to_gifti
from multimodal_decoding_tpu.ops import metrics as M
from multimodal_decoding_tpu.ops import stats as S
from multimodal_decoding_tpu.ops import tfce as T

MIN_NUM_DATAPOINTS = 4


# ---------------------------------------------------------------------------
# Score assembly (process_scores parity, permutation_testing.py:51-99)
# ---------------------------------------------------------------------------


def _scatter(values: np.ndarray, nan_locations: np.ndarray) -> np.ndarray:
    """[V'] (or [V', ...]) valid-vertex values -> [V, ...] with NaN elsewhere."""
    values = np.asarray(values)
    out_shape = (len(nan_locations),) + values.shape[1:]
    out = np.full(out_shape, np.nan, dtype=np.float64)
    out[~nan_locations] = values
    return out


def process_scores(scores_agnostic, scores_mod_specific_captions, scores_mod_specific_images,
                   nan_locations, additional_imagery_scores=False) -> dict:
    """Map split-specific metric names onto the analysis vocabulary.

    Inputs are {metric: [V']} dicts (our canonical form; use
    artifacts.list_to_scores for reference-layout pickles).
    """
    nan_locations = np.asarray(nan_locations)
    out = {}

    agnostic_pairs = [
        (M.ACC_CAPTIONS_MOD_AGNOSTIC, M.ACC_CAPTIONS),
        (M.ACC_IMAGES_MOD_AGNOSTIC, M.ACC_IMAGES),
        (M.ACC_IMAGERY_MOD_AGNOSTIC, M.ACC_IMAGERY),
        (M.ACC_IMAGERY_WHOLE_TEST_SET_MOD_AGNOSTIC, M.ACC_IMAGERY_WHOLE_TEST),
    ]
    for name, metric in agnostic_pairs:
        out[name] = _scatter(scores_agnostic[metric], nan_locations)

    if scores_mod_specific_captions is not None and scores_mod_specific_images is not None:
        cap_pairs = [
            (M.ACC_CAPTIONS_MOD_SPECIFIC_CAPTIONS, M.ACC_CAPTIONS),
            (M.ACC_IMAGES_MOD_SPECIFIC_CAPTIONS, M.ACC_IMAGES),
        ]
        if additional_imagery_scores:
            cap_pairs += [
                (M.ACC_IMAGERY_MOD_SPECIFIC_CAPTIONS, M.ACC_IMAGERY),
                (M.ACC_IMAGERY_WHOLE_TEST_SET_MOD_SPECIFIC_CAPTIONS, M.ACC_IMAGERY_WHOLE_TEST),
                (M.ACC_IMAGERY_NO_STD_MOD_SPECIFIC_CAPTIONS, M.ACC_IMAGERY + "_no_std"),
                (
                    M.ACC_IMAGERY_WHOLE_TEST_SET_NO_STD_MOD_SPECIFIC_CAPTIONS,
                    M.ACC_IMAGERY_WHOLE_TEST + "_no_std",
                ),
            ]
        for name, metric in cap_pairs:
            out[name] = _scatter(scores_mod_specific_captions[metric], nan_locations)

        img_pairs = [
            (M.ACC_IMAGES_MOD_SPECIFIC_IMAGES, M.ACC_IMAGES),
            (M.ACC_CAPTIONS_MOD_SPECIFIC_IMAGES, M.ACC_CAPTIONS),
        ]
        if additional_imagery_scores:
            img_pairs += [
                (M.ACC_IMAGERY_MOD_SPECIFIC_IMAGES, M.ACC_IMAGERY),
                (M.ACC_IMAGERY_WHOLE_TEST_SET_MOD_SPECIFIC_IMAGES, M.ACC_IMAGERY_WHOLE_TEST),
                (M.ACC_IMAGERY_NO_STD_MOD_SPECIFIC_IMAGES, M.ACC_IMAGERY + "_no_std"),
                (
                    M.ACC_IMAGERY_WHOLE_TEST_SET_NO_STD_MOD_SPECIFIC_IMAGES,
                    M.ACC_IMAGERY_WHOLE_TEST + "_no_std",
                ),
            ]
        for name, metric in img_pairs:
            out[name] = _scatter(scores_mod_specific_images[metric], nan_locations)

        out[METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC] = (
            out[M.ACC_IMAGES_MOD_AGNOSTIC] - out[M.ACC_IMAGES_MOD_SPECIFIC_IMAGES]
        )
        out[METRIC_CAPTIONS_DIFF_MOD_AGNO_MOD_SPECIFIC] = (
            out[M.ACC_CAPTIONS_MOD_AGNOSTIC] - out[M.ACC_CAPTIONS_MOD_SPECIFIC_CAPTIONS]
        )
    return out


# ---------------------------------------------------------------------------
# Config & artifact paths
# ---------------------------------------------------------------------------


@dataclass
class PermutationConfig:
    subjects: list = field(default_factory=lambda: list(SUBJECTS))
    model: str = DEFAULT_MODEL
    features: str = SELECT_DEFAULT
    test_features: str = SELECT_DEFAULT
    vision_features: str = SELECT_DEFAULT
    lang_features: str = SELECT_DEFAULT
    mod_specific_images_model: str = DEFAULT_MODEL
    mod_specific_images_features: str = SELECT_DEFAULT
    mod_specific_images_test_features: str = SELECT_DEFAULT
    mod_specific_captions_model: str = DEFAULT_MODEL
    mod_specific_captions_features: str = SELECT_DEFAULT
    mod_specific_captions_test_features: str = SELECT_DEFAULT
    # fixed alpha of the searchlight artifacts, or the string "cv" for
    # per-vertex alpha-CV runs (their results live under alpha_cv.p)
    l2_regularization_alpha: float | str = 1.0
    resolution: str = DEFAULT_RESOLUTION
    radius: float | None = None
    n_neighbors: int | None = None
    tfce_h: float = 2.0
    tfce_e: float = 1.0
    tfce_dh: float = 0.1
    metric: str = METRIC_MOD_AGNOSTIC_AND_CROSS
    n_permutations_group_level: int = 10000
    p_value_threshold: float = 1e-4
    tfce_value_threshold: float | None = None
    hemis: list = field(default_factory=lambda: list(HEMIS))
    # mesh edges per hemi: {hemi: (edges [E,2], lengths [E])}
    edges_by_hemi: dict | None = None
    searchlight_out_dir: str | None = None
    out_dir: str | None = None
    null_chunk: int = 256
    keep_null_maps: bool = False


def permutation_results_dir(cfg: PermutationConfig) -> str:
    """Directory contract (parity: permutation_testing.py:559-564)."""
    return os.path.join(
        cfg.out_dir or SEARCHLIGHT_PERMUTATION_TESTING_RESULTS_DIR,
        cfg.model, cfg.features, cfg.mod_specific_images_model,
        cfg.mod_specific_images_features, cfg.mod_specific_captions_model,
        cfg.mod_specific_captions_features, cfg.resolution,
        searchlight_mode_str(cfg.radius, cfg.n_neighbors),
    )


def get_hparam_suffix(cfg: PermutationConfig) -> str:
    return f"_{cfg.metric}_h_{cfg.tfce_h}_e_{cfg.tfce_e}_dh_{cfg.tfce_dh}"


def _results_path(cfg, feats, hemi, subject, mode):
    return get_results_file_path(
        feats, hemi, subject, mode, cfg.resolution,
        searchlight_mode_str(cfg.radius, cfg.n_neighbors),
        cfg.l2_regularization_alpha, cfg.searchlight_out_dir,
    )


def _feats_configs(cfg: PermutationConfig):
    agnostic = LatentFeatsConfig(
        cfg.model, cfg.features, cfg.test_features, cfg.vision_features,
        cfg.lang_features, verbose=False,
    )
    images = LatentFeatsConfig(
        cfg.mod_specific_images_model, cfg.mod_specific_images_features,
        cfg.mod_specific_images_test_features, cfg.vision_features,
        cfg.lang_features, verbose=False,
    )
    captions = LatentFeatsConfig(
        cfg.mod_specific_captions_model, cfg.mod_specific_captions_features,
        cfg.mod_specific_captions_test_features, cfg.vision_features,
        cfg.lang_features, verbose=False,
    )
    return agnostic, images, captions


def _score_maps_from_results(results: dict) -> dict:
    if "score_maps" in results:
        return results["score_maps"]
    return artifacts.list_to_scores(results["scores"])  # reference-layout pickle


# ---------------------------------------------------------------------------
# Observed statistics
# ---------------------------------------------------------------------------


def load_per_subject_scores(cfg: PermutationConfig, return_nan_locations=False,
                            additional_imagery_scores=False):
    """Load agnostic + modality-specific results per subject/hemi (:102-178)."""
    agnostic_fc, images_fc, captions_fc = _feats_configs(cfg)
    per_subject_scores = {s: {} for s in cfg.subjects}
    per_subject_nan = {s: {} for s in cfg.subjects}
    for subject in cfg.subjects:
        for hemi in cfg.hemis:
            res_a = artifacts.load_pickle(
                _results_path(cfg, agnostic_fc, hemi, subject, MODALITY_AGNOSTIC)
            )
            nan_locations = np.asarray(res_a["nan_locations"])
            per_subject_nan[subject][hemi] = nan_locations
            scores_a = _score_maps_from_results(res_a)

            def load_optional(fc, mode):
                path = _results_path(cfg, fc, hemi, subject, mode)
                if os.path.isfile(path):
                    return _score_maps_from_results(artifacts.load_pickle(path))
                print(f"Missing modality-specific results: {path}")
                return None

            scores_i = load_optional(images_fc, MODALITY_SPECIFIC_IMAGES)
            scores_c = load_optional(captions_fc, MODALITY_SPECIFIC_CAPTIONS)
            per_subject_scores[subject][hemi] = process_scores(
                scores_a, scores_c, scores_i, nan_locations, additional_imagery_scores
            )
    if return_nan_locations:
        return per_subject_scores, per_subject_nan
    return per_subject_scores


def _chance(metric):
    return M.CHANCE_VALUES[metric]


def calc_t_values(per_subject_scores: dict, subjects, hemis=HEMIS) -> dict:
    """Observed t-maps + composites per hemi (parity: :261-293)."""
    t_values = {h: {} for h in hemis}
    for hemi in hemis:
        for metric in S.T_VAL_METRICS:
            data = np.stack([per_subject_scores[s][hemi][metric] for s in subjects])
            t_values[hemi][metric] = np.asarray(
                S.t_map(jnp.asarray(data, jnp.float32), _chance(metric))
            )
        t_values[hemi] = {
            k: np.asarray(v) for k, v in S.composite_t_maps(t_values[hemi]).items()
        }
    return t_values


# ---------------------------------------------------------------------------
# Null distribution
# ---------------------------------------------------------------------------


def assemble_null_scores(cfg: PermutationConfig, subject: str, hemi: str) -> dict:
    """Per-subject null score maps {analysis_metric: [P_within, V]}.

    Replaces the reference's per-vertex pickle assembly (:349-439) by reading
    the per-run null npz (searchlight driver output).
    """
    agnostic_fc, images_fc, captions_fc = _feats_configs(cfg)

    def load_null(fc, mode):
        res_dir = os.path.dirname(_results_path(cfg, fc, hemi, subject, mode))
        path = os.path.join(res_dir, "null_distr.npz")
        if not os.path.isfile(path):
            raise RuntimeError(f"No null distribution found: {path}")
        return artifacts.load_null_scores_npz(path)  # {metric: [V', P]}

    null_a = load_null(agnostic_fc, MODALITY_AGNOSTIC)
    null_i = load_null(images_fc, MODALITY_SPECIFIC_IMAGES)
    null_c = load_null(captions_fc, MODALITY_SPECIFIC_CAPTIONS)

    res_a = artifacts.load_pickle(
        _results_path(cfg, agnostic_fc, hemi, subject, MODALITY_AGNOSTIC)
    )
    nan_locations = np.asarray(res_a["nan_locations"])

    # process_scores over the [V', P] arrays: scatter handles trailing axes
    maps = process_scores(null_a, null_c, null_i, nan_locations)
    # -> {metric: [V, P]}; transpose to [P, V]
    return {k: np.ascontiguousarray(v.T.astype(np.float32)) for k, v in maps.items()}


def _stacked_null_scores(cfg: PermutationConfig, hemi: str, members, mesh=None,
                         emulate_host_ingestion: bool = False) -> dict:
    """{metric: [S, P_within, V]} per-subject null stacks for one hemi.

    ``mesh=None``: one process loads every subject's null artifact.  With a
    mesh and multiple processes, ingestion is per-host sharded: each host
    reads only the subjects it owns (multihost.host_shard_bounds over the
    subject list) and the union is assembled on device by one reduce
    (multihost.replicate_host_filled) — the multi-chip analogue of the
    reference's per-job HDF5 shard assembly (permutation_testing.py:513-556).

    A SINGLE process that drives a whole mesh (a v5e-8 TPU VM) gains nothing
    from per-host sharding — it reads every subject either way — so it takes
    the plain-stack path unless ``emulate_host_ingestion`` forces the
    device-granular emulation (tests: the emulation builds n_dev full-size
    zero-filled copies, ~n_dev x S*P*V*4 bytes, which at production scale is
    tens of GB of pointless host transients).
    """
    import jax

    multi = mesh is not None and jax.process_count() > 1
    if not multi and not (mesh is not None and emulate_host_ingestion):
        subj_nulls = [assemble_null_scores(cfg, s, hemi) for s in cfg.subjects]
        return {
            m: np.stack([sn[m] for sn in subj_nulls]) for m in members
        }

    from multimodal_decoding_tpu.parallel.multihost import (
        host_shard_bounds,
        replicate_host_filled,
    )

    n_subj = len(cfg.subjects)

    def host_fill(host_idx, n_hosts):
        lo, hi = host_shard_bounds(n_subj, host_idx, n_hosts)
        return {s: assemble_null_scores(cfg, cfg.subjects[s], hemi)
                for s in range(lo, hi)}

    if multi:
        owned = host_fill(jax.process_index(), jax.process_count())
        all_owned = [owned]
        # processes with no subjects (process_count > n_subjects) cannot read
        # a sample artifact to learn the fill shape — broadcast it from
        # process 0, which always owns subject 0
        from jax.experimental import multihost_utils

        if owned:
            sample = next(iter(owned.values()))
            shape_arr = np.asarray(sample[members[0]].shape, np.int32)
        else:
            shape_arr = np.zeros(2, np.int32)
        shape_arr = np.asarray(multihost_utils.broadcast_one_to_all(shape_arr))
        p_within, v = int(shape_arr[0]), int(shape_arr[1])
    else:
        # device-granular host emulation (same convention as multihost.py)
        n_dev = mesh.devices.size
        all_owned = [host_fill(d, n_dev) for d in range(n_dev)]
        some = next(o for o in all_owned if o)
        sample = next(iter(some.values()))
        p_within, v = sample[members[0]].shape

    out = {}
    for metric in members:
        def fill_of(owned):
            fill = np.zeros((n_subj, p_within, v), np.float32)
            for s, maps in owned.items():
                fill[s] = maps[metric]
            return fill

        if multi:
            out[metric] = replicate_host_filled(fill_of(all_owned[0]), mesh)
        else:
            out[metric] = replicate_host_filled(
                [fill_of(o) for o in all_owned], mesh
            )
    return out


def null_max_tfce_statistics(cfg: PermutationConfig, mesh=None,
                             emulate_host_ingestion: bool = False) -> dict:
    """Group-level null: sample permutations, t-maps on device, native TFCE.

    Returns {"null_max": [P_group] max TFCE across hemis, "per_hemi": ...}
    and caches to <results>/null_max<hparams>.npz.

    With ``mesh``, the [P_group, V] t-map sweep runs permutation-sharded
    across the devices (parallel.distributed.sharded_null_t_maps) and null
    ingestion is per-host sharded — the production wiring of what the
    reference does with joblib vertex shards + HDF5 reassembly
    (searchlight_permutation_testing.py:513-556).
    """
    out_dir = permutation_results_dir(cfg)
    os.makedirs(out_dir, exist_ok=True)
    cache = os.path.join(out_dir, f"null_max{get_hparam_suffix(cfg)}.npz")
    if os.path.isfile(cache):
        z = np.load(cache)
        return {"null_max": z["null_max"]}

    if mesh is not None:
        from multimodal_decoding_tpu.parallel.distributed import sharded_null_t_maps

    # per-subject [P_within, V] nulls for the constituent metrics
    members = S.COMPOSITE_METRICS.get(cfg.metric, [cfg.metric])
    per_hemi_null_t = {}
    n_group = cfg.n_permutations_group_level

    for hemi in cfg.hemis:
        stacks = _stacked_null_scores(cfg, hemi, members, mesh,
                                      emulate_host_ingestion=emulate_host_ingestion)
        p_within, v = stacks[members[0]].shape[1:]
        perms = S.group_permutations(p_within, len(cfg.subjects), n_group)

        t_min = np.full((n_group, v), np.inf, dtype=np.float32)
        any_valid = np.zeros((n_group, v), dtype=bool)
        for metric in members:
            scores = jnp.asarray(stacks[metric])  # [S, P_within, V]
            popmean = _chance(metric)
            for start in range(0, n_group, cfg.null_chunk):
                chunk = perms[start : start + cfg.null_chunk]
                n_chunk = len(chunk)
                if mesh is not None:
                    n_dev = mesh.devices.size
                    pad = (-n_chunk) % n_dev
                    if pad:
                        chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)])
                    t_chunk = np.asarray(
                        sharded_null_t_maps(scores, chunk, popmean, mesh)
                    )[:n_chunk]
                else:
                    t_chunk = np.asarray(
                        S.null_t_maps(scores, jnp.asarray(chunk), popmean)
                    )
                valid = ~np.isnan(t_chunk)
                sl = slice(start, start + n_chunk)
                t_min[sl] = np.where(
                    valid & (t_chunk < t_min[sl]), t_chunk, t_min[sl]
                )
                any_valid[sl] |= valid
        t_min[~any_valid] = np.nan
        t_min[np.isinf(t_min)] = np.nan
        per_hemi_null_t[hemi] = t_min

    # TFCE per permutation per hemi (native batched engine)
    null_max = np.full(n_group, -np.inf, dtype=np.float64)
    for hemi in cfg.hemis:
        edges, lengths = cfg.edges_by_hemi[hemi]
        if cfg.keep_null_maps:
            tfce_maps = T.tfce_map(
                per_hemi_null_t[hemi], edges, lengths,
                h=cfg.tfce_h, e=cfg.tfce_e, dh=cfg.tfce_dh,
            )  # [P, V]
            hemi_max = np.nanmax(
                np.where(np.isnan(tfce_maps), -np.inf, tfce_maps), axis=1)
            np.savez_compressed(
                os.path.join(out_dir, f"tfce_null_maps_{hemi}{get_hparam_suffix(cfg)}.npz"),
                tfce=tfce_maps,
            )
        else:
            # only the per-permutation max feeds inference — chunk the TFCE
            # so the second full [P, V] array (~6.5 GB at the BASELINE 10k
            # fsaverage7 config) never materialises
            hemi_max = np.empty(n_group, dtype=np.float64)
            for start in range(0, n_group, cfg.null_chunk):
                tfce_chunk = T.tfce_map(
                    per_hemi_null_t[hemi][start : start + cfg.null_chunk],
                    edges, lengths,
                    h=cfg.tfce_h, e=cfg.tfce_e, dh=cfg.tfce_dh,
                )
                hemi_max[start : start + len(tfce_chunk)] = np.nanmax(
                    np.where(np.isnan(tfce_chunk), -np.inf, tfce_chunk), axis=1)
        null_max = np.maximum(null_max, hemi_max)

    # multi-process runs compute identical replicated results on every host;
    # only process 0 publishes the shared-filesystem artifact (atomically —
    # a killed run must not leave a truncated npz that poisons the cache)
    import jax

    if jax.process_index() == 0:
        tmp = cache + f".{os.getpid()}.tmp.npz"
        np.savez(tmp, null_max=null_max)
        os.replace(tmp, cache)
    return {"null_max": null_max}


# ---------------------------------------------------------------------------
# Test statistics & masks
# ---------------------------------------------------------------------------


def calc_test_statistics(cfg: PermutationConfig, mesh=None) -> dict:
    """Observed t -> TFCE -> p-values (parity: :296-346), cached per stage."""
    out_dir = permutation_results_dir(cfg)
    os.makedirs(out_dir, exist_ok=True)

    t_values_path = os.path.join(out_dir, "t_values.p")
    if not os.path.isfile(t_values_path):
        per_subject_scores = load_per_subject_scores(cfg)
        t_values = calc_t_values(per_subject_scores, cfg.subjects, cfg.hemis)
        artifacts.save_pickle(t_values, t_values_path)
    else:
        t_values = artifacts.load_pickle(t_values_path)

    tfce_path = os.path.join(out_dir, f"tfce_values{get_hparam_suffix(cfg)}.p")
    if not os.path.isfile(tfce_path):
        edges_by_hemi = {h: cfg.edges_by_hemi[h][0] for h in cfg.hemis}
        lengths_by_hemi = {h: cfg.edges_by_hemi[h][1] for h in cfg.hemis}
        tfce_values = T.calc_tfce_values(
            t_values, edges_by_hemi, cfg.metric, h=cfg.tfce_h, e=cfg.tfce_e,
            dh=cfg.tfce_dh, edge_lengths_by_hemi=lengths_by_hemi, hemis=cfg.hemis,
        )
        artifacts.save_pickle(tfce_values, tfce_path)
    else:
        tfce_values = artifacts.load_pickle(tfce_path)

    null = null_max_tfce_statistics(cfg, mesh)
    cutoff, null_sorted = S.significance_cutoff(null["null_max"], cfg.p_value_threshold)

    p_values = {}
    for hemi in cfg.hemis:
        obs = np.asarray(tfce_values[hemi][cfg.metric], dtype=np.float64)
        p_values[hemi] = S.p_values_from_null_max(obs, null_sorted)
        with np.errstate(invalid="ignore"):
            n_pos = int(np.nansum(p_values[hemi] > 0))
        print(f"{hemi}: {n_pos} vertices with p-values; cutoff={cutoff:.3f}")

    artifacts.save_pickle(
        p_values, os.path.join(out_dir, f"p_values{get_hparam_suffix(cfg)}.p")
    )
    return {
        "t_values": t_values,
        "tfce_values": tfce_values,
        "p_values": p_values,
        "significance_cutoff": cutoff,
        "null_max_sorted": null_sorted,
    }


def create_masks(cfg: PermutationConfig, stats: dict | None = None) -> dict:
    """Binary masks + gifti maps + cluster tables (cluster_analysis.py:181-228)."""
    out_dir = permutation_results_dir(cfg)
    suffix = get_hparam_suffix(cfg)
    stats = stats or calc_test_statistics(cfg)
    p_values = stats["p_values"]
    tfce_values = stats["tfce_values"]

    maps_dir = os.path.join(out_dir, "results_maps")
    os.makedirs(maps_dir, exist_ok=True)

    fs_names = {"left": "lh", "right": "rh"}
    masks = {}
    for hemi in cfg.hemis:
        with np.errstate(invalid="ignore"):
            log10p = np.where(
                np.isnan(p_values[hemi]), np.nan, -np.log10(p_values[hemi])
            )
        export_to_gifti(log10p, os.path.join(maps_dir, f"p_values{suffix}_{fs_names[hemi]}.gii"))
        export_to_gifti(
            np.asarray(tfce_values[hemi][cfg.metric]),
            os.path.join(maps_dir, f"tfce_values{suffix}_{fs_names[hemi]}.gii"),
        )

        if cfg.tfce_value_threshold is not None:
            vals = np.asarray(tfce_values[hemi][cfg.metric])
            with np.errstate(invalid="ignore"):
                m = (vals > cfg.tfce_value_threshold).astype(np.uint8)
        else:
            with np.errstate(invalid="ignore"):
                m = (p_values[hemi] <= cfg.p_value_threshold)
            m = np.where(np.isnan(p_values[hemi]), False, m).astype(np.uint8)
        masks[hemi] = m
        export_to_gifti(
            m.astype(np.float32), os.path.join(maps_dir, f"mask{suffix}_{fs_names[hemi]}.gii")
        )

    # cluster table over the mask (calc_clusters at threshold ~0, :105-122)
    clusters_table = []
    for hemi in cfg.hemis:
        edges, lengths = cfg.edges_by_hemi[hemi]
        res = T.calc_clusters(masks[hemi].astype(np.float32), 1e-8, edges, lengths)
        clusters = sorted(res["clusters"], key=len, reverse=True)
        t_map_h = np.asarray(stats["t_values"][hemi][cfg.metric])
        for i, cluster in enumerate(clusters[:10]):
            cl = list(cluster)
            peak = cl[int(np.nanargmax(t_map_h[cl]))]
            clusters_table.append({
                "hemi": hemi, "id": i, "size": len(cl),
                "max_t_value": float(t_map_h[peak]),
                "p_value": float(p_values[hemi][peak])
                if not np.isnan(p_values[hemi][peak]) else np.nan,
                "peak_vertex": int(peak),
            })
            print(f"Cluster {hemi}/{i}: {len(cl)} vertices | "
                  f"max t={t_map_h[peak]:.2f} | peak vertex {peak}")

    artifacts.save_pickle(masks, os.path.join(maps_dir, f"masks{suffix}.p"))
    artifacts.save_pickle(clusters_table, os.path.join(maps_dir, f"clusters{suffix}.p"))
    return {"masks": masks, "clusters": clusters_table}


def run(cfg: PermutationConfig, mesh=None) -> dict:
    """create_null_distribution -> calc_test_statistics -> create_masks (:666-675).

    Pass a jax.sharding.Mesh to run the null t-map sweep permutation-sharded
    across devices with per-host null-artifact ingestion.
    """
    print(f"\nPermutation Testing for {cfg.metric}\n")
    stats = calc_test_statistics(cfg, mesh)
    out = create_masks(cfg, stats)
    out.update(stats)
    return out
