"""Group-level permutation pipeline: searchlight-with-null -> stats -> masks.

Small-scale end-to-end on an icosphere mesh with 3 synthetic subjects,
exercising process_scores, null assembly, device t-maps, native/scipy TFCE,
p-values and mask/cluster outputs.
"""

import os

import numpy as np
import pytest

from multimodal_decoding_tpu import config
from multimodal_decoding_tpu.data.synthetic import make_synthetic_dataset
from multimodal_decoding_tpu.decoding import permutation as PT
from multimodal_decoding_tpu.io.surface import edge_lengths, icosphere
from multimodal_decoding_tpu.ops import metrics as M
from multimodal_decoding_tpu.ops import stats as S

SUBJECTS = ["sub-01", "sub-02", "sub-03"]


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("perm")
    mesh = icosphere(subdivisions=1, radius=50.0)  # 42 vertices

    for i, subj in enumerate(SUBJECTS):
        make_synthetic_dataset(
            str(tmp), subject=subj, n_train=40, n_vertices=mesh.n_vertices,
            latent_dim=6, surface=True, beta_seed=100 + i, n_nan_vertices=2,
        )

    orig = (config.FMRI_STIM_INFO_DIR, config.LATENT_FEATURES_DIR, config.BETAS_CACHE_DIR)
    config.FMRI_STIM_INFO_DIR = str(tmp / "stim_info")
    config.LATENT_FEATURES_DIR = str(tmp / "nn_features")
    config.BETAS_CACHE_DIR = str(tmp / "cache")
    from multimodal_decoding_tpu.data.features import _load_feature_pickle

    _load_feature_pickle.cache_clear()

    from multimodal_decoding_tpu.decoding.searchlight import SearchlightConfig, run

    coords = {"left": mesh.coordinates, "right": mesh.coordinates}
    sl_out = str(tmp / "searchlight")
    for mode in ["agnostic", "images", "captions"]:
        cfg = SearchlightConfig(
            betas_dir=os.path.join(str(tmp), "betas", "surface"),
            mesh_coords=coords,
            model="clip",
            subjects=SUBJECTS,
            training_modes=[mode],
            n_neighbors=6,
            create_null_distr=True,
            n_permutations_per_subject=6,
            out_dir=sl_out,
            progress=False,
            block_size=8,
        )
        run(cfg)

    edges, lens = edge_lengths(mesh)
    pcfg = PT.PermutationConfig(
        subjects=SUBJECTS,
        model="clip",
        mod_specific_images_model="clip",
        mod_specific_captions_model="clip",
        n_neighbors=6,
        n_permutations_group_level=20,
        # min achievable p is 1-19/20 = 0.0500000...4 (same float arithmetic
        # as the reference, permutation_testing.py:337-340), so use 0.06
        p_value_threshold=0.06,
        edges_by_hemi={"left": (edges, lens), "right": (edges, lens)},
        searchlight_out_dir=sl_out,
        out_dir=str(tmp / "permutation"),
        null_chunk=8,
    )
    out = PT.run(pcfg)
    yield out, pcfg, mesh
    (config.FMRI_STIM_INFO_DIR, config.LATENT_FEATURES_DIR, config.BETAS_CACHE_DIR) = orig
    _load_feature_pickle.cache_clear()


def test_t_values_structure(pipeline_run):
    out, cfg, mesh = pipeline_run
    t_values = out["t_values"]
    for hemi in ("left", "right"):
        for metric in S.T_VAL_METRICS + list(S.COMPOSITE_METRICS):
            assert metric in t_values[hemi], metric
            assert t_values[hemi][metric].shape == (mesh.n_vertices,)
        # NaN-dropped vertices have NaN t-values
        assert np.isnan(t_values[hemi][S.T_VAL_METRICS[0]][:2]).all()
        # composite == nanmin of members at a spot-checked vertex
        for name, members in S.COMPOSITE_METRICS.items():
            stack = np.stack([t_values[hemi][m] for m in members])
            ref = np.nanmin(stack, axis=0)
            np.testing.assert_allclose(
                t_values[hemi][name], ref, atol=1e-6, equal_nan=True
            )


def test_observed_t_against_scipy(pipeline_run):
    out, cfg, mesh = pipeline_run
    from scipy import stats as sps
    from multimodal_decoding_tpu.decoding.permutation import load_per_subject_scores

    per_subject = load_per_subject_scores(cfg)
    metric = M.ACC_IMAGES_MOD_AGNOSTIC
    data = np.stack([per_subject[s]["left"][metric] for s in cfg.subjects])
    v = 10  # a valid vertex
    ref = sps.ttest_1samp(data[:, v] - 0.5, 0.0).statistic
    np.testing.assert_allclose(out["t_values"]["left"][metric][v], ref, rtol=1e-5)


def test_p_values_and_masks(pipeline_run):
    out, cfg, mesh = pipeline_run
    for hemi in ("left", "right"):
        p = out["p_values"][hemi]
        assert p.shape == (mesh.n_vertices,)
        valid = ~np.isnan(p)
        assert np.all((p[valid] >= 0) & (p[valid] <= 1))
        m = out["masks"][hemi]
        assert m.dtype == np.uint8 and set(np.unique(m)) <= {0, 1}

    # planted signal: strong decoding -> some significant vertices expected
    total_sig = sum(out["masks"][h].sum() for h in ("left", "right"))
    assert total_sig > 0

    # artifacts on disk
    out_dir = PT.permutation_results_dir(cfg)
    suffix = PT.get_hparam_suffix(cfg)
    for fname in ["t_values.p", f"tfce_values{suffix}.p", f"p_values{suffix}.p",
                  f"null_max{suffix}.npz"]:
        assert os.path.isfile(os.path.join(out_dir, fname)), fname


def test_null_max_statistics_resume(pipeline_run):
    """Second call hits the cache (idempotent resume contract)."""
    out, cfg, mesh = pipeline_run
    again = PT.null_max_tfce_statistics(cfg)
    np.testing.assert_array_equal(np.sort(again["null_max"]), out["null_max_sorted"])


def test_process_scores_semantics(rng):
    """diff metrics + scatter semantics (permutation_testing.py:51-99)."""
    v_total, v_valid = 12, 9
    nan_loc = np.zeros(v_total, dtype=bool)
    nan_loc[[0, 5, 11]] = True

    def fake(metrics):
        return {m: rng.rand(v_valid).astype(np.float32) for m in metrics}

    base = [M.ACC_CAPTIONS, M.ACC_IMAGES, M.ACC_IMAGERY, M.ACC_IMAGERY_WHOLE_TEST]
    sa, sc, si = fake(base), fake(base), fake(base)
    out = PT.process_scores(sa, sc, si, nan_loc)

    np.testing.assert_allclose(
        out[M.ACC_CAPTIONS_MOD_AGNOSTIC][~nan_loc], sa[M.ACC_CAPTIONS], atol=1e-7
    )
    assert np.isnan(out[M.ACC_CAPTIONS_MOD_AGNOSTIC][nan_loc]).all()
    np.testing.assert_allclose(
        out[PT.METRIC_IMAGES_DIFF_MOD_AGNO_MOD_SPECIFIC][~nan_loc],
        sa[M.ACC_IMAGES] - si[M.ACC_IMAGES],
        atol=1e-6,
    )
    # mod-specific captions' ACC_IMAGES maps to cross-decoding name
    np.testing.assert_allclose(
        out[M.ACC_IMAGES_MOD_SPECIFIC_CAPTIONS][~nan_loc], sc[M.ACC_IMAGES], atol=1e-7
    )


def test_keep_null_maps(pipeline_run, tmp_path):
    """keep_null_maps=True writes the full per-permutation TFCE maps."""
    import dataclasses

    out, cfg, mesh = pipeline_run
    cfg2 = dataclasses.replace(
        cfg, out_dir=str(tmp_path / "perm_full"), keep_null_maps=True
    )
    res = PT.null_max_tfce_statistics(cfg2)
    out_dir = PT.permutation_results_dir(cfg2)
    suffix = PT.get_hparam_suffix(cfg2)
    for hemi in ("left", "right"):
        path = os.path.join(out_dir, f"tfce_null_maps_{hemi}{suffix}.npz")
        assert os.path.isfile(path)
        maps = np.load(path)["tfce"]
        assert maps.shape == (cfg2.n_permutations_group_level, mesh.n_vertices)
    # max of stored maps reproduces the cached null_max
    left = np.load(os.path.join(out_dir, f"tfce_null_maps_left{suffix}.npz"))["tfce"]
    right = np.load(os.path.join(out_dir, f"tfce_null_maps_right{suffix}.npz"))["tfce"]
    stacked = np.concatenate([left, right], axis=1)
    ref_max = np.nanmax(np.where(np.isnan(stacked), -np.inf, stacked), axis=1)
    np.testing.assert_allclose(res["null_max"], ref_max, atol=1e-5)


def test_figure_cli_composition_from_pipeline(pipeline_run, tmp_path):
    """plot_results CLI core: pipeline artifacts -> TFCE composite with ROI
    contours (searchlight_plot_results.py figure class)."""
    from multimodal_decoding_tpu.io.annot import Annotation
    from multimodal_decoding_tpu.viz.figures import plot_tfce_composite

    out, cfg, mesh = pipeline_run
    stats = PT.calc_test_statistics(cfg)  # idempotent cache hit

    z = mesh.coordinates[:, 2]
    idx = np.digitize(z, np.quantile(z, [0.34, 0.67]))
    colors = np.array([[25, 5, 25], [60, 20, 220], [220, 60, 20]], dtype=np.int64)
    packed = colors[:, 0] + colors[:, 1] * 256 + colors[:, 2] * 65536
    annot = Annotation(labels=packed[idx], names=["unknown", "regA", "regB"],
                       ctab=np.column_stack([colors, np.zeros(3, np.int64), packed]))

    path = plot_tfce_composite(
        {"left": mesh, "right": mesh}, stats["tfce_values"], cfg.metric,
        stats["significance_cutoff"], str(tmp_path),
        annot_by_hemi={"left": annot, "right": annot},
        rois_for_view={"left": {"lateral": ["regA"], "medial": ["regB"]},
                       "right": {"lateral": ["regA"], "medial": []}},
        views=("lateral", "medial"),
    )
    assert os.path.getsize(path) > 1000


def test_cv_artifacts_feed_permutation_pipeline(tmp_path, monkeypatch):
    """alpha-CV searchlight results (alpha_cv.p) drive the full group-stats
    pipeline via l2_regularization_alpha='cv' (round-2 contract extension)."""
    mesh = icosphere(subdivisions=1, radius=50.0)
    subjects = ["sub-01", "sub-02", "sub-03"]
    for i, subj in enumerate(subjects):
        make_synthetic_dataset(
            str(tmp_path), subject=subj, n_train=40, n_vertices=mesh.n_vertices,
            latent_dim=6, surface=True, beta_seed=200 + i, n_nan_vertices=1,
        )
    monkeypatch.setattr(config, "FMRI_STIM_INFO_DIR", str(tmp_path / "stim_info"))
    monkeypatch.setattr(config, "LATENT_FEATURES_DIR", str(tmp_path / "nn_features"))
    monkeypatch.setattr(config, "BETAS_CACHE_DIR", str(tmp_path / "cache"))
    from multimodal_decoding_tpu.data.features import _load_feature_pickle

    _load_feature_pickle.cache_clear()
    from multimodal_decoding_tpu.decoding.searchlight import SearchlightConfig, run

    coords = {"left": mesh.coordinates, "right": mesh.coordinates}
    sl_out = str(tmp_path / "searchlight")
    for mode in ["agnostic", "images", "captions"]:
        run(SearchlightConfig(
            betas_dir=os.path.join(str(tmp_path), "betas", "surface"),
            mesh_coords=coords, model="clip", subjects=subjects,
            training_modes=[mode], n_neighbors=6,
            alphas_cv=[0.5, 50.0],  # per-vertex CV -> alpha_cv.p artifacts
            create_null_distr=True, n_permutations_per_subject=4,
            out_dir=sl_out, progress=False, block_size=8,
        ))
    # artifact contract: results live under alpha_cv.p
    import glob as _glob

    assert _glob.glob(os.path.join(sl_out, "**", "alpha_cv.p"), recursive=True)

    edges, lens = edge_lengths(mesh)
    pcfg = PT.PermutationConfig(
        subjects=subjects, model="clip",
        mod_specific_images_model="clip", mod_specific_captions_model="clip",
        n_neighbors=6, l2_regularization_alpha="cv",
        n_permutations_group_level=10, p_value_threshold=0.2,
        edges_by_hemi={"left": (edges, lens), "right": (edges, lens)},
        searchlight_out_dir=sl_out, out_dir=str(tmp_path / "permutation"),
        null_chunk=8,
    )
    out = PT.run(pcfg)
    stats = out["stats"] if "stats" in out else out
    assert np.isfinite(stats["significance_cutoff"])
    _load_feature_pickle.cache_clear()


def test_null_max_sharded_matches_single_device(pipeline_run, tmp_path):
    """Production permutation pipeline on the 8-device mesh == single-device.

    Covers both halves of the multi-chip wiring: permutation-sharded
    null t-maps (sharded_null_t_maps, chunk padded to the mesh) and
    per-host-sharded null ingestion (replicate_host_filled union).
    """
    from dataclasses import replace

    from multimodal_decoding_tpu.parallel.mesh import vertex_mesh

    out, cfg, mesh = pipeline_run
    # fresh out_dir so the cached single-device null_max is not reused
    cfg_sharded = replace(cfg, out_dir=str(tmp_path / "perm_sharded"))
    # null_chunk=8 divides the mesh evenly; also use a chunk that does NOT
    # (pads with repeats and slices back)
    for chunk in (8, 5):
        cfg_i = replace(cfg_sharded, out_dir=f"{cfg_sharded.out_dir}_{chunk}",
                        null_chunk=chunk)
        res = PT.null_max_tfce_statistics(cfg_i, mesh=vertex_mesh(),
                                          emulate_host_ingestion=True)
        np.testing.assert_allclose(
            np.sort(res["null_max"]), out["null_max_sorted"], rtol=1e-5
        )


def test_method_figures_from_pipeline(pipeline_run, tmp_path):
    """The three published method-figure classes + composite assembly render
    from pipeline artifacts with the reference's conventions
    (searchlight_plot_method.py:42-393; VERDICT round-2 #7)."""
    from multimodal_decoding_tpu.viz import figures as F

    out, cfg, mesh = pipeline_run
    stats = PT.calc_test_statistics(cfg)  # idempotent cache hit
    per_subject_scores = PT.load_per_subject_scores(cfg)
    mesh_by_hemi = {"left": mesh, "right": mesh}

    written = F.plot_method_figures(
        mesh_by_hemi, per_subject_scores, stats["t_values"],
        stats["tfce_values"], stats["p_values"], cfg.metric,
        stats["significance_cutoff"], cfg.p_value_threshold,
        str(tmp_path), views=("lateral", "posterior"),
    )

    # panel tree layout matches the reference's tmp/<family> contract
    for metric in F.method_metrics():
        for view in ("lateral", "posterior"):
            for hemi in ("left", "right"):
                p = os.path.join(tmp_path, "tmp", "acc_scores",
                                 f"{metric}_{view}_{hemi}.png")
                assert os.path.getsize(p) > 500, p
        assert os.path.isfile(
            os.path.join(tmp_path, "tmp", "acc_scores", f"colorbar_{metric}.png"))
    for fam in ("t-values", "tfce-values"):
        assert os.path.getsize(os.path.join(
            tmp_path, "tmp", fam, f"{cfg.metric}_lateral_left.png")) > 500
        assert os.path.isfile(os.path.join(
            tmp_path, "tmp", fam, f"colorbar_{cfg.metric}.png"))
    assert os.path.isfile(os.path.join(tmp_path, "tmp", "p_values", "colorbar.png"))
    # composite assembled from the panels (create_composite_image parity)
    assert os.path.getsize(written["composite"]) > 2000
    from PIL import Image

    img = Image.open(written["composite"])
    assert img.size[0] > 100 and img.size[1] > 100
