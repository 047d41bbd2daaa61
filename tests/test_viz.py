"""Viz layer: reporting DataFrame, maps, figures, atlas sampling, MI metrics."""

import os

import numpy as np
import pytest

from multimodal_decoding_tpu.io import atlas as AT
from multimodal_decoding_tpu.io.gifti import read_gifti
from multimodal_decoding_tpu.io.surface import icosphere
from multimodal_decoding_tpu.viz import maps as VM
from multimodal_decoding_tpu.viz import reporting as VR


def test_results_frame_and_default_filter(tmp_path, rng):
    import pickle

    # two fake results pickles: one default-feature, one not
    rows = [
        dict(model="clip", subject="sub-01", training_mode="agnostic", features="avg",
             test_features="avg", vision_features="vision_features_cls",
             lang_features="lang_features_cls", alpha=100.0, num_voxels=10, mask=None,
             pairwise_acc_captions=0.8, pairwise_acc_images=0.7,
             predictions=rng.randn(4, 3), latents=rng.randn(4, 3),
             stimulus_types=np.array(["caption", "caption", "image", "image"])),
        dict(model="clip", subject="sub-02", training_mode="agnostic", features="lang",
             test_features="lang", vision_features="vision_features_cls",
             lang_features="lang_features_cls", alpha=10.0, num_voxels=10, mask=None,
             pairwise_acc_captions=0.6, pairwise_acc_images=0.5),
    ]
    for i, res in enumerate(rows):
        d = tmp_path / "agnostic" / f"sub-0{i + 1}" / "runstr"
        os.makedirs(d)
        with open(d / "results.p", "wb") as f:
            pickle.dump(res, f)

    df = VR.load_results_frame(str(tmp_path))
    assert set(df.metric) == {"pairwise_acc_captions", "pairwise_acc_images"}
    assert len(df) == 4

    default_only = VR.filter_default_features(df)
    assert set(default_only.subject) == {"sub-01"}

    summary = VR.summarize(df, "pairwise_acc_captions", by=("model",))
    assert summary.loc["clip", "count"] == 2


def test_export_maps(tmp_path, rng):
    v = 30
    per_subject = {
        s: {h: {"m": rng.rand(v)} for h in ("left", "right")} for s in ("sub-01", "sub-02")
    }
    written = VM.export_subject_maps(per_subject, ["m"], str(tmp_path))
    assert len(written) == 4
    back = read_gifti(written[0]).data
    assert back.shape == (v,)

    avg_written = VM.export_average_maps(
        per_subject, ["m"], str(tmp_path), min_composites={"min_m": ["m"]}
    )
    assert len(avg_written) == 4  # (avg + composite) x 2 hemis
    avg = read_gifti([p for p in avg_written if "avg/m_lh" in p][0]).data
    ref = np.mean([per_subject[s]["left"]["m"] for s in per_subject], axis=0)
    np.testing.assert_allclose(avg, ref, atol=1e-6)


def test_acc_vs_patch_size_corr(rng):
    n = rng.randint(10, 100, size=50).astype(float)
    scores = 0.01 * n + rng.randn(50) * 0.001
    assert VM.acc_vs_patch_size_correlation(scores, n) > 0.9


def test_surface_plot_renders(tmp_path, rng):
    mesh = icosphere(subdivisions=1)
    stat = rng.randn(mesh.n_vertices).astype(np.float32)
    stat[:5] = np.nan
    from multimodal_decoding_tpu.viz.plotting import plot_surf_stat_map, plot_views_grid

    fig = plot_surf_stat_map(mesh, stat, threshold=0.5)
    assert fig is not None
    out = str(tmp_path / "grid.png")
    plot_views_grid({"left": mesh, "right": mesh}, {"left": stat, "right": stat},
                    out_path=out)
    assert os.path.getsize(out) > 1000


def test_tfce_map_correlations(rng):
    v = 40
    tfce = {
        h: {"a": rng.rand(v), "b": rng.rand(v)} for h in ("left", "right")
    }
    tfce["left"]["b"][:3] = np.nan
    from multimodal_decoding_tpu.viz.figures import tfce_map_correlations

    corr = tfce_map_correlations(tfce, ["a", "b"])
    assert corr.shape == (2, 2)
    assert abs(corr[0, 0] - 1.0) < 1e-12


def test_atlas_volume_sampling():
    vol = np.zeros((10, 10, 10), dtype=np.int32)
    vol[5:, :, :] = 7
    affine = np.eye(4)
    coords = np.array([[2.0, 2.0, 2.0], [8.0, 3.0, 3.0], [-5.0, 0.0, 0.0]])
    sampled = AT.sample_volume_at_vertices(vol, affine, coords)
    assert list(sampled) == [0, 7, 0]  # out-of-volume -> 0


def test_volume_labels_to_annot(tmp_path):
    from multimodal_decoding_tpu.io.annot import read_annot

    vol = np.zeros((6, 6, 6), dtype=np.int32)
    vol[3:, :, :] = 42
    coords = np.array([[1.0, 1, 1], [5.0, 1, 1]])
    path = str(tmp_path / "lh.sub.annot")
    labels, names, colors = AT.volume_labels_to_annot(
        vol, np.eye(4), coords, {42: "thalamus"}, out_path=path
    )
    back = read_annot(path)
    assert back.names == ["unknown", "thalamus"]
    assert back.labels[0] != back.labels[1]
    np.testing.assert_array_equal(back.labels, labels)


def test_mutual_information():
    rng = np.random.RandomState(0)
    x = rng.randn(5000)
    # identical images: MI = entropy >> MI with independent noise
    assert AT.mutual_information(x, x) > 5 * AT.mutual_information(x, rng.randn(5000))
    assert AT.normalized_mutual_information(x, x) > 1.5
    nmi_indep = AT.normalized_mutual_information(x, rng.randn(5000))
    assert 0.9 < nmi_indep < 1.2


def test_comparison_plots(tmp_path, rng):
    import pandas as pd

    from multimodal_decoding_tpu.viz import comparison_plots as CP

    rows = []
    for model in ("clip", "vit"):
        for mode in ("agnostic",):
            for subj in ("sub-01", "sub-02", "sub-03", "sub-04", "sub-05", "sub-07"):
                for metric in ("pairwise_acc_captions", "pairwise_acc_images"):
                    rows.append(dict(model=model, training_mode=mode, subject=subj,
                                     metric=metric, value=0.5 + 0.3 * rng.rand()))
    df = pd.DataFrame(rows)

    assert CP.verify_num_datapoints(df, ["clip", "vit"], training_modes=["agnostic"]) == []
    # wrong count raises
    bad = df[df.subject != "sub-07"]
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="unexpected number of datapoints"):
        CP.verify_num_datapoints(bad, ["clip"], training_modes=["agnostic"])

    g = CP.plot_metric(df, order=["clip", "vit"], hue_order=["agnostic"])
    assert g is not None
    out = str(tmp_path / "cmp.png")
    CP.create_result_graph(df, order=["clip", "vit"], hue_order=["agnostic"],
                           out_path=out)
    assert os.path.getsize(out) > 1000
