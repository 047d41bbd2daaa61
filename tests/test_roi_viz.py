"""ROI visualization layer: label table, contour geometry, overlays, ROI maps."""

import os

import numpy as np
import pytest

from multimodal_decoding_tpu.io.annot import Annotation, read_annot, write_annot
from multimodal_decoding_tpu.io.surface import icosphere
from multimodal_decoding_tpu.viz import roi as R
from multimodal_decoding_tpu.viz.plotting import plot_surf_stat_map


def test_destrieux_label_names(tmp_path):
    p = tmp_path / "destrieux.txt"
    p.write_text(
        "1, G_and_S_frontomargin Fronto-marginal gyrus (of Wernicke) and sulcus\n"
        "2, G_and_S_occipital_inf Inferior occipital gyrus (O3) and sulcus\n"
        "6, G_and_S_cingul-Ant Anterior part of the cingulate gyrus and sulcus (ACC)\n"
    )
    names = R.destrieux_label_names(str(p))
    assert names["G_and_S_frontomargin"] == "Fronto-marginal gyrus (of Wernicke) and sulcus"
    assert names["G_and_S_cingul-Ant"].startswith("Anterior part")
    assert len(names) == 3


def test_boundary_faces_geometry():
    mesh = icosphere(subdivisions=2)
    roi = np.where(mesh.coordinates[:, 2] > 0)[0]  # upper hemisphere cap
    contour = R.boundary_faces(mesh.faces, roi)
    assert contour.any()
    in_roi = np.isin(mesh.faces, roi)
    # contour faces are never fully interior to the ROI
    assert np.all(in_roi[contour].sum(axis=1) < 3)
    # all contour faces sit near the ROI edge (z ~ 0 ring on a sphere)
    face_z = mesh.coordinates[mesh.faces][contour][:, :, 2]
    assert np.abs(face_z).max() < 0.5 * mesh.coordinates[:, 2].max()
    # a disconnected "region" of isolated vertices is rejected
    lonely = np.array([0])
    with pytest.raises(ValueError, match="form a connected region"):
        R.boundary_faces(mesh.faces, lonely)


def test_overlay_recolors_contour_faces(rng):
    mesh = icosphere(subdivisions=2)
    stat = rng.randn(mesh.n_vertices).astype(np.float32)
    fig = plot_surf_stat_map(mesh, stat, colorbar=False)
    ax = fig.axes[0]
    labels = (mesh.coordinates[:, 2] > 0).astype(np.int32)

    before = np.array(ax.collections[0]._mmd_face_colors, copy=True)
    R.overlay_roi_contours(ax, mesh, labels, levels=[1], colors=["lightseagreen"])
    after = np.array(ax.collections[0]._mmd_face_colors)

    contour = R.boundary_faces(mesh.faces, np.where(labels == 1)[0])
    assert not np.allclose(before[contour], after[contour])
    np.testing.assert_allclose(before[~contour], after[~contour])
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_surf_roi_and_legend(tmp_path, rng):
    mesh = icosphere(subdivisions=1)
    roi_map = np.full(mesh.n_vertices, np.nan)
    roi_map[mesh.coordinates[:, 0] > 0] = 3
    roi_map[mesh.coordinates[:, 0] < -0.5] = 7
    fig = R.plot_surf_roi(mesh, roi_map)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)

    path = R.save_legend({"precuneus": "lightseagreen", "fusiform": "red"},
                         str(tmp_path / "legend.png"))
    assert os.path.getsize(path) > 500


def _fake_aparc(mesh, names=("unknown", "precuneus", "fusiform")):
    """Annotation whose label_map() partitions the sphere by z-coordinate."""
    z = mesh.coordinates[:, 2]
    idx = np.digitize(z, np.quantile(z, [0.34, 0.67]))
    colors = np.array([[25, 5, 25], [60, 20, 220], [220, 60, 20]], dtype=np.int64)
    packed = colors[:, 0] + colors[:, 1] * 256 + colors[:, 2] * 65536
    return Annotation(labels=packed[idx], names=list(names),
                      ctab=np.column_stack([colors, np.zeros(3, np.int64), packed]))


def test_contour_hook_and_composite_figure(tmp_path, rng):
    mesh = icosphere(subdivisions=2)
    annot = _fake_aparc(mesh)
    tfce = {h: {"m": np.abs(rng.randn(mesh.n_vertices)) * 100} for h in ("left", "right")}
    from multimodal_decoding_tpu.viz.figures import plot_tfce_composite

    out = plot_tfce_composite(
        {"left": mesh, "right": mesh}, tfce, "m", significance_cutoff=50.0,
        out_dir=str(tmp_path),
        annot_by_hemi={"left": annot, "right": annot},
        rois_for_view={
            "left": {"lateral": ["precuneus"], "medial": ["fusiform"], "ventral": []},
            "right": {"lateral": [], "medial": ["precuneus"], "ventral": []},
        },
        views=("lateral", "medial"),
    )
    assert os.path.getsize(out) > 1000


def test_annot_roundtrip_feeds_contour_hook(tmp_path, rng):
    """A written+reread .annot drives the hook end to end (aparc pattern)."""
    mesh = icosphere(subdivisions=2)
    src = _fake_aparc(mesh)
    path = str(tmp_path / "lh.aparc.annot")
    write_annot(path, src.labels, src.names, src.ctab[:, :4])
    annot = read_annot(path)

    stat = rng.randn(mesh.n_vertices)
    fig = plot_surf_stat_map(mesh, stat, colorbar=False)
    hook = R.contour_hook({"left": annot},
                          {"left": {"lateral": ["precuneus", "fusiform"]}})
    hook(fig.axes[0], mesh, "left", "lateral")
    import matplotlib.pyplot as plt

    plt.close(fig)
