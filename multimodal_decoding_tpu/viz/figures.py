"""Composite result figures: TFCE-thresholded maps, method panels.

Rebuilds the figure CLIs
/root/reference/analyses/visualization/searchlight_plot_results.py:37-296 and
searchlight_plot_method.py:42-393 on the framework's own renderer
(viz/plotting.py): per-view/hemisphere surface grids of accuracy maps,
t-maps, TFCE maps and p-value maps, assembled into composite PNGs.
"""

from __future__ import annotations

import os

import numpy as np

from multimodal_decoding_tpu.config import HEMIS
from multimodal_decoding_tpu.viz.plotting import plot_views_grid

# accuracy-vs-significance calibration recorded by the reference
# (searchlight_plot_method.py:164-172): t cutoff -> min mean accuracy
T_CUTOFF_ACCURACY_CALIBRATION = {
    0.05: (2.06, 0.531),
    0.01: (3.44, 0.574),
    0.001: (6.03, 0.590),
}


def plot_tfce_thresholded_results(
    mesh_by_hemi: dict,
    t_values: dict,
    tfce_values: dict,
    metric: str,
    tfce_cutoff: float,
    out_dir: str,
    views=("lateral", "medial"),
    vmax=None,
    annot_by_hemi: dict | None = None,
    rois_for_view: dict | None = None,
) -> str:
    """t-map masked to TFCE-significant vertices, composite grid
    (searchlight_plot_results.py:37-296 pattern).

    With ``annot_by_hemi`` ({hemi: io.annot.Annotation}, aparc), the panels
    carry ROI contour overlays like every published figure
    (searchlight_plot_results.py:208-231); ``rois_for_view`` overrides
    viz.roi.DEFAULT_ROIS_FOR_VIEW.
    """
    stat = {}
    for hemi in HEMIS:
        t = np.array(t_values[hemi][metric], dtype=np.float64)
        tf = np.asarray(tfce_values[hemi][metric])
        t[~(tf > tfce_cutoff)] = np.nan
        stat[hemi] = t
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{metric}_tfce_thresholded.png")
    hook = None
    if annot_by_hemi is not None:
        from multimodal_decoding_tpu.viz.roi import contour_hook

        hook = contour_hook(annot_by_hemi, rois_for_view)
    plot_views_grid(mesh_by_hemi, stat, views=views, vmax=vmax, out_path=out_path,
                    title=f"{metric} (TFCE > {tfce_cutoff:.2f})", panel_hook=hook)
    return out_path


def plot_tfce_composite(
    mesh_by_hemi: dict,
    tfce_values: dict,
    metric: str,
    significance_cutoff: float,
    out_dir: str,
    annot_by_hemi: dict | None = None,
    rois_for_view: dict | None = None,
    views=("lateral", "medial", "ventral"),
) -> str:
    """The published-figure class: TFCE values thresholded at the
    permutation significance cutoff, positive-only 'hot' colormap, aparc ROI
    contours per view/hemi (searchlight_plot_results.py:103-231 semantics:
    result_values = tfce maps, threshold = calc_significance_cutoff,
    cmap=CMAP_POS_ONLY='hot', cbar_min=0, cbar_max=max across hemis)."""
    stat = {h: np.asarray(tfce_values[h][metric], dtype=np.float64) for h in HEMIS}
    vmax = float(np.nanmax(np.concatenate([stat[h] for h in HEMIS])))
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{metric}_tfce_composite.png")
    hook = None
    if annot_by_hemi is not None:
        from multimodal_decoding_tpu.viz.roi import contour_hook

        hook = contour_hook(annot_by_hemi, rois_for_view)
    plot_views_grid(
        mesh_by_hemi, stat, views=views, threshold=significance_cutoff,
        vmax=vmax, vmin=0.0, cmap="hot", out_path=out_path,
        title=f"{metric} (TFCE, p-cutoff {significance_cutoff:.1f})",
        panel_hook=hook,
    )
    return out_path


def plot_method_panels(
    mesh_by_hemi: dict,
    per_subject_scores: dict,
    t_values: dict,
    tfce_values: dict,
    p_values: dict,
    metric: str,
    out_dir: str,
) -> list:
    """Method-figure family: per-subject accuracy grids, group mean, t/TFCE/p
    maps (searchlight_plot_method.py:42-393 pattern)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []

    subjects = list(per_subject_scores)
    for subject in subjects:
        stat = {h: np.asarray(per_subject_scores[subject][h][metric]) for h in HEMIS}
        path = os.path.join(out_dir, f"acc_{metric}_{subject}.png")
        plot_views_grid(mesh_by_hemi, stat, out_path=path, title=f"{subject} {metric}")
        written.append(path)

    group = {
        h: np.nanmean(
            np.stack([np.asarray(per_subject_scores[s][h][metric]) for s in subjects]), axis=0
        )
        for h in HEMIS
    }
    path = os.path.join(out_dir, f"acc_{metric}_group_mean.png")
    plot_views_grid(mesh_by_hemi, group, out_path=path, title=f"group mean {metric}")
    written.append(path)

    for name, maps in (("t", t_values), ("tfce", tfce_values)):
        stat = {h: np.asarray(maps[h][metric]) for h in HEMIS}
        path = os.path.join(out_dir, f"{name}_{metric}.png")
        plot_views_grid(mesh_by_hemi, stat, out_path=path, title=f"{name} {metric}")
        written.append(path)

    with np.errstate(invalid="ignore"):
        logp = {
            h: np.where(np.isnan(p_values[h]), np.nan, -np.log10(p_values[h])) for h in HEMIS
        }
    path = os.path.join(out_dir, f"p_{metric}.png")
    plot_views_grid(mesh_by_hemi, logp, out_path=path, title=f"-log10 p {metric}")
    written.append(path)
    return written


def tfce_map_correlations(tfce_values: dict, metrics: list, hemis=HEMIS) -> np.ndarray:
    """Cross-metric Pearson correlation of TFCE maps
    (plot_correlation_imagery_mod_agnostic_regions.py:20-69 semantics)."""
    vecs = []
    for metric in metrics:
        v = np.concatenate([np.asarray(tfce_values[h][metric], dtype=np.float64) for h in hemis])
        vecs.append(v)
    stacked = np.stack(vecs)
    ok = ~np.any(np.isnan(stacked), axis=0)
    return np.corrcoef(stacked[:, ok])
