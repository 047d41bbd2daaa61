"""Figure composites render; runlog round-trips."""

import os

import numpy as np

from multimodal_decoding_tpu.io.surface import icosphere
from multimodal_decoding_tpu.utils.runlog import RunLogger, read_runlog
from multimodal_decoding_tpu.viz.figures import (
    plot_method_panels,
    plot_tfce_thresholded_results,
)


def test_tfce_thresholded_figure(tmp_path, rng):
    mesh = icosphere(subdivisions=1)
    v = mesh.n_vertices
    meshes = {"left": mesh, "right": mesh}
    t_values = {h: {"m": rng.randn(v) + 1} for h in ("left", "right")}
    tfce_values = {h: {"m": np.abs(rng.randn(v)) * 10} for h in ("left", "right")}
    out = plot_tfce_thresholded_results(
        meshes, t_values, tfce_values, "m", tfce_cutoff=5.0, out_dir=str(tmp_path)
    )
    assert os.path.getsize(out) > 1000


def test_method_panels(tmp_path, rng):
    mesh = icosphere(subdivisions=1)
    v = mesh.n_vertices
    meshes = {"left": mesh, "right": mesh}
    subjects = ["sub-01", "sub-02"]
    per_subject = {s: {h: {"m": rng.rand(v)} for h in ("left", "right")} for s in subjects}
    t_values = {h: {"m": rng.randn(v)} for h in ("left", "right")}
    tfce_values = {h: {"m": np.abs(rng.randn(v))} for h in ("left", "right")}
    p_values = {h: np.where(rng.rand(v) < 0.3, rng.rand(v) * 0.1, np.nan)
                for h in ("left", "right")}
    written = plot_method_panels(
        meshes, per_subject, t_values, tfce_values, p_values, "m", str(tmp_path)
    )
    # per-subject + group + t + tfce + p
    assert len(written) == len(subjects) + 3 + 1
    for p in written:
        assert os.path.getsize(p) > 500


def test_runlog_roundtrip(tmp_path, rng):
    path = str(tmp_path / "run.jsonl")
    logger = RunLogger(path, echo=False)
    logger.event("fit", subject="sub-01", alpha=100.0,
                 scores={"acc": np.float32(0.8)}, big=rng.randn(100))
    logger.event("done", elapsed=np.int64(5))
    events = read_runlog(path)
    assert [e["kind"] for e in events] == ["fit", "done"]
    assert events[0]["scores"]["acc"] == 0.800000011920929
    assert events[0]["big"].startswith("<array")
    assert events[1]["elapsed"] == 5
