"""Cluster mask post-processing (reference combine_cluster_maps.py:23-41 +
searchlight_cluster_manual_corrections.py:24-38 semantics)."""

import os

import numpy as np

from multimodal_decoding_tpu.decoding.cluster_postproc import (
    apply_manual_corrections,
    combine_cluster_maps,
)
from multimodal_decoding_tpu.io import artifacts
from multimodal_decoding_tpu.io.gifti import read_gifti


def test_combine_cluster_maps_or_semantics(tmp_path):
    # masks with NaN background (the reference's p-value-mask convention)
    m1 = {"left": np.array([1.0, np.nan, 0.0, 2.5])}
    m2 = {"left": np.array([np.nan, 3.0, 0.0, np.nan])}
    p1, p2 = str(tmp_path / "m1.p"), str(tmp_path / "m2.p")
    artifacts.save_pickle(m1, p1)
    artifacts.save_pickle(m2, p2)

    out_path = str(tmp_path / "combined.p")
    combined = combine_cluster_maps([p1, p2], out_path, hemis=["left"])

    # OR of (value > 0), NaN treated as background
    np.testing.assert_array_equal(combined["left"], [1.0, 1.0, 0.0, 1.0])
    # pickle + per-hemi gifti artifacts exist and agree
    assert os.path.isfile(out_path)
    gii = out_path.replace(".p", "_lh.gii")
    assert os.path.isfile(gii)
    np.testing.assert_array_equal(
        read_gifti(gii).darrays[0].data, combined["left"].astype(np.float32)
    )


def test_apply_manual_corrections_zeroes_without_mutation():
    mask = {"left": np.array([1.0, 1.0, 1.0]), "right": np.array([1.0, 1.0])}
    out = apply_manual_corrections(mask, {"left": [0, 2]})
    np.testing.assert_array_equal(out["left"], [0.0, 1.0, 0.0])
    np.testing.assert_array_equal(out["right"], [1.0, 1.0])
    # input untouched (the reference mutates in place; we keep it pure)
    np.testing.assert_array_equal(mask["left"], [1.0, 1.0, 1.0])


def test_stage_timer_and_device_trace_noop():
    from multimodal_decoding_tpu.utils.profiling import StageTimer, device_trace

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert set(t.stages) == {"a", "b"}
    assert all(v >= 0.0 for v in t.stages.values())
    rep = t.report()
    assert "a:" in rep and "total" in rep

    with device_trace(None):  # no-op path must not import jax.profiler
        x = 1
    assert x == 1
