"""Preprocessing stage contracts: beta symlinks, masks, events, SPM job, commands."""

import os

import numpy as np

from multimodal_decoding_tpu.io.nifti import read_nifti, write_nifti
from multimodal_decoding_tpu.preprocessing import beta_symlinks, events, masks, spm_design
from multimodal_decoding_tpu.viz.freeview import build_freeview_command


def test_beta_symlinks(tmp_path, rng):
    betas_dir = str(tmp_path / "sub-01")
    os.makedirs(os.path.join(betas_dir, "unstructured"))
    cases = [
        ("beta_0001.nii", "Sn(1) train_image_123456*bf(1)", "train_image", 123456),
        ("beta_0002.nii", "Sn(1) train_caption_99*bf(1)", "train_caption", 99),
        ("beta_0003.nii", "Sn(1) test_image_3862*bf(1)", "test_image", 3862),
        ("beta_0004.nii", "Sn(1) imagery_2*bf(1)", "imagery", 2),
        ("beta_0005.nii", "Sn(1) blank*bf(1)", "blank", None),
        ("beta_0006.nii", "Sn(1) one_back stuff", None, None),  # skipped
    ]
    for fname, descrip, _, _ in cases:
        write_nifti(
            os.path.join(betas_dir, "unstructured", fname),
            rng.randn(2, 2, 2).astype(np.float32),
            descrip=descrip,
        )

    n = beta_symlinks.create_symlinks_for_beta_files(betas_dir)
    assert n == 5
    assert os.path.islink(os.path.join(betas_dir, "betas_train_image", "beta_123456.nii"))
    assert os.path.islink(os.path.join(betas_dir, "betas_imagery", "beta_000002.nii"))
    assert os.path.islink(os.path.join(betas_dir, "betas_blank", "beta_blank.nii"))
    # links resolve and carry the data
    img = read_nifti(os.path.join(betas_dir, "betas_test_image", "beta_003862.nii"))
    assert img.data.shape == (2, 2, 2)


def test_parse_beta_descrip():
    assert beta_symlinks.parse_beta_descrip("x train_image_42*bf(1)") == ("train_image", 42)
    assert beta_symlinks.parse_beta_descrip("x blank*bf(1)") == ("blank", None)
    assert beta_symlinks.parse_beta_descrip("unrelated") == (None, None)


def test_gray_matter_mask(tmp_path, rng):
    c1 = rng.rand(4, 4, 4).astype(np.float32)
    c1[0] = 0.0
    write_nifti(str(tmp_path / "c1.nii"), c1)
    mask = masks.create_gray_matter_mask(str(tmp_path / "c1.nii"), str(tmp_path / "mask.nii"))
    assert mask.dtype == np.uint8
    np.testing.assert_array_equal(mask, (c1 > 0).astype(np.uint8))
    back = read_nifti(str(tmp_path / "mask.nii"))
    np.testing.assert_array_equal(back.data, mask)


def test_event_condition_names():
    assert events.condition_name("stimulus", "train", "image", 42) == "train_image_42"
    assert events.condition_name("stimulus", "imagery", None, 2) == "imagery_2"
    assert events.condition_name("one_back", None, None, None) == "one_back"
    assert events.condition_name("fixation", None, None, None) == "blank"


def test_concatenated_run_onsets():
    runs = [[{"onset": 1.0}, {"onset": 5.0}], [{"onset": 2.0}]]
    out = events.concatenated_run_onsets(runs, [100.0, 80.0])
    assert [e["onset"] for e in out] == [1.0, 5.0, 102.0]


def test_one_back_error_rates():
    evs = (
        [{"trial_type": "one_back", "response": True}] * 3
        + [{"trial_type": "one_back", "response": False}]
        + [{"trial_type": "stimulus", "response": False}] * 8
        + [{"trial_type": "stimulus", "response": True}] * 2
    )
    out = events.one_back_error_rates(evs)
    assert out["hit_rate"] == 0.75
    assert out["miss_rate"] == 0.25
    assert out["false_alarm_rate"] == 0.2


def test_framewise_displacement():
    mp = np.zeros((4, 6))
    mp[1, 0] = 1.0  # 1mm translation jump
    mp[2, 3] = 0.01  # 0.01 rad rotation -> 0.5mm at 50mm radius
    fd = events.framewise_displacement(mp)
    assert fd[0] == 0.0
    assert abs(fd[1] - 1.0) < 1e-12
    assert abs(fd[2] - (1.0 + 0.5)) < 1e-12  # undo translation + rotation


def test_spm_job_roundtrip(tmp_path):
    evs = [
        [{"onset": 0.0, "duration": 2.0, "split": "train", "modality": "image", "stim_id": 5},
         {"onset": 4.0, "duration": 2.0, "trial_type": "one_back"}],
        [{"onset": 1.0, "duration": 2.0, "split": "test", "modality": "caption", "stim_id": 9}],
    ]
    motion = [np.zeros((10, 6)), np.ones((8, 6))]
    job = spm_design.make_spm_job(
        evs, [15.0, 12.0], motion, scans=["run1.nii", "run2.nii"],
        mask_path="mask.nii", out_dir=str(tmp_path),
    )
    fmri_spec = job["matlabbatch"]["spm"]["stats"]["fmri_spec"]
    assert fmri_spec["cvi"] == "AR(1)"
    assert fmri_spec["sess"]["hpf"] == 128.0
    # nuisance: 6 motion + (n_runs - 1) run indicators
    assert fmri_spec["sess"]["regress"]["val"].shape == (18, 7)
    # condition names include the split vocabulary; onsets concatenated
    names = [c["name"] for c in fmri_spec["sess"]["cond"]]
    assert "train_image_5" in names and "test_caption_9" in names and "one_back" in names
    cond = {c["name"]: c for c in fmri_spec["sess"]["cond"]}
    assert cond["test_caption_9"]["onset"][0, 0] == 16.0  # 1.0 + 15.0

    path = str(tmp_path / "job.mat")
    spm_design.save_spm_job(job, path)
    from scipy.io import loadmat

    mat = loadmat(path)
    assert "matlabbatch" in mat


def test_surface_transform_commands(tmp_path):
    from multimodal_decoding_tpu.preprocessing.surface_transform import (
        recon_all_command,
        vol2surf_command,
    )

    cmd = vol2surf_command("in.nii", "out.gii", "left", "sub-01")
    assert "--hemi lh" in cmd and "--trgsubject fsaverage" in cmd
    assert "--projfrac-avg 0 1 0.2" in cmd and "--regheader sub-01" in cmd
    assert "recon-all -s sub-01 -i nu.nii -all" == recon_all_command("sub-01", "nu.nii")


def test_freeview_command():
    cmd = build_freeview_command(
        "/subjects", {"left": ["acc_lh.gii"], "right": ["acc_rh.gii"]},
        annot="aparc.annot", overlay_threshold=(0.55, 0.7),
    )
    assert cmd.startswith("freeview ")
    assert "lh.inflated:overlay=acc_lh.gii:overlay_threshold=0.55,0.7:annot=" in cmd
    assert "rh.inflated:overlay=acc_rh.gii" in cmd
