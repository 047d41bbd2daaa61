"""FreeSurfer .annot roundtrip + ROI mask derivation."""

import numpy as np

from multimodal_decoding_tpu.io import annot as A


def test_annot_roundtrip(tmp_path, rng):
    names = ["unknown", "V1", "MT"]
    colors = np.array([[0, 0, 0, 0], [20, 30, 40, 0], [100, 5, 1, 0]])
    packed = colors[:, 0] + colors[:, 1] * 256 + colors[:, 2] * 65536
    labels = packed[rng.randint(0, 3, size=50)]

    path = str(tmp_path / "lh.test.annot")
    A.write_annot(path, labels, names, colors)
    back = A.read_annot(path)

    np.testing.assert_array_equal(back.labels, labels)
    assert back.names == names
    np.testing.assert_array_equal(back.ctab[:, 4], packed)

    mask = back.mask_for(["V1"])
    np.testing.assert_array_equal(mask, (labels == packed[1]).astype(np.uint8))

    lm = back.label_map()
    assert set(np.unique(lm)) <= {0, 1, 2}
    np.testing.assert_array_equal(lm == 2, labels == packed[2])


def test_roi_mask_dict(tmp_path, rng):
    names = ["unknown", "FFA"]
    colors = np.array([[0, 0, 0, 0], [10, 10, 10, 0]])
    packed = colors[:, 0] + colors[:, 1] * 256 + colors[:, 2] * 65536
    annots = {}
    for hemi in ("left", "right"):
        labels = packed[rng.randint(0, 2, size=20)]
        p = str(tmp_path / f"{hemi}.annot")
        A.write_annot(p, labels, names, colors)
        annots[hemi] = A.read_annot(p)
    masks = A.roi_mask_dict(annots, ["FFA"])
    assert set(masks) == {"left", "right"}
    for hemi in masks:
        assert masks[hemi].shape == (20,)

    # apply_mask compatibility
    from multimodal_decoding_tpu.data.preprocess import apply_mask

    betas = rng.randn(3, 40).astype(np.float32)
    out = apply_mask(masks, [betas])[0]
    n_sel = int(masks["left"].sum() + masks["right"].sum())
    assert out.shape == (3, n_sel)
