"""Feature extraction: harness loop, pickle schema, Flax extractors (tiny
random-init configs — no downloads), Gabor bank parity vs scipy."""

import os
import pickle

import numpy as np
import pytest

from multimodal_decoding_tpu.config import (
    LANG_CLS_FEAT_KEY,
    LANG_MEAN_FEAT_KEY,
    VISION_CLS_FEAT_KEY,
    VISION_MEAN_FEAT_KEY,
)
from multimodal_decoding_tpu.extraction import gabor as G
from multimodal_decoding_tpu.extraction.harness import (
    StimuliDataset,
    import_external_features,
    run_extraction,
)


def make_dataset(tmp_path, n=7):
    """Dataset with in-memory images (bypasses CSV/coco files)."""
    from PIL import Image

    ds = StimuliDataset(
        img_paths={100 + i: f"img_{i}.jpg" for i in range(n)},
        captions={100 + i: f"a photo of thing number {i}" for i in range(n)},
        root=str(tmp_path),
    )
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, (32, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(str(tmp_path), f"img_{i}.jpg"))
    return ds


def test_harness_pickle_schema(tmp_path):
    ds = make_dataset(tmp_path)

    def extract(ids, captions, images):
        assert len(ids) <= 3
        return {
            VISION_CLS_FEAT_KEY: np.ones((len(ids), 4), dtype=np.float32) * np.asarray(ids)[:, None],
            LANG_CLS_FEAT_KEY: np.zeros((len(ids), 4), dtype=np.float32),
        }

    out_path = str(tmp_path / "toy.p")
    feats = run_extraction(extract, "toy", ds, batch_size=3, out_path=out_path, progress=False)
    with open(out_path, "rb") as f:
        stored = pickle.load(f)
    assert set(stored) == set(ds.stimuli_ids)
    for sid in ds.stimuli_ids:
        assert stored[sid][VISION_CLS_FEAT_KEY].dtype == np.float32
        assert stored[sid][VISION_CLS_FEAT_KEY][0] == sid
    assert feats.keys() == stored.keys()


def test_external_feature_import(tmp_path):
    ids = [5, 9, 11]
    arr = np.arange(9, dtype=np.float32).reshape(3, 3)
    out = str(tmp_path / "glow.p")
    feats = import_external_features(ids, {LANG_CLS_FEAT_KEY: arr}, "glow", out_path=out)
    assert np.allclose(feats[9][LANG_CLS_FEAT_KEY], arr[1])
    with open(out, "rb") as f:
        assert np.allclose(pickle.load(f)[11][LANG_CLS_FEAT_KEY], arr[2])


def test_flax_lm_extractor_tiny(tmp_path):
    """FlaxBertModel with a tiny random config + a stub tokenizer."""
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, FlaxBertModel

    from multimodal_decoding_tpu.extraction.extractors import make_lm_extractor

    cfg = BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=32,
    )
    model = FlaxBertModel(cfg)

    class StubTokenizer:
        pad_token = "[PAD]"
        eos_token = "[EOS]"

        def __call__(self, texts, return_tensors="np", padding=True):
            toks = [[hash(w) % 50 for w in t.split()][:8] for t in texts]
            maxlen = max(len(t) for t in toks)
            ids = np.zeros((len(toks), maxlen), dtype=np.int32)
            mask = np.zeros((len(toks), maxlen), dtype=np.int32)
            for i, t in enumerate(toks):
                ids[i, : len(t)] = t
                mask[i, : len(t)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    extract = make_lm_extractor(model, StubTokenizer())
    out = extract([1, 2], ["hello world", "a longer caption with more words"], None)
    assert out[LANG_MEAN_FEAT_KEY].shape == (2, 16)
    assert out[LANG_CLS_FEAT_KEY].shape == (2, 16)
    assert np.all(np.isfinite(out[LANG_MEAN_FEAT_KEY]))

    # masked mean parity: unpadded row mean == padded batched mean
    single = extract([1], ["hello world"], None)
    np.testing.assert_allclose(
        out[LANG_MEAN_FEAT_KEY][0], single[LANG_MEAN_FEAT_KEY][0], atol=2e-5
    )


def test_gabor_kernel_formula():
    """Our gabor_kernel matches the documented skimage formulation."""
    k = G.gabor_kernel(frequency=0.25, theta=np.pi / 4, sigma_x=3, sigma_y=3)
    assert k.shape[0] % 2 == 1 and k.shape[1] % 2 == 1
    # DC kernel (frequency 0) is a pure gaussian: symmetric, positive
    k0 = G.gabor_kernel(frequency=0, theta=0.3, sigma_x=2, sigma_y=2)
    assert np.all(k0 > 0)
    np.testing.assert_allclose(k0, k0[::-1, ::-1], atol=1e-12)
    # normalised gaussian sums to ~1 (truncated at 3 stds)
    assert abs(k0.sum() - 1.0) < 5e-3


def test_gabor_features_match_scipy(rng):
    """Device conv (wrap) + mean/var pooling == scipy.ndimage reference."""
    from scipy import ndimage

    kernels = G.make_gabor_filterbank()[:6]  # subset: keep the test fast
    bank = G._padded_bank(kernels)
    imgs = rng.rand(2, 40, 40).astype(np.float32) * 255

    ours = G.compute_gabor_feats_batch(imgs, bank)
    for b in range(2):
        ref = []
        for k in kernels:
            filt = ndimage.convolve(imgs[b].astype(np.float64), k, mode="wrap")
            ref += [filt.mean(), filt.var()]
        np.testing.assert_allclose(ours[b], np.asarray(ref), rtol=2e-3, atol=2e-2)


def test_gabor_extractor_end_to_end(tmp_path):
    ds = make_dataset(tmp_path, n=2)
    extract = G.make_gabor_extractor(img_size=64)
    out_path = str(tmp_path / "gabor.p")
    feats = run_extraction(extract, "gabor", ds, batch_size=2, out_path=out_path, progress=False)
    any_id = ds.stimuli_ids[0]
    assert feats[any_id][VISION_CLS_FEAT_KEY].shape == (320,)
    assert feats[any_id][LANG_CLS_FEAT_KEY].shape == (320,)
    assert np.all(np.isfinite(feats[any_id][VISION_CLS_FEAT_KEY]))


def test_flax_clip_extractor_tiny(tmp_path):
    """FlaxCLIPModel with a tiny random config + a stub processor."""
    pytest.importorskip("transformers")
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig, FlaxCLIPModel

    from multimodal_decoding_tpu.extraction.extractors import make_clip_extractor

    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(vocab_size=60, hidden_size=16, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=32,
                       max_position_embeddings=16, projection_dim=8),
        CLIPVisionConfig(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=32, image_size=24, patch_size=8,
                         projection_dim=8),
        projection_dim=8,
    )
    model = FlaxCLIPModel(cfg)

    class StubProcessor:
        def __call__(self, text=None, images=None, return_tensors="np", padding=True):
            toks = [[hash(w) % 60 for w in t.split()][:8] for t in text]
            maxlen = max(len(t) for t in toks)
            ids = np.zeros((len(toks), maxlen), dtype=np.int32)
            mask = np.zeros((len(toks), maxlen), dtype=np.int32)
            for i, t in enumerate(toks):
                ids[i, : len(t)] = t
                mask[i, : len(t)] = 1
            pixel = np.stack(
                [np.asarray(im.resize((24, 24)), dtype=np.float32).transpose(2, 0, 1) / 255.0
                 for im in images]
            )
            return {"input_ids": ids, "attention_mask": mask, "pixel_values": pixel}

    ds = make_dataset(tmp_path, n=4)
    extract = make_clip_extractor(model, StubProcessor())
    feats = run_extraction(extract, "tiny-clip", ds, batch_size=2,
                           out_path=str(tmp_path / "clip.p"), progress=False)
    v = feats[ds.stimuli_ids[0]]
    assert v[VISION_CLS_FEAT_KEY].shape == (8,)
    assert v[LANG_CLS_FEAT_KEY].shape == (8,)
    assert np.all(np.isfinite(v[VISION_CLS_FEAT_KEY]))


def test_motion_energy_pyramid(tmp_path, rng):
    from multimodal_decoding_tpu.extraction import motion_energy as ME

    sin_b, cos_b, channels = ME.build_spatial_pyramid(32)
    assert len(channels) == len(sin_b) == len(cos_b)
    # DC level has one center/orientation; high sf levels have many positions
    sfs = [c["sf"] for c in channels]
    assert sfs.count(0) == 1 and sfs.count(16) > sfs.count(2)

    imgs = rng.rand(3, 32, 32).astype(np.float32) * 255
    feats = ME.motion_energy_features(imgs, sin_b, cos_b)
    assert feats.shape == (3, len(channels))
    assert np.all(feats >= 0) and np.all(np.isfinite(feats))

    # energy is phase-invariant: shifting a grating along its own direction
    # barely changes the quadrature energy (the defining moten property)
    x = np.mgrid[0:32, 0:32][1].astype(np.float32)
    freq = 4 / 32.0
    g0 = np.sin(2 * np.pi * freq * x)
    g1 = np.sin(2 * np.pi * freq * x + np.pi / 2)
    e0 = ME.motion_energy_features(g0[None], sin_b, cos_b)[0]
    e1 = ME.motion_energy_features(g1[None], sin_b, cos_b)[0]
    strong = e0 > 0.25 * e0.max()
    rel = np.abs(e0[strong] - e1[strong]) / e0[strong]
    assert np.median(rel) < 0.15

    # luminance conversion
    rgb = rng.randint(0, 255, (4, 4, 3), dtype=np.uint8)
    lum = ME.rgb_to_luminance(rgb)
    assert lum.shape == (4, 4)
    np.testing.assert_allclose(
        lum[0, 0], 0.299 * rgb[0, 0, 0] + 0.587 * rgb[0, 0, 1] + 0.114 * rgb[0, 0, 2],
        rtol=1e-5,
    )


def test_motion_energy_extractor(tmp_path):
    from multimodal_decoding_tpu.extraction.motion_energy import make_motion_energy_extractor

    ds = make_dataset(tmp_path, n=2)
    extract = make_motion_energy_extractor(img_size=32)
    feats = run_extraction(extract, "moten", ds, batch_size=2,
                           out_path=str(tmp_path / "moten.p"), progress=False)
    v = feats[ds.stimuli_ids[0]]
    assert v[VISION_CLS_FEAT_KEY].ndim == 1 and len(v[VISION_CLS_FEAT_KEY]) > 50
    assert np.all(np.isfinite(v[LANG_CLS_FEAT_KEY]))
