"""Round-2 extractor completions: FLAVA multimodal keys, BLIP-2 Q-Former
recipe, PaliGemma three-forward recipe, big-LM torch pooling, VisualBERT
two-stage box selection, and registry completeness vs config.DEFAULT_FEATURES.

All model tests use tiny random-init configs (zero-egress environment);
they verify the pooling recipes and output schema, not pretrained values.
"""

import numpy as np
import pytest

from multimodal_decoding_tpu.config import (
    DEFAULT_FEATURES,
    FUSED_CLS_FEAT_KEY,
    FUSED_MEAN_FEAT_KEY,
    LANG_CLS_FEAT_KEY,
    LANG_MEAN_FEAT_KEY,
    VISION_CLS_FEAT_KEY,
    VISION_MEAN_FEAT_KEY,
)
from multimodal_decoding_tpu.extraction import visualbert as VB
from multimodal_decoding_tpu.extraction.extractors import REGISTRY

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _images(n, size=24):
    from PIL import Image

    rng = np.random.RandomState(0)
    return [
        Image.fromarray(rng.randint(0, 255, (size, size, 3), dtype=np.uint8))
        for _ in range(n)
    ]


def test_registry_covers_every_default_features_model():
    """No DEFAULT_FEATURES key without an extraction story (VERDICT #6)."""
    for model in DEFAULT_FEATURES:
        base = model[len("random-"):] if model.startswith("random-") else model
        assert base in REGISTRY or base == "gabor", f"{model} unresolvable"


def test_special_build_paths_raise_with_guidance():
    from multimodal_decoding_tpu.extraction.extractors import build_extractor

    with pytest.raises(ValueError, match="visualbert"):
        build_extractor("visualbert")
    # imagebind is in-framework since round 3, but pretrained mode still
    # needs the official checkpoint file (zero-egress box: clear error)
    with pytest.raises(FileNotFoundError, match="IMAGEBIND_CKPT"):
        build_extractor("imagebind")


def test_flava_extractor_emits_multimodal_keys():
    from transformers import FlavaConfig, FlavaModel

    from multimodal_decoding_tpu.extraction.extractors import make_flava_extractor

    tiny = dict(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=32)
    cfg = FlavaConfig(
        image_config=dict(image_size=24, patch_size=8, **tiny),
        text_config=dict(vocab_size=50, max_position_embeddings=16, **tiny),
        multimodal_config=dict(**tiny),
        hidden_size=16, projection_dim=8,
    )
    model = FlavaModel(cfg)

    class StubProcessor:
        def __call__(self, text=None, images=None, return_tensors="pt", padding=True):
            ids = torch.zeros((len(text), 6), dtype=torch.long)
            for i, t in enumerate(text):
                for j, w in enumerate(t.split()[:6]):
                    ids[i, j] = hash(w) % 50
            pixel = torch.stack([
                torch.as_tensor(
                    np.asarray(im.resize((24, 24)), dtype=np.float32).transpose(2, 0, 1)
                ) / 255.0
                for im in images
            ])
            return {"input_ids": ids, "attention_mask": torch.ones_like(ids),
                    "pixel_values": pixel}

    out = make_flava_extractor(model, StubProcessor())(
        [1, 2], ["a cat", "a dog sits"], _images(2)
    )
    assert set(out) == {LANG_CLS_FEAT_KEY, VISION_CLS_FEAT_KEY,
                        FUSED_MEAN_FEAT_KEY, FUSED_CLS_FEAT_KEY}
    # projected embeds are L2-normalized (extract_flava_features.py:39-42)
    np.testing.assert_allclose(np.linalg.norm(out[LANG_CLS_FEAT_KEY], axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out[VISION_CLS_FEAT_KEY], axis=1), 1.0,
                               atol=1e-5)
    assert out[FUSED_MEAN_FEAT_KEY].shape == (2, 16)
    assert np.all(np.isfinite(out[FUSED_CLS_FEAT_KEY]))


def test_blip2_extractor_qformer_modes():
    from transformers import Blip2Config, Blip2ForImageTextRetrieval

    from multimodal_decoding_tpu.extraction.extractors import make_blip2_extractor

    cfg = Blip2Config(
        vision_config=dict(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                           intermediate_size=32, image_size=24, patch_size=8),
        qformer_config=dict(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            encoder_hidden_size=16, max_position_embeddings=32,
                            use_qformer_text_input=True),
        num_query_tokens=4, image_text_hidden_size=8,
    )
    model = Blip2ForImageTextRetrieval(cfg)

    class StubProcessor:
        def __call__(self, text=None, images=None, return_tensors="pt", padding=True):
            ids = torch.zeros((len(text), 5), dtype=torch.long)
            mask = torch.zeros((len(text), 5), dtype=torch.long)
            for i, t in enumerate(text):
                ws = t.split()[:5]
                for j, w in enumerate(ws):
                    ids[i, j] = hash(w) % 50
                mask[i, : len(ws)] = 1
            pixel = torch.stack([
                torch.as_tensor(
                    np.asarray(im.resize((24, 24)), dtype=np.float32).transpose(2, 0, 1)
                ) / 255.0
                for im in images
            ])
            return {"input_ids": ids, "attention_mask": mask, "pixel_values": pixel}

    out = make_blip2_extractor(model, StubProcessor())(
        [1, 2], ["a cat", "a dog sits here"], _images(2)
    )
    assert set(out) == {LANG_CLS_FEAT_KEY, VISION_CLS_FEAT_KEY,
                        FUSED_MEAN_FEAT_KEY, FUSED_CLS_FEAT_KEY}
    # projected CLS embeds are L2-normalized (LAVIS *_proj semantics)
    np.testing.assert_allclose(np.linalg.norm(out[LANG_CLS_FEAT_KEY], axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out[VISION_CLS_FEAT_KEY], axis=1), 1.0,
                               atol=1e-5)
    # fused keys come from the 4 query positions of the qformer
    assert out[FUSED_MEAN_FEAT_KEY].shape == (2, 16)


def test_paligemma_extractor_three_forwards():
    from transformers import PaliGemmaConfig, PaliGemmaForConditionalGeneration

    from multimodal_decoding_tpu.extraction.extractors import make_paligemma_extractor

    img_tok, n_img = 60, 9  # (24 / 8)^2 patches
    cfg = PaliGemmaConfig(
        vision_config=dict(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                           intermediate_size=32, image_size=24, patch_size=8,
                           projection_dim=16),
        text_config=dict(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=1,
                         intermediate_size=32, max_position_embeddings=64),
        image_token_index=img_tok, projection_dim=16,
    )
    model = PaliGemmaForConditionalGeneration(cfg)

    class StubTokenizer:
        bos_token = "<bos>"

        def __call__(self, texts, return_token_type_ids=False, return_tensors="pt",
                     padding=True):
            toks = [[hash(w) % 50 for w in t.split()][:6] for t in texts]
            maxlen = max(len(t) for t in toks)
            ids = torch.zeros((len(toks), maxlen), dtype=torch.long)
            mask = torch.zeros((len(toks), maxlen), dtype=torch.long)
            for i, t in enumerate(toks):
                ids[i, : len(t)] = torch.as_tensor(t)
                mask[i, : len(t)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    class StubProcessor:
        tokenizer = StubTokenizer()
        image_seq_length = n_img

        def __call__(self, text=None, images=None, return_tensors="pt", padding=True):
            txt = self.tokenizer([t.replace("<image>", "x") for t in text])
            ids = torch.cat(
                [torch.full((len(text), n_img), img_tok, dtype=torch.long),
                 txt["input_ids"]], dim=1
            )
            mask = torch.cat(
                [torch.ones((len(text), n_img), dtype=torch.long),
                 txt["attention_mask"]], dim=1
            )
            pixel = torch.stack([
                torch.as_tensor(
                    np.asarray(im.resize((24, 24)), dtype=np.float32).transpose(2, 0, 1)
                ) / 255.0
                for im in images
            ])
            return {"input_ids": ids, "attention_mask": mask, "pixel_values": pixel}

    out = make_paligemma_extractor(model, StubProcessor())(
        [1, 2], ["a cat", "two dogs play"], _images(2)
    )
    assert set(out) == {LANG_MEAN_FEAT_KEY, VISION_MEAN_FEAT_KEY,
                        VISION_CLS_FEAT_KEY, FUSED_MEAN_FEAT_KEY}
    for v in out.values():
        assert v.shape == (2, 16) and np.all(np.isfinite(v))


def test_torch_lm_extractor_masked_mean():
    from transformers import LlamaConfig, LlamaModel

    from multimodal_decoding_tpu.extraction.extractors import make_torch_lm_extractor

    cfg = LlamaConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=32)
    model = LlamaModel(cfg)

    class StubTokenizer:
        pad_token = "[PAD]"
        eos_token = "[EOS]"

        def __call__(self, texts, return_tensors="pt", padding=True):
            toks = [[hash(w) % 50 for w in t.split()][:8] for t in texts]
            maxlen = max(len(t) for t in toks)
            ids = torch.zeros((len(toks), maxlen), dtype=torch.long)
            mask = torch.zeros((len(toks), maxlen), dtype=torch.long)
            for i, t in enumerate(toks):
                ids[i, : len(t)] = torch.as_tensor(t)
                mask[i, : len(t)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    extract = make_torch_lm_extractor(model, StubTokenizer())
    out = extract([1, 2], ["hello world", "a longer caption with more words"], None)
    assert out[LANG_MEAN_FEAT_KEY].shape == (2, 16)
    # masked-mean parity: padding must not change the pooled value
    single = extract([1], ["hello world"], None)
    np.testing.assert_allclose(out[LANG_MEAN_FEAT_KEY][0],
                               single[LANG_MEAN_FEAT_KEY][0], atol=2e-5)


# ---------------------------------------------------------------------------
# VisualBERT two-stage
# ---------------------------------------------------------------------------


def test_nms_greedy_iou():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], dtype=float)
    scores = np.array([0.9, 0.8, 0.7])
    keep = VB.nms(boxes, scores, iou_threshold=0.5)
    assert list(keep) == [0, 2]  # box 1 overlaps box 0 heavily, suppressed
    # with a high threshold nothing is suppressed
    assert len(VB.nms(boxes, scores, iou_threshold=0.99)) == 3


def test_select_boxes_bounds():
    conf = np.linspace(0, 1, 50)
    # few above threshold -> padded to min_boxes by rank
    keep = VB.select_boxes(conf, score_threshold=0.99, min_boxes=10, max_boxes=20)
    assert len(keep) == 10 and conf[keep].min() >= np.sort(conf)[-10]
    # many above threshold -> truncated to max_boxes
    keep = VB.select_boxes(conf, score_threshold=0.01, min_boxes=10, max_boxes=20)
    assert len(keep) == 20
    # in-range count passes through unchanged
    keep = VB.select_boxes(conf, score_threshold=0.75, min_boxes=5, max_boxes=20)
    assert len(keep) == (conf >= 0.75).sum()


def test_extract_region_features_with_fake_detector(tmp_path):
    rng = np.random.RandomState(0)
    n_regions, n_classes, d = 30, 4, 12

    def detector(image):
        probs = rng.dirichlet(np.ones(n_classes + 1), size=n_regions)
        boxes = rng.rand(n_regions, n_classes, 4) * 50
        boxes[..., 2:] += boxes[..., :2]  # valid x2>x1, y2>y1
        feats = rng.randn(n_regions, d)
        return probs, boxes, feats

    cache = str(tmp_path / "maskrcnn_feats.p")
    feats = VB.extract_region_features(
        [7, 8], [None, None], detector, cache_path=cache, min_boxes=5, max_boxes=9
    )
    assert set(feats) == {7, 8}
    for v in feats.values():
        assert 5 <= v.shape[0] <= 9 and v.shape[1] == d
    # cache hit: detector not called again (would advance rng otherwise)
    again = VB.extract_region_features([7, 8], [None, None], detector, cache_path=cache)
    np.testing.assert_array_equal(again[7], feats[7])


def test_visualbert_stage2_pooling():
    from transformers import VisualBertConfig, VisualBertModel

    cfg = VisualBertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, visual_embedding_dim=12, max_position_embeddings=64,
    )
    model = VisualBertModel(cfg)

    class StubTokenizer:
        def __call__(self, texts, padding=True, return_tensors="pt"):
            toks = [[hash(w) % 50 for w in t.split()][:6] for t in texts]
            maxlen = max(len(t) for t in toks)
            ids = torch.zeros((len(toks), maxlen), dtype=torch.long)
            mask = torch.zeros((len(toks), maxlen), dtype=torch.long)
            for i, t in enumerate(toks):
                ids[i, : len(t)] = torch.as_tensor(t)
                mask[i, : len(t)] = 1
            return {"input_ids": ids, "attention_mask": mask,
                    "token_type_ids": torch.zeros_like(ids)}

    rng = np.random.RandomState(1)
    regions = {1: rng.randn(7, 12).astype(np.float32),
               2: rng.randn(7, 12).astype(np.float32)}
    extract = VB.make_visualbert_extractor(model, StubTokenizer(), regions)
    out = extract([1, 2], ["a cat sat", "dogs"], None)
    assert set(out) == {FUSED_MEAN_FEAT_KEY, FUSED_CLS_FEAT_KEY}
    assert out[FUSED_MEAN_FEAT_KEY].shape == (2, 16)
    assert np.all(np.isfinite(out[FUSED_MEAN_FEAT_KEY]))


def test_vilt_fused_extractor_tiny():
    """make_torch_fused_extractor on a tiny ViLT: padding-aware fused mean
    (extract_vilt_features.py:31-51 recipe)."""
    from transformers import ViltConfig, ViltModel

    from multimodal_decoding_tpu.extraction.extractors import (
        make_torch_fused_extractor,
    )

    cfg = ViltConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32, image_size=32, patch_size=16)
    model = ViltModel(cfg)

    class StubProcessor:
        def __call__(self, images=None, text=None, return_tensors="pt",
                     padding=True, truncation=True):
            ids = torch.zeros((len(text), 6), dtype=torch.long)
            mask = torch.zeros((len(text), 6), dtype=torch.long)
            for i, t in enumerate(text):
                ws = t.split()[:6]
                for j, w in enumerate(ws):
                    ids[i, j] = hash(w) % 50
                mask[i, : len(ws)] = 1
            pixel = torch.stack([
                torch.as_tensor(
                    np.asarray(im.resize((32, 32)), dtype=np.float32).transpose(2, 0, 1)
                ) / 255.0
                for im in images
            ])
            return {"input_ids": ids, "attention_mask": mask, "pixel_values": pixel,
                    "pixel_mask": torch.ones((len(images), 32, 32), dtype=torch.long)}

    out = make_torch_fused_extractor(model, StubProcessor())(
        [1, 2], ["a cat", "two dogs play fetch"], _images(2, size=32)
    )
    assert out[FUSED_MEAN_FEAT_KEY].shape == (2, 16)
    assert out[FUSED_CLS_FEAT_KEY].shape == (2, 16)
    assert np.all(np.isfinite(out[FUSED_MEAN_FEAT_KEY]))


def test_siglip_dual_encoder_tiny():
    """make_torch_dual_encoder_extractor on a tiny SigLIP."""
    from transformers import SiglipConfig, SiglipModel

    from multimodal_decoding_tpu.extraction.extractors import (
        make_torch_dual_encoder_extractor,
    )

    cfg = SiglipConfig(
        text_config=dict(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=16),
        vision_config=dict(hidden_size=16, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=32,
                           image_size=24, patch_size=8),
    )
    model = SiglipModel(cfg)

    class StubProcessor:
        def __call__(self, text=None, images=None, return_tensors="pt", padding=True):
            ids = torch.zeros((len(text), 6), dtype=torch.long)
            for i, t in enumerate(text):
                for j, w in enumerate(t.split()[:6]):
                    ids[i, j] = hash(w) % 50
            pixel = torch.stack([
                torch.as_tensor(
                    np.asarray(im.resize((24, 24)), dtype=np.float32).transpose(2, 0, 1)
                ) / 255.0
                for im in images
            ])
            return {"input_ids": ids, "pixel_values": pixel}

    out = make_torch_dual_encoder_extractor(model, StubProcessor())(
        [1, 2], ["a cat", "a dog"], _images(2)
    )
    assert out[LANG_CLS_FEAT_KEY].shape == (2, 16)
    assert out[VISION_CLS_FEAT_KEY].shape == (2, 16)
    assert np.all(np.isfinite(out[VISION_CLS_FEAT_KEY]))
