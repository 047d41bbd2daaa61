"""ImageBind forward parity vs stock torch modules.

The FAIR submodule is not vendored (and this box is zero-egress), so the
strongest available lock on extraction/imagebind.py is numeric parity
against a reference assembled from STOCK torch building blocks
(torch.nn.MultiheadAttention / LayerNorm / GELU / F.conv3d) — exactly the
modules the public ImageBind model composes — driven through the same
official-format state dict the converter consumes.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_decoding_tpu.extraction import imagebind as IB

torch = pytest.importorskip("torch")

TINY = IB.ImageBindConfig(
    vision_embed_dim=16, vision_layers=2, vision_heads=2,
    text_embed_dim=12, text_layers=2, text_heads=2,
    out_embed_dim=8, image_size=28, patch_size=14, n_frames=2,
    context_length=10, vocab_size=64,
)


class _TorchBlock(torch.nn.Module):
    """BlockWithMasking from stock modules, loaded from sd names."""

    def __init__(self, sd, prefix, d, heads, mlp):
        super().__init__()
        self.norm_1 = torch.nn.LayerNorm(d, eps=1e-6)
        self.norm_2 = torch.nn.LayerNorm(d, eps=1e-6)
        self.attn = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        self.fc1 = torch.nn.Linear(d, mlp)
        self.fc2 = torch.nn.Linear(mlp, d)
        with torch.no_grad():
            for name, mod_attr in [("norm_1", self.norm_1), ("norm_2", self.norm_2)]:
                mod_attr.weight.copy_(torch.as_tensor(sd[f"{prefix}.{name}.weight"]))
                mod_attr.bias.copy_(torch.as_tensor(sd[f"{prefix}.{name}.bias"]))
            self.attn.in_proj_weight.copy_(
                torch.as_tensor(sd[f"{prefix}.attn.in_proj_weight"]))
            self.attn.in_proj_bias.copy_(
                torch.as_tensor(sd[f"{prefix}.attn.in_proj_bias"]))
            self.attn.out_proj.weight.copy_(
                torch.as_tensor(sd[f"{prefix}.attn.out_proj.weight"]))
            self.attn.out_proj.bias.copy_(
                torch.as_tensor(sd[f"{prefix}.attn.out_proj.bias"]))
            self.fc1.weight.copy_(torch.as_tensor(sd[f"{prefix}.mlp.fc1.weight"]))
            self.fc1.bias.copy_(torch.as_tensor(sd[f"{prefix}.mlp.fc1.bias"]))
            self.fc2.weight.copy_(torch.as_tensor(sd[f"{prefix}.mlp.fc2.weight"]))
            self.fc2.bias.copy_(torch.as_tensor(sd[f"{prefix}.mlp.fc2.bias"]))

    def forward(self, x, mask=None):
        h = self.norm_1(x)
        x = x + self.attn(h, h, h, attn_mask=mask, need_weights=False)[0]
        h = self.norm_2(x)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))


def _torch_vision_forward(sd, cfg, pixel_values):
    x = torch.as_tensor(pixel_values)
    # PadIm2Video 'repeat' to n_frames, then real Conv3d(kernel == stride)
    x = x.unsqueeze(2).repeat(1, 1, cfg.n_frames, 1, 1)
    w = torch.as_tensor(sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"])
    p = cfg.patch_size
    tok = torch.nn.functional.conv3d(x, w, stride=(cfg.n_frames, p, p))
    tok = tok.flatten(2).transpose(1, 2)  # [B, n_patches, D]
    cls = torch.as_tensor(sd["modality_preprocessors.vision.cls_token"])
    x = torch.cat([cls.expand(tok.shape[0], -1, -1), tok], dim=1)
    x = x + torch.as_tensor(
        sd["modality_preprocessors.vision.pos_embedding_helper.pos_embed"])
    pre = torch.nn.LayerNorm(cfg.vision_embed_dim, eps=1e-6)
    with torch.no_grad():
        pre.weight.copy_(torch.as_tensor(
            sd["modality_trunks.vision.pre_transformer_layer.0.weight"]))
        pre.bias.copy_(torch.as_tensor(
            sd["modality_trunks.vision.pre_transformer_layer.0.bias"]))
    x = pre(x)
    mlp = int(cfg.vision_embed_dim * cfg.mlp_ratio)
    for i in range(cfg.vision_layers):
        blk = _TorchBlock(sd, f"modality_trunks.vision.blocks.{i}",
                          cfg.vision_embed_dim, cfg.vision_heads, mlp)
        x = blk(x)
    head_ln = torch.nn.LayerNorm(cfg.vision_embed_dim, eps=1e-6)
    with torch.no_grad():
        head_ln.weight.copy_(torch.as_tensor(sd["modality_heads.vision.0.weight"]))
        head_ln.bias.copy_(torch.as_tensor(sd["modality_heads.vision.0.bias"]))
    x = head_ln(x)[:, 0] @ torch.as_tensor(sd["modality_heads.vision.2.weight"]).T
    return x / x.norm(dim=-1, keepdim=True)


def _torch_text_forward(sd, cfg, input_ids):
    ids = torch.as_tensor(np.asarray(input_ids), dtype=torch.long)
    emb = torch.as_tensor(sd["modality_preprocessors.text.token_embedding.weight"])
    x = emb[ids] + torch.as_tensor(sd["modality_preprocessors.text.pos_embed"])
    l = cfg.context_length
    mask = torch.full((l, l), float("-inf")).triu_(1)
    mlp = int(cfg.text_embed_dim * cfg.mlp_ratio)
    for i in range(cfg.text_layers):
        blk = _TorchBlock(sd, f"modality_trunks.text.blocks.{i}",
                          cfg.text_embed_dim, cfg.text_heads, mlp)
        x = blk(x, mask)
    eos = ids.argmax(dim=-1)
    x = x[torch.arange(x.shape[0]), eos]
    head_ln = torch.nn.LayerNorm(cfg.text_embed_dim, eps=1e-6)
    with torch.no_grad():
        head_ln.weight.copy_(torch.as_tensor(sd["modality_heads.text.proj.0.weight"]))
        head_ln.bias.copy_(torch.as_tensor(sd["modality_heads.text.proj.0.bias"]))
    x = head_ln(x) @ torch.as_tensor(sd["modality_heads.text.proj.1.weight"]).T
    x = x / x.norm(dim=-1, keepdim=True)
    scale = torch.clamp(
        torch.as_tensor(sd["modality_postprocessors.text.1.log_logit_scale"]).exp(),
        max=IB.MAX_LOGIT_SCALE,
    )
    return scale * x


@pytest.fixture(scope="module")
def tiny_model():
    sd = IB.fake_torch_state_dict(TINY, seed=3)
    params = IB.params_from_torch_state_dict(sd, TINY)
    return sd, params


def test_vision_forward_matches_torch(tiny_model):
    sd, params = tiny_model
    rng = np.random.RandomState(0)
    px = rng.randn(3, 3, TINY.image_size, TINY.image_size).astype(np.float32)
    ours = np.asarray(IB.vision_forward(params, TINY, jnp.asarray(px)))
    with torch.no_grad():
        ref = _torch_vision_forward(sd, TINY, px).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_text_forward_matches_torch(tiny_model):
    sd, params = tiny_model
    rng = np.random.RandomState(1)
    ids = np.zeros((4, TINY.context_length), np.int32)
    for i, n in enumerate([3, 5, TINY.context_length - 2, 1]):
        ids[i, 0] = IB.SOT_TOKEN % TINY.vocab_size
        ids[i, 1 : 1 + n] = rng.randint(1, TINY.vocab_size - 2, n)
        ids[i, 1 + n] = TINY.vocab_size - 1  # EOT = highest id
    ours = np.asarray(IB.text_forward(params, TINY, jnp.asarray(ids)))
    with torch.no_grad():
        ref = _torch_text_forward(sd, TINY, ids).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)
    # post-processing semantics: logit-scaled unit directions
    norms = np.linalg.norm(ours, axis=-1)
    np.testing.assert_allclose(norms, TINY.logit_scale_init, rtol=1e-4)


def test_text_eos_selection_uses_argmax_not_last(tiny_model):
    """Two captions of different length must select different positions."""
    _, params = tiny_model
    ids = np.zeros((2, TINY.context_length), np.int32)
    ids[0, :3] = [5, 9, TINY.vocab_size - 1]
    ids[1, :6] = [5, 9, 2, 7, 4, TINY.vocab_size - 1]
    out = np.asarray(IB.text_forward(params, TINY, jnp.asarray(ids)))
    assert not np.allclose(out[0], out[1])


def test_extractor_schema_and_random_control():
    from PIL import Image

    from multimodal_decoding_tpu.config import LANG_CLS_FEAT_KEY, VISION_CLS_FEAT_KEY
    from multimodal_decoding_tpu.extraction.imagebind import build_imagebind

    def stub_tokenizer(texts):
        return [[(hash(w) % 60) + 1 for w in t.split()] for t in texts]

    params, cfg, extract = build_imagebind(
        pretrained=False, cfg=TINY, seed=7, tokenizer=stub_tokenizer
    )
    rng = np.random.RandomState(0)
    images = [
        Image.fromarray(rng.randint(0, 255, (32, 40, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    out = extract(["c1", "c2"], ["a dog runs", "blue sky"], images)
    assert out[LANG_CLS_FEAT_KEY].shape == (2, TINY.out_embed_dim)
    assert out[VISION_CLS_FEAT_KEY].shape == (2, TINY.out_embed_dim)
    assert np.all(np.isfinite(out[LANG_CLS_FEAT_KEY]))
    # same seed -> same control network (the reference's random-imagebind is
    # one fixed random net, not a fresh draw per run)
    params2, _, _ = build_imagebind(
        pretrained=False, cfg=TINY, seed=7, tokenizer=stub_tokenizer
    )
    np.testing.assert_array_equal(
        np.asarray(params["text"]["token_embed"]),
        np.asarray(params2["text"]["token_embed"]),
    )


def test_pretrained_without_checkpoint_raises():
    from multimodal_decoding_tpu.extraction.imagebind import build_imagebind

    with pytest.raises(FileNotFoundError, match="IMAGEBIND_CKPT"):
        build_imagebind(pretrained=True, cfg=TINY, checkpoint_path=None)


def test_checkpoint_roundtrip(tmp_path, tiny_model):
    """torch.save -> build_imagebind(pretrained=True) == direct conversion."""
    sd, params = tiny_model
    path = str(tmp_path / "imagebind_tiny.pth")
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)
    from multimodal_decoding_tpu.extraction.imagebind import build_imagebind

    loaded, _, _ = build_imagebind(
        pretrained=True, cfg=TINY, checkpoint_path=path,
        tokenizer=lambda texts: [[1] for _ in texts],
    )
    np.testing.assert_allclose(
        np.asarray(loaded["vision"]["patch_w"]),
        np.asarray(params["vision"]["patch_w"]),
    )
    np.testing.assert_allclose(
        float(loaded["text"]["log_logit_scale"]),
        float(params["text"]["log_logit_scale"]),
    )


def test_registry_builds_random_imagebind():
    from multimodal_decoding_tpu.extraction.extractors import build_extractor

    # huge config is too big for a unit test; patch the builder's default cfg
    import multimodal_decoding_tpu.extraction.imagebind as ib_mod

    orig = ib_mod.ImageBindConfig
    try:
        ib_mod.ImageBindConfig = lambda: TINY
        params, cfg, extract = build_extractor("random-imagebind")
        assert cfg is TINY and callable(extract)
    finally:
        ib_mod.ImageBindConfig = orig


def test_state_dict_validation_drift_fails_loudly():
    """Converter key-map drift guard (offline half of VERDICT r3 #6).

    The converter validates its full key map up front: missing keys, shape
    mismatches, and silently-ignored vision/text-tower keys all raise with
    explicit lists; out-of-scope modalities (audio/depth/...) are ignored
    like the reference's TEXT/VISION-only usage.
    """
    import pytest

    sd = IB.fake_torch_state_dict(TINY, seed=5)
    IB.validate_state_dict(sd, TINY)  # clean dict passes

    # extra key from another modality: fine (full checkpoint has 6 towers)
    ok = dict(sd)
    ok["modality_trunks.audio.blocks.0.attn.in_proj_weight"] = np.zeros((3, 1))
    ok["modality_preprocessors.text.mask"] = np.zeros((4, 4))  # whitelisted buffer
    IB.validate_state_dict(ok, TINY)

    # missing key
    broken = dict(sd)
    del broken["modality_heads.text.proj.1.weight"]
    with pytest.raises(ValueError, match="missing: modality_heads.text.proj.1.weight"):
        IB.validate_state_dict(broken, TINY)

    # shape mismatch
    broken = dict(sd)
    broken["modality_heads.vision.2.weight"] = np.zeros((2, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch: modality_heads.vision.2"):
        IB.validate_state_dict(broken, TINY)

    # renamed tower key == missing + unconsumed (the FAIR-rename scenario)
    broken = dict(sd)
    broken["modality_trunks.vision.blocks.0.attn.qkv.weight"] = broken.pop(
        "modality_trunks.vision.blocks.0.attn.in_proj_weight"
    )
    with pytest.raises(ValueError, match="unconsumed vision/text-tower keys"):
        IB.validate_state_dict(broken, TINY)

    # a [1]-shaped logit scale (vs scalar) is tolerated — converter reshapes
    ok = dict(sd)
    ok["modality_postprocessors.text.1.log_logit_scale"] = np.zeros(1, np.float32)
    IB.validate_state_dict(ok, TINY)

    # params_from_torch_state_dict runs the validation itself
    broken = dict(sd)
    del broken["modality_preprocessors.vision.cls_token"]
    with pytest.raises(ValueError, match="missing"):
        IB.params_from_torch_state_dict(broken, TINY)


def test_official_manifest_fixture_cross_check():
    """When the captured imagebind_huge.pth manifest fixture is present
    (tests/make_extractor_goldens.py --real on a networked host), verify the
    converter's expected key map against the OFFICIAL checkpoint's."""
    import json

    import pytest

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "imagebind_state_manifest.json")
    if not os.path.isfile(path):
        pytest.skip("official manifest fixture not captured yet (zero-egress box)")
    with open(path) as f:
        official = {k: tuple(v) for k, v in json.load(f).items()}
    cfg = IB.ImageBindConfig()  # imagebind_huge defaults
    expected = IB.expected_state_dict_manifest(cfg)
    missing = [k for k in expected if k not in official]
    mismatched = {
        k: (expected[k], official[k])
        for k in expected
        if k in official and official[k] != expected[k]
        and not (k.endswith("log_logit_scale")
                 and int(np.prod(official[k] or (1,))) == 1)
    }
    unconsumed = [
        k for k in official
        if k.startswith(IB._TOWER_PREFIXES)
        and k not in expected and k not in IB.STATE_DICT_BUFFER_WHITELIST
    ]
    assert not missing, f"converter expects keys absent from the official ckpt: {missing[:10]}"
    assert not mismatched, f"shape drift vs official ckpt: {mismatched}"
    assert not unconsumed, f"official tower keys the converter ignores: {unconsumed[:10]}"
