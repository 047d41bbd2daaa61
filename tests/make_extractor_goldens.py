"""Generate golden output fixtures for representative extractors.

Zero-egress substitute for recorded pretrained-weight tensors (VERDICT round
1, next-round #7): seeded tiny random-init models + fixed inputs, with the
extractor outputs recorded to tests/fixtures/extractor_goldens.npz.  The
companion test (test_extractor_goldens.py) recomputes and compares, so any
silent change to a pooling recipe (CLS choice, mask handling, projection,
normalization) fails the suite.  On a networked host the same harness can be
pointed at real checkpoints to produce true pretrained goldens
(extract_clip_features.py:27-30 semantics).

Run:  python tests/make_extractor_goldens.py

REAL-WEIGHT capture (the documented handoff for a NETWORKED host —
VERDICT round-2 #6):

    python tests/make_extractor_goldens.py --real [--models clip siglip ...]

builds every capturable registry family with pretrained=True
(extraction.extractors.build_extractor), runs it over the fixed stimuli
below (seeded images + fixed captions, deterministic across hosts), and
writes tests/fixtures/extractor_goldens_real.npz plus a JSON manifest of
the captured models/checkpoints.  Copy both files into tests/fixtures/ on
the zero-egress box: the suite (test_extractor_goldens.py) auto-detects the
real fixture and verifies recomputation against it wherever weights are
available locally, skipping models it cannot rebuild.  VisualBERT needs a
detectron2 detector and ImageBind the official checkpoint ($IMAGEBIND_CKPT);
both are skipped with a note when unavailable.  Comparison tolerance:
rtol 1e-3 / atol 1e-4 (pretrained forwards cross BLAS implementations).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "extractor_goldens.npz")
REAL_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "extractor_goldens_real.npz")

# families build_extractor can instantiate end-to-end from the registry
REAL_CAPTURE_MODELS = [
    "clip", "vit-b-16", "resnet-50", "bert-base-uncased", "gpt2-small",
    "siglip", "dino-base", "vilt", "bridgetower", "flava", "blip2",
    "imagebind",
]


def real_golden_stimuli(n=4, size=96):
    """Fixed stimuli for real-weight goldens: seeded images + fixed captions
    (deterministic across hosts; numpy RandomState is platform-stable)."""
    from PIL import Image

    rng = np.random.RandomState(123)
    images = [
        Image.fromarray(rng.randint(0, 255, (size, size, 3), dtype=np.uint8))
        for _ in range(n)
    ]
    captions = [
        "a dog running on the beach",
        "two people riding bicycles down a street",
        "a plate of food on a wooden table",
        "an airplane flying over snowy mountains",
    ][:n]
    ids = list(range(1, n + 1))
    return ids, captions, images


def compute_real(models=None, build=None) -> tuple:
    """Capture pretrained extractor outputs over the fixed stimuli.

    Returns (arrays {model/key: [B, D]}, manifest).  ``build`` overrides
    extraction.extractors.build_extractor (the CI dry-run injects stubs).
    """
    from multimodal_decoding_tpu.extraction.extractors import (
        REGISTRY,
        build_extractor,
    )

    build = build or build_extractor
    models = models or REAL_CAPTURE_MODELS
    ids, captions, images = real_golden_stimuli()
    arrays, manifest = {}, {"models": {}, "n_stimuli": len(ids)}
    for name in models:
        spec = REGISTRY[name]
        try:
            _, _, extract = build(name, pretrained=True)
            out = extract(ids, captions, images)
        except Exception as e:  # missing weights/deps: record and move on
            print(f"SKIP {name}: {type(e).__name__}: {e}")
            manifest["models"][name] = {"status": f"skipped: {e}"}
            continue
        for key, val in out.items():
            arrays[f"{name}/{key}"] = np.asarray(val, dtype=np.float32)
        manifest["models"][name] = {
            "status": "captured", "hf_name": spec.hf_name,
            "keys": sorted(out), "backend": spec.backend,
        }
        print(f"captured {name}: {sorted(out)}")
    return arrays, manifest


def fixed_text_inputs(n=2, seq=6, vocab=50, np_like=True):
    rng = np.random.RandomState(42)
    ids = rng.randint(1, vocab, size=(n, seq)).astype(np.int32)
    mask = np.ones((n, seq), dtype=np.int32)
    mask[1, 4:] = 0  # one padded row exercises mask-aware pooling
    ids[1, 4:] = 0
    return ids, mask


def fixed_pixels(n=2, size=24):
    rng = np.random.RandomState(43)
    return rng.rand(n, 3, size, size).astype(np.float32)


def compute_all() -> dict:
    # goldens are a CPU-deterministic reference; recomputation under the test
    # suite also runs on CPU (conftest), so force the platform here too
    # (must happen before the first backend use — the axon sitecustomize pins
    # JAX_PLATFORMS, which plain env vars cannot override)
    import jax

    jax.config.update("jax_platforms", "cpu")
    out = {}

    # --- Flax CLIP (dual encoder, contrastive embeds) ---------------------
    from transformers import (
        BertConfig,
        CLIPConfig,
        CLIPTextConfig,
        CLIPVisionConfig,
        FlaxBertModel,
        FlaxCLIPModel,
    )

    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=32,
                       max_position_embeddings=16, projection_dim=8),
        CLIPVisionConfig(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=32, image_size=24, patch_size=8,
                         projection_dim=8),
        projection_dim=8,
    )
    clip = FlaxCLIPModel(cfg, seed=0)
    ids, mask = fixed_text_inputs()
    o = clip(pixel_values=fixed_pixels(), input_ids=ids, attention_mask=mask)
    out["clip_text_embeds"] = np.asarray(o.text_embeds)
    out["clip_image_embeds"] = np.asarray(o.image_embeds)

    # --- Flax BERT (LM pooling recipe) -------------------------------------
    from multimodal_decoding_tpu.extraction.extractors import masked_mean

    bcfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=32)
    bert = FlaxBertModel(bcfg, seed=0)
    h = bert(input_ids=ids, attention_mask=mask).last_hidden_state
    out["bert_lang_mean"] = np.asarray(masked_mean(h, mask))
    out["bert_lang_cls"] = np.asarray(h[:, 0, :])

    # --- torch FLAVA (fused multimodal keys) --------------------------------
    import torch
    from transformers import FlavaConfig, FlavaModel

    from multimodal_decoding_tpu.config import (
        FUSED_CLS_FEAT_KEY,
        FUSED_MEAN_FEAT_KEY,
        LANG_CLS_FEAT_KEY,
        VISION_CLS_FEAT_KEY,
    )
    from multimodal_decoding_tpu.extraction.extractors import make_flava_extractor

    torch.manual_seed(0)
    tiny = dict(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=32)
    fcfg = FlavaConfig(
        image_config=dict(image_size=24, patch_size=8, **tiny),
        text_config=dict(vocab_size=50, max_position_embeddings=16, **tiny),
        multimodal_config=dict(**tiny),
        hidden_size=16, projection_dim=8,
    )
    flava = FlavaModel(fcfg)

    class FixedProcessor:
        def __call__(self, text=None, images=None, return_tensors="pt", padding=True):
            return {
                "input_ids": torch.as_tensor(ids, dtype=torch.long),
                "attention_mask": torch.as_tensor(mask, dtype=torch.long),
                "pixel_values": torch.as_tensor(fixed_pixels()),
            }

    fo = make_flava_extractor(flava, FixedProcessor())([1, 2], ["a", "b"], [None, None])
    out["flava_lang_cls"] = fo[LANG_CLS_FEAT_KEY]
    out["flava_vision_cls"] = fo[VISION_CLS_FEAT_KEY]
    out["flava_fused_mean"] = fo[FUSED_MEAN_FEAT_KEY]
    out["flava_fused_cls"] = fo[FUSED_CLS_FEAT_KEY]

    # --- torch ViLT (padding-aware fused pooling) ---------------------------
    from transformers import ViltConfig, ViltModel

    from multimodal_decoding_tpu.extraction.extractors import (
        make_torch_fused_extractor,
    )

    torch.manual_seed(1)
    vcfg = ViltConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=32, image_size=32, patch_size=16)
    vilt = ViltModel(vcfg)

    class ViltFixedProcessor:
        def __call__(self, images=None, text=None, return_tensors="pt",
                     padding=True, truncation=True):
            t_ids = torch.as_tensor(ids, dtype=torch.long)
            t_mask = torch.as_tensor(mask, dtype=torch.long)
            px = np.random.RandomState(44).rand(len(text), 3, 32, 32).astype(np.float32)
            return {"input_ids": t_ids, "attention_mask": t_mask,
                    "pixel_values": torch.as_tensor(px),
                    "pixel_mask": torch.ones((len(text), 32, 32), dtype=torch.long)}

    vo = make_torch_fused_extractor(vilt, ViltFixedProcessor())(
        [1, 2], ["a", "b"], [None, None]
    )
    out["vilt_fused_mean"] = vo[FUSED_MEAN_FEAT_KEY]
    out["vilt_fused_cls"] = vo[FUSED_CLS_FEAT_KEY]

    # --- torch VisualBERT stage 2 (fused pooling over cached regions) ------
    from transformers import VisualBertConfig, VisualBertModel

    from multimodal_decoding_tpu.extraction.visualbert import (
        make_visualbert_extractor,
    )

    torch.manual_seed(2)
    vbcfg = VisualBertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, visual_embedding_dim=12, max_position_embeddings=64,
    )
    vb = VisualBertModel(vbcfg)
    regions_rng = np.random.RandomState(45)
    regions = {1: regions_rng.randn(5, 12).astype(np.float32),
               2: regions_rng.randn(5, 12).astype(np.float32)}

    class BertFixedTokenizer:
        def __call__(self, texts, padding=True, return_tensors="pt"):
            return {"input_ids": torch.as_tensor(ids, dtype=torch.long),
                    "attention_mask": torch.as_tensor(mask, dtype=torch.long),
                    "token_type_ids": torch.zeros(ids.shape, dtype=torch.long)}

    vbo = make_visualbert_extractor(vb, BertFixedTokenizer(), regions)(
        [1, 2], ["a", "b"], None
    )
    out["visualbert_fused_mean"] = vbo[FUSED_MEAN_FEAT_KEY]
    out["visualbert_fused_cls"] = vbo[FUSED_CLS_FEAT_KEY]

    # --- in-framework ImageBind (functional JAX, sixth rebuilt family) ----
    from multimodal_decoding_tpu.extraction import imagebind as IB

    ib_cfg = IB.ImageBindConfig(
        vision_embed_dim=16, vision_layers=2, vision_heads=2,
        text_embed_dim=12, text_layers=2, text_heads=2,
        out_embed_dim=8, image_size=28, patch_size=14, n_frames=2,
        context_length=10, vocab_size=64,
    )
    ib_params = IB.params_from_torch_state_dict(
        IB.fake_torch_state_dict(ib_cfg, seed=3), ib_cfg
    )
    ib_ids = np.zeros((2, ib_cfg.context_length), np.int32)
    ib_ids[0, :4] = [1, 7, 9, ib_cfg.vocab_size - 1]
    ib_ids[1, :6] = [1, 3, 5, 7, 9, ib_cfg.vocab_size - 1]
    ib_px = np.random.RandomState(46).rand(2, 3, 28, 28).astype(np.float32)
    import jax.numpy as jnp

    out["imagebind_lang_cls"] = np.asarray(
        IB.text_forward(ib_params, ib_cfg, jnp.asarray(ib_ids))
    )
    out["imagebind_vision_cls"] = np.asarray(
        IB.vision_forward(ib_params, ib_cfg, jnp.asarray(ib_px))
    )
    return out


def dump_imagebind_state_manifest(out_path: str) -> str | None:
    """Dump the OFFICIAL imagebind_huge.pth key->shape map as a JSON fixture.

    Runs on the networked capture host alongside --real ($IMAGEBIND_CKPT
    points at the checkpoint file).  tests/test_imagebind.py cross-checks
    the landed fixture against extraction.imagebind.
    expected_state_dict_manifest so converter key-map drift fails loudly
    offline (VERDICT r3 #6).
    """
    ckpt = os.environ.get("IMAGEBIND_CKPT")
    if not ckpt or not os.path.isfile(ckpt):
        print("no $IMAGEBIND_CKPT file — skipping state-dict manifest dump")
        return None
    import torch

    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        raise TypeError(f"unexpected checkpoint payload type {type(sd)!r} "
                        "(expected a state-dict or a wrapper dict)")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    man = {k: list(v.shape) for k, v in sd.items()}
    with open(out_path, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", action="store_true", default=False,
                    help="capture REAL pretrained-weight goldens (networked "
                         "host); default regenerates the tiny seeded fixtures")
    ap.add_argument("--models", type=str, nargs="+", default=None)
    ap.add_argument("--out", type=str, default=None,
                    help="override the fixture path (dry runs)")
    args = ap.parse_args(argv)

    if args.real:
        out = args.out or REAL_FIXTURE
        arrays, manifest = compute_real(args.models)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez_compressed(out, **arrays)
        mpath = dump_imagebind_state_manifest(
            os.path.join(os.path.dirname(out), "imagebind_state_manifest.json")
        )
        if mpath:
            print(f"wrote official ImageBind state-dict manifest: {mpath}")
        with open(out.replace(".npz", "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        print(f"wrote {out} + manifest "
              f"({sum(1 for m in manifest['models'].values() if m['status'] == 'captured')} "
              f"models captured)")
        return out

    out = args.out or FIXTURE
    os.makedirs(os.path.dirname(out), exist_ok=True)
    arrays = compute_all()
    np.savez_compressed(out, **arrays)
    print(f"wrote {out}:")
    for k, v in arrays.items():
        print(f"  {k}: {v.shape} mean={v.mean():+.4f}")
    return out


if __name__ == "__main__":
    main()
