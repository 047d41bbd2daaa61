"""In-framework ImageBind forward: functional JAX, TPU-native.

The reference extracts ImageBind features through the vendored FAIR
submodule (/root/reference/feature_extraction/extract_imagebind_features.py:35-42,
pretrained + random-init control); the submodule is not vendored here, so
this module rebuilds the public ImageBind architecture (vision ViT-H/14 over
2-frame padded "video" patches + CLIP-style causal text tower, each
projected into the shared 1024-d space) as pure JAX functions:

* ``init_params(rng, cfg)`` — random init (the 'random-imagebind' control,
  extract_imagebind_features.py:40-42);
* ``params_from_torch_state_dict(sd, cfg)`` — converts the official
  ``imagebind_huge.pth`` state dict (torch, any device) to the JAX pytree,
  so pretrained extraction needs only the checkpoint file, no FAIR code;
* ``text_forward`` / ``vision_forward`` / ``imagebind_embed`` — jittable
  forwards reproducing the TEXT/VISION branches of the FAIR model:
  post-processed text embeds carry the learned logit scaling, vision embeds
  are unit-normalized, exactly what the reference pickles as
  LANG_CLS/VISION_CLS features.

Numeric parity of every block (torch.nn.MultiheadAttention semantics,
eps=1e-6 LayerNorms, exact-erf GELU, causal text mask over the full padded
context, EOS = argmax(token id) selection) is locked by
tests/test_imagebind.py against stock torch modules driven through the same
converter.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# CLIP BPE special tokens (ImageBind SimpleTokenizer): EOS has the highest
# id, which is what makes the argmax EOS-selection below correct.
SOT_TOKEN = 49406
EOT_TOKEN = 49407

# load_and_transform_vision_data normalization constants (CLIP's)
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

MAX_LOGIT_SCALE = 100.0


@dataclass(frozen=True)
class ImageBindConfig:
    """imagebind_huge defaults; shrink everything for tests/goldens."""

    vision_embed_dim: int = 1280
    vision_layers: int = 32
    vision_heads: int = 16
    text_embed_dim: int = 1024
    text_layers: int = 24
    text_heads: int = 16
    out_embed_dim: int = 1024
    image_size: int = 224
    patch_size: int = 14
    n_frames: int = 2  # PadIm2Video repeats stills to 2 frames
    context_length: int = 77
    vocab_size: int = 49408
    logit_scale_init: float = 14.2857  # 1 / 0.07
    mlp_ratio: float = 4.0

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


# ---------------------------------------------------------------------------
# Parameter initialisation / torch-checkpoint conversion
# ---------------------------------------------------------------------------


def _init_block(rng, dim: int, mlp_dim: int) -> dict:
    ks = jax.random.split(rng, 4)
    s = dim ** -0.5
    return {
        "norm_1": {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)},
        "norm_2": {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)},
        # in_proj packs q,k,v rows torch-style: [3*dim, dim]
        "in_proj_w": jax.random.normal(ks[0], (3 * dim, dim)) * s,
        "in_proj_b": jnp.zeros(3 * dim),
        "out_proj_w": jax.random.normal(ks[1], (dim, dim)) * s,
        "out_proj_b": jnp.zeros(dim),
        "fc1_w": jax.random.normal(ks[2], (mlp_dim, dim)) * s,
        "fc1_b": jnp.zeros(mlp_dim),
        "fc2_w": jax.random.normal(ks[3], (dim, mlp_dim)) * (mlp_dim ** -0.5),
        "fc2_b": jnp.zeros(dim),
    }


def init_params(rng, cfg: ImageBindConfig) -> dict:
    """Seeded random init — the 'random-imagebind' control network."""
    kv, kt, kproj = jax.random.split(rng, 3)
    d_v, d_t = cfg.vision_embed_dim, cfg.text_embed_dim
    patch_in = 3 * cfg.n_frames * cfg.patch_size ** 2
    kvs = jax.random.split(kv, cfg.vision_layers + 3)
    kts = jax.random.split(kt, cfg.text_layers + 2)
    vision = {
        "cls_token": jnp.zeros((1, 1, d_v)),
        "patch_w": jax.random.normal(kvs[0], (d_v, patch_in)) * (patch_in ** -0.5),
        "pos_embed": jax.random.normal(kvs[1], (1, cfg.n_patches + 1, d_v)) * 0.02,
        "pre_ln": {"scale": jnp.ones(d_v), "bias": jnp.zeros(d_v)},
        "blocks": [
            _init_block(kvs[2 + i], d_v, int(d_v * cfg.mlp_ratio))
            for i in range(cfg.vision_layers)
        ],
        "head_ln": {"scale": jnp.ones(d_v), "bias": jnp.zeros(d_v)},
        "head_w": jax.random.normal(kvs[-1], (cfg.out_embed_dim, d_v)) * (d_v ** -0.5),
    }
    text = {
        "token_embed": jax.random.normal(kts[0], (cfg.vocab_size, d_t)) * 0.02,
        "pos_embed": jax.random.normal(kts[1], (1, cfg.context_length, d_t)) * 0.01,
        "blocks": [
            _init_block(kts[2 + i], d_t, int(d_t * cfg.mlp_ratio))
            for i in range(cfg.text_layers)
        ],
        "head_ln": {"scale": jnp.ones(d_t), "bias": jnp.zeros(d_t)},
        "head_w": jax.random.normal(kproj, (cfg.out_embed_dim, d_t)) * (d_t ** -0.5),
        "log_logit_scale": jnp.log(jnp.asarray(cfg.logit_scale_init)),
    }
    return {"vision": vision, "text": text}


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _ln(sd, prefix):
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _block_from_sd(sd, prefix) -> dict:
    return {
        "norm_1": _ln(sd, f"{prefix}.norm_1"),
        "norm_2": _ln(sd, f"{prefix}.norm_2"),
        "in_proj_w": jnp.asarray(_np(sd[f"{prefix}.attn.in_proj_weight"])),
        "in_proj_b": jnp.asarray(_np(sd[f"{prefix}.attn.in_proj_bias"])),
        "out_proj_w": jnp.asarray(_np(sd[f"{prefix}.attn.out_proj.weight"])),
        "out_proj_b": jnp.asarray(_np(sd[f"{prefix}.attn.out_proj.bias"])),
        "fc1_w": jnp.asarray(_np(sd[f"{prefix}.mlp.fc1.weight"])),
        "fc1_b": jnp.asarray(_np(sd[f"{prefix}.mlp.fc1.bias"])),
        "fc2_w": jnp.asarray(_np(sd[f"{prefix}.mlp.fc2.weight"])),
        "fc2_b": jnp.asarray(_np(sd[f"{prefix}.mlp.fc2.bias"])),
    }


def params_from_torch_state_dict(sd: dict, cfg: ImageBindConfig) -> dict:
    """Official imagebind_huge.pth naming -> JAX pytree.

    Key map (FAIR ImageBind module tree):
      modality_preprocessors.vision.{cls_token, rgbt_stem.proj.1.weight,
        pos_embedding_helper.pos_embed}
      modality_preprocessors.text.{token_embedding.weight, pos_embed}
      modality_trunks.vision.pre_transformer_layer.0.{weight,bias}
      modality_trunks.{vision,text}.blocks.N.{attn.*, norm_1, norm_2, mlp.*}
      modality_heads.vision.{0: LayerNorm, 2: Linear}
      modality_heads.text.proj.{0: LayerNorm, 1: Linear}
      modality_postprocessors.text.1.log_logit_scale

    The full key map is validated up front (validate_state_dict): missing
    keys, shape mismatches, and unconsumed vision/text-tower keys all raise
    with explicit lists, so key-map drift against a future checkpoint fails
    loudly instead of silently converting garbage.
    """
    validate_state_dict(sd, cfg)
    d_v = cfg.vision_embed_dim
    conv_w = _np(sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"])
    # Conv3d [D, 3, T, p, p] with stride == kernel is a plain matmul over
    # flattened (c, t, ph, pw) patches — MXU-native, no conv op needed.
    patch_w = conv_w.reshape(d_v, -1)
    vision = {
        "cls_token": jnp.asarray(_np(sd["modality_preprocessors.vision.cls_token"])),
        "patch_w": jnp.asarray(patch_w),
        "pos_embed": jnp.asarray(
            _np(sd["modality_preprocessors.vision.pos_embedding_helper.pos_embed"])
        ),
        "pre_ln": _ln(sd, "modality_trunks.vision.pre_transformer_layer.0"),
        "blocks": [
            _block_from_sd(sd, f"modality_trunks.vision.blocks.{i}")
            for i in range(cfg.vision_layers)
        ],
        "head_ln": _ln(sd, "modality_heads.vision.0"),
        "head_w": jnp.asarray(_np(sd["modality_heads.vision.2.weight"])),
    }
    text = {
        "token_embed": jnp.asarray(
            _np(sd["modality_preprocessors.text.token_embedding.weight"])
        ),
        "pos_embed": jnp.asarray(_np(sd["modality_preprocessors.text.pos_embed"])),
        "blocks": [
            _block_from_sd(sd, f"modality_trunks.text.blocks.{i}")
            for i in range(cfg.text_layers)
        ],
        "head_ln": _ln(sd, "modality_heads.text.proj.0"),
        "head_w": jnp.asarray(_np(sd["modality_heads.text.proj.1.weight"])),
        "log_logit_scale": jnp.asarray(
            _np(sd["modality_postprocessors.text.1.log_logit_scale"]).reshape(())
        ),
    }
    return {"vision": vision, "text": text}


def expected_state_dict_manifest(cfg: ImageBindConfig) -> dict:
    """{key: shape} of every official-checkpoint tensor the converter reads.

    The single source of truth for key-map drift detection:
    ``fake_torch_state_dict`` builds its offline test dicts from this table,
    ``validate_state_dict`` (run inside ``params_from_torch_state_dict``)
    checks a real checkpoint against it, and
    ``tests/make_extractor_goldens.py --real`` dumps the official
    ``imagebind_huge.pth``'s own key->shape manifest as a JSON fixture that
    ``tests/test_imagebind.py`` cross-checks against this function whenever
    the fixture is present (/root/reference/feature_extraction/
    extract_imagebind_features.py:35-42 is the pretrained consumer).
    Iteration order is load-bearing for ``fake_torch_state_dict`` seeding —
    append only.
    """
    d_v, d_t = cfg.vision_embed_dim, cfg.text_embed_dim
    man = {
        "modality_preprocessors.vision.cls_token": (1, 1, d_v),
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight":
            (d_v, 3, cfg.n_frames, cfg.patch_size, cfg.patch_size),
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed":
            (1, cfg.n_patches + 1, d_v),
        "modality_preprocessors.text.token_embedding.weight":
            (cfg.vocab_size, d_t),
        "modality_preprocessors.text.pos_embed": (1, cfg.context_length, d_t),
        "modality_trunks.vision.pre_transformer_layer.0.weight": (d_v,),
        "modality_trunks.vision.pre_transformer_layer.0.bias": (d_v,),
    }
    for tower, d, n_layers in (("vision", d_v, cfg.vision_layers),
                               ("text", d_t, cfg.text_layers)):
        mlp = int(d * cfg.mlp_ratio)
        for i in range(n_layers):
            p = f"modality_trunks.{tower}.blocks.{i}"
            man[f"{p}.attn.in_proj_weight"] = (3 * d, d)
            man[f"{p}.attn.in_proj_bias"] = (3 * d,)
            man[f"{p}.attn.out_proj.weight"] = (d, d)
            man[f"{p}.attn.out_proj.bias"] = (d,)
            man[f"{p}.norm_1.weight"] = (d,)
            man[f"{p}.norm_1.bias"] = (d,)
            man[f"{p}.norm_2.weight"] = (d,)
            man[f"{p}.norm_2.bias"] = (d,)
            man[f"{p}.mlp.fc1.weight"] = (mlp, d)
            man[f"{p}.mlp.fc1.bias"] = (mlp,)
            man[f"{p}.mlp.fc2.weight"] = (d, mlp)
            man[f"{p}.mlp.fc2.bias"] = (d,)
    man["modality_heads.vision.0.weight"] = (d_v,)
    man["modality_heads.vision.0.bias"] = (d_v,)
    man["modality_heads.vision.2.weight"] = (cfg.out_embed_dim, d_v)
    man["modality_heads.text.proj.0.weight"] = (d_t,)
    man["modality_heads.text.proj.0.bias"] = (d_t,)
    man["modality_heads.text.proj.1.weight"] = (cfg.out_embed_dim, d_t)
    man["modality_postprocessors.text.1.log_logit_scale"] = ()
    return man


#: Vision/text-tower state-dict entries that legitimately carry no weight the
#: forward needs: registered buffers (the text causal mask is reconstructed
#: analytically in text_forward).  Anything ELSE unconsumed inside the
#: vision/text towers is key-map drift and validate_state_dict raises on it.
STATE_DICT_BUFFER_WHITELIST = (
    "modality_preprocessors.text.mask",
)

#: Prefixes of the two towers this module rebuilds.  Keys outside them
#: (audio/depth/thermal/imu modalities of the full ImageBind checkpoint) are
#: out of scope and ignored, as in the reference's TEXT/VISION-only usage.
_TOWER_PREFIXES = (
    "modality_preprocessors.vision.", "modality_preprocessors.text.",
    "modality_trunks.vision.", "modality_trunks.text.",
    "modality_heads.vision.", "modality_heads.text.",
    "modality_postprocessors.text.",
)


def validate_state_dict(sd: dict, cfg: ImageBindConfig) -> None:
    """Fail loudly on key-map drift between ``sd`` and this module.

    Raises ValueError listing (a) expected keys missing from ``sd``,
    (b) shape mismatches, and (c) vision/text-tower keys in ``sd`` that the
    converter would silently ignore (modulo the documented buffer
    whitelist).  Scalar-vs-[1] layouts are tolerated for the logit scale
    (the converter reshapes it).
    """
    man = expected_state_dict_manifest(cfg)
    problems = []
    for k, shape in man.items():
        if k not in sd:
            problems.append(f"missing: {k} {shape}")
            continue
        got = tuple(int(s) for s in _np(sd[k]).shape)
        if got != shape and not (
            k == "modality_postprocessors.text.1.log_logit_scale"
            and int(np.prod(got, dtype=np.int64)) == 1
        ):
            problems.append(f"shape mismatch: {k} expected {shape}, got {got}")
    unconsumed = [
        k for k in sd
        if k.startswith(_TOWER_PREFIXES)
        and k not in man
        and k not in STATE_DICT_BUFFER_WHITELIST
    ]
    if unconsumed:
        problems.append(
            "unconsumed vision/text-tower keys (key-map drift? if these are "
            "parameter-free buffers, extend STATE_DICT_BUFFER_WHITELIST): "
            + ", ".join(sorted(unconsumed)[:20])
        )
    if problems:
        raise ValueError(
            "ImageBind state dict does not match the converter's key map:\n  "
            + "\n  ".join(problems[:40])
        )


def fake_torch_state_dict(cfg: ImageBindConfig, seed: int = 0) -> dict:
    """Official-format random state dict (numpy), for offline converter and
    parity tests — every key/shape the converter consumes, none it doesn't.
    Built from ``expected_state_dict_manifest`` (same draw order as always:
    manifest order is insertion order)."""
    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in expected_state_dict_manifest(cfg).items():
        if name == "modality_postprocessors.text.1.log_logit_scale":
            sd[name] = np.asarray(np.log(cfg.logit_scale_init), dtype=np.float32)
        else:
            sd[name] = rng.randn(*shape).astype(np.float32) * 0.05
    return sd


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _mha(x, p, n_heads: int, mask=None):
    """torch.nn.MultiheadAttention semantics: packed qkv in_proj + out_proj.

    ``mask`` is an additive [L, L] matrix (the causal text mask) or None.
    """
    b, l, d = x.shape
    qkv = x @ p["in_proj_w"].T + p["in_proj_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, l, n_heads, d // n_heads).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = q @ k.transpose(0, 1, 3, 2) * ((d // n_heads) ** -0.5)
    if mask is not None:
        logits = logits + mask
    attn = jax.nn.softmax(logits, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, l, d)
    return out @ p["out_proj_w"].T + p["out_proj_b"]


def _block(x, p, n_heads: int, mask=None):
    """BlockWithMasking: pre-norm attention + pre-norm exact-GELU MLP."""
    x = x + _mha(_layer_norm(x, p["norm_1"]), p, n_heads, mask)
    h = _layer_norm(x, p["norm_2"])
    h = jax.nn.gelu(h @ p["fc1_w"].T + p["fc1_b"], approximate=False)
    return x + (h @ p["fc2_w"].T + p["fc2_b"])


def patchify(pixel_values: jnp.ndarray, cfg: ImageBindConfig) -> jnp.ndarray:
    """[B, 3, H, W] images -> [B, n_patches, 3*T*p*p] flattened patch stack.

    PadIm2Video('repeat', 2) + Conv3d(kernel=stride=(2, p, p)) collapses to a
    reshape + matmul because stills are repeated to exactly the temporal
    kernel size; the flattened axis order (c, t, ph, pw) matches the
    Conv3d weight layout the converter flattens.
    """
    b, c, h, w = pixel_values.shape
    p = cfg.patch_size
    x = pixel_values.reshape(b, c, h // p, p, w // p, p)
    # -> [B, gh, gw, c, p, p]
    x = x.transpose(0, 2, 4, 1, 3, 5)
    # repeat to T frames after c: order (c, t, ph, pw)
    x = jnp.repeat(x[:, :, :, :, None], cfg.n_frames, axis=4)
    return x.reshape(b, (h // p) * (w // p), c * cfg.n_frames * p * p)


def vision_forward(params: dict, cfg: ImageBindConfig, pixel_values) -> jnp.ndarray:
    """VISION branch -> unit-normalized [B, out_embed_dim] embeddings."""
    p = params["vision"]
    tokens = patchify(pixel_values, cfg) @ p["patch_w"].T
    cls = jnp.broadcast_to(p["cls_token"], (tokens.shape[0], 1, tokens.shape[-1]))
    x = jnp.concatenate([cls, tokens], axis=1) + p["pos_embed"]
    x = _layer_norm(x, p["pre_ln"])
    for blk in p["blocks"]:
        x = _block(x, blk, cfg.vision_heads)
    x = _layer_norm(x[:, 0], p["head_ln"]) @ p["head_w"].T
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def text_forward(params: dict, cfg: ImageBindConfig, input_ids) -> jnp.ndarray:
    """TEXT branch -> logit-scaled unit-direction [B, out_embed_dim] embeds.

    Faithful quirks: causal-only attention over the full padded context (the
    FAIR model never masks padding), EOS position = argmax(token id).
    """
    p = params["text"]
    x = p["token_embed"][input_ids] + p["pos_embed"]
    l = cfg.context_length
    causal = jnp.where(
        jnp.arange(l)[None, :] > jnp.arange(l)[:, None], -jnp.inf, 0.0
    )
    for blk in p["blocks"]:
        x = _block(x, blk, cfg.text_heads, causal)
    eos = jnp.argmax(input_ids, axis=-1)
    x = x[jnp.arange(x.shape[0]), eos]
    x = _layer_norm(x, p["head_ln"]) @ p["head_w"].T
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    scale = jnp.clip(jnp.exp(p["log_logit_scale"]), max=MAX_LOGIT_SCALE)
    return scale * x


def imagebind_embed(params: dict, cfg: ImageBindConfig, input_ids, pixel_values):
    """Both branches (the reference's model(inputs) dict, TEXT + VISION)."""
    return text_forward(params, cfg, input_ids), vision_forward(params, cfg, pixel_values)


# ---------------------------------------------------------------------------
# Preprocessing + extractor builder
# ---------------------------------------------------------------------------


def preprocess_images(images, cfg: ImageBindConfig) -> np.ndarray:
    """load_and_transform_vision_data: resize-short-side 224 (bicubic) ->
    center crop -> CLIP normalize -> [B, 3, S, S] float32."""
    from PIL import Image

    s = cfg.image_size
    out = np.empty((len(images), 3, s, s), np.float32)
    for i, img in enumerate(images):
        if not isinstance(img, Image.Image):
            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            img = Image.fromarray(arr)
        img = img.convert("RGB")
        w, h = img.size
        scale = s / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        w, h = img.size
        left, top = (w - s) // 2, (h - s) // 2
        img = img.crop((left, top, left + s, top + s))
        x = np.asarray(img, np.float32) / 255.0
        out[i] = ((x - IMAGE_MEAN) / IMAGE_STD).transpose(2, 0, 1)
    return out


def clip_tokenize(captions, cfg: ImageBindConfig, tokenizer=None) -> np.ndarray:
    """[B, context_length] int32: [SOT] + BPE + [EOT], zero-padded/truncated.

    The BPE vocabulary is data we cannot synthesise: by default this uses the
    HF CLIP tokenizer (same merges as ImageBind's SimpleTokenizer) from the
    local cache; pass ``tokenizer`` (captions -> list[list[int]] of ids
    WITHOUT specials) to substitute any implementation.
    """
    if tokenizer is None:
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained("openai/clip-vit-large-patch14")

        def tokenizer(texts):
            return tok(list(texts), add_special_tokens=False)["input_ids"]

    ids = np.zeros((len(captions), cfg.context_length), np.int32)
    for i, toks in enumerate(tokenizer(list(captions))):
        row = [SOT_TOKEN] + list(toks)[: cfg.context_length - 2] + [EOT_TOKEN]
        ids[i, : len(row)] = row
    return ids


def make_imagebind_extractor(params: dict, cfg: ImageBindConfig, tokenizer=None):
    """extract_fn(ids, captions, images) -> {LANG_CLS, VISION_CLS} [B, D].

    Mirrors ImagebindFeatureExtractor.extract_features_from_batch
    (extract_imagebind_features.py:20-31): TEXT embeds keep the learned
    logit scaling, VISION embeds are unit-normalized.
    """
    from multimodal_decoding_tpu.config import LANG_CLS_FEAT_KEY, VISION_CLS_FEAT_KEY

    forward = jax.jit(lambda ids_, px: imagebind_embed(params, cfg, ids_, px))

    def extract(ids, captions, images):
        input_ids = clip_tokenize(captions, cfg, tokenizer)
        pixel_values = preprocess_images(images, cfg)
        text_emb, vision_emb = forward(jnp.asarray(input_ids), jnp.asarray(pixel_values))
        return {
            LANG_CLS_FEAT_KEY: np.asarray(text_emb),
            VISION_CLS_FEAT_KEY: np.asarray(vision_emb),
        }

    return extract


def build_imagebind(pretrained: bool = True, checkpoint_path: str | None = None,
                    cfg: ImageBindConfig | None = None, seed: int = 0,
                    tokenizer=None):
    """(params, cfg, extract_fn) for 'imagebind' / 'random-imagebind'.

    ``pretrained=True`` loads the official checkpoint from
    ``checkpoint_path`` (or $IMAGEBIND_CKPT); ``pretrained=False`` is the
    seeded random-init control and needs no files.
    """
    import os

    cfg = cfg or ImageBindConfig()
    if pretrained:
        path = checkpoint_path or os.environ.get("IMAGEBIND_CKPT", "")
        if not path or not os.path.isfile(path):
            raise FileNotFoundError(
                "pretrained ImageBind needs the official imagebind_huge.pth "
                "checkpoint: pass checkpoint_path= or set $IMAGEBIND_CKPT "
                "(download from the FAIR release on a networked host)"
            )
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        params = params_from_torch_state_dict(sd, cfg)
    else:
        params = init_params(jax.random.PRNGKey(seed), cfg)
    return params, cfg, make_imagebind_extractor(params, cfg, tokenizer)
