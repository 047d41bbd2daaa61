"""Gabor filterbank features as JAX convolutions.

Rebuild of /root/reference/feature_extraction/extract_gabor_features.py: the
160-kernel filterbank (8 orientations x 4 sigmas x 5 frequencies, :30-41),
wrap-mode convolution with mean+variance pooling (:44-50) producing 320-dim
features; captions are rendered to images and filtered with the same bank
(:97-121).  The reference fans out over 20 joblib processes; here the whole
bank is a batched ``lax.conv`` on device (kernels zero-padded to one common
size — zero padding does not change convolution outputs).
"""

from __future__ import annotations

import math

import numpy as np


def gabor_kernel(frequency, theta=0.0, sigma_x=1.0, sigma_y=1.0, n_stds=3, offset=0.0):
    """Real part of a Gabor kernel, skimage.filters.gabor_kernel-compatible."""
    x0 = math.ceil(
        max(abs(n_stds * sigma_x * math.cos(theta)), abs(n_stds * sigma_y * math.sin(theta)), 1)
    )
    y0 = math.ceil(
        max(abs(n_stds * sigma_y * math.cos(theta)), abs(n_stds * sigma_x * math.sin(theta)), 1)
    )
    y, x = np.mgrid[-y0 : y0 + 1, -x0 : x0 + 1].astype(np.float64)
    rotx = x * math.cos(theta) + y * math.sin(theta)
    roty = -x * math.sin(theta) + y * math.cos(theta)
    g = np.exp(-0.5 * (rotx**2 / sigma_x**2 + roty**2 / sigma_y**2))
    g /= 2 * np.pi * sigma_x * sigma_y
    g = g * np.exp(1j * (2 * np.pi * frequency * rotx + offset))
    return np.real(g)


def make_gabor_filterbank():
    """160 kernels (extract_gabor_features.py:30-41)."""
    kernels = []
    for t in range(8):
        theta = t / 8.0 * np.pi
        for sigma in (1, 3, 5, 7):
            for frequency in (0, 2, 4, 8, 16):
                kernels.append(
                    gabor_kernel(frequency, theta=theta, sigma_x=sigma, sigma_y=sigma)
                )
    return kernels


def _padded_bank(kernels):
    """Zero-pad all kernels to a common odd size -> [n_k, S, S] array."""
    size = max(max(k.shape) for k in kernels)
    if size % 2 == 0:
        size += 1
    bank = np.zeros((len(kernels), size, size), dtype=np.float32)
    for i, k in enumerate(kernels):
        py = (size - k.shape[0]) // 2
        px = (size - k.shape[1]) // 2
        bank[i, py : py + k.shape[0], px : px + k.shape[1]] = k
    return bank


def compute_gabor_feats_batch(images: np.ndarray, bank: np.ndarray | None = None):
    """[B, H, W] grayscale images -> [B, n_k*2] (mean, var per kernel).

    Parity with compute_gabor_feats (:44-50): scipy ndimage.convolve semantics
    (true convolution = correlation with flipped kernel) with mode='wrap'
    (circular padding), feature order [k0_mean, k0_var, k1_mean, k1_var, ...].
    """
    import jax
    import jax.numpy as jnp

    if bank is None:
        bank = _padded_bank(make_gabor_filterbank())
    n_k, s, _ = bank.shape
    half = s // 2

    @jax.jit
    def run(imgs, kernels):
        # circular pad then VALID conv == ndimage mode='wrap'
        x = jnp.pad(imgs, ((0, 0), (half, half), (half, half)), mode="wrap")
        x = x[:, None, :, :]  # NCHW
        # convolution: flip kernels (lax conv is cross-correlation)
        w = kernels[:, ::-1, ::-1][:, None, :, :]  # OIHW
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )  # [B, n_k, H, W]
        mean = out.mean(axis=(2, 3))
        var = out.var(axis=(2, 3))
        return jnp.stack([mean, var], axis=-1).reshape(imgs.shape[0], -1)

    return np.asarray(run(jnp.asarray(images, jnp.float32), jnp.asarray(bank)))


def preprocess_image(pil_image, img_size: int = 256) -> np.ndarray:
    """Resize-to-width + center-crop + grayscale (extract_gabor_features.py:76-85)."""
    resized = pil_image.resize(
        (img_size, round((pil_image.height / pil_image.width) * img_size))
    )
    cropped = resized.crop(
        (0, round((resized.height - img_size) / 2), resized.width,
         round((resized.height + img_size) / 2))
    )
    return np.asarray(cropped.convert("L"), dtype=np.float32)


def render_caption(caption: str, img_size: int = 256, max_len: int = 70) -> np.ndarray:
    """Caption -> grayscale text image (extract_gabor_features.py:97-118).

    Uses PIL's default font (the reference's specific ttf is not bundled).
    """
    from PIL import Image, ImageDraw, ImageFont

    caption = caption[:max_len]
    font = ImageFont.load_default()
    img = Image.new("RGB", (img_size, img_size), "grey")
    d = ImageDraw.Draw(img)
    bbox = d.textbbox((0, 0), caption, font=font)
    text_width = bbox[2] - bbox[0]
    d.text(((img_size - text_width) / 2, img_size / 2), caption, fill="white", font=font)
    return np.asarray(img.convert("L"), dtype=np.float32)


def make_gabor_extractor(img_size: int = 256):
    """Harness-compatible extract_fn for run_extraction (model name 'gabor')."""
    from multimodal_decoding_tpu.config import LANG_CLS_FEAT_KEY, VISION_CLS_FEAT_KEY

    bank = _padded_bank(make_gabor_filterbank())

    def extract(ids, captions, images):
        img_arr = np.stack([preprocess_image(im, img_size) for im in images])
        cap_arr = np.stack([render_caption(c, img_size) for c in captions])
        return {
            VISION_CLS_FEAT_KEY: compute_gabor_feats_batch(img_arr, bank),
            LANG_CLS_FEAT_KEY: compute_gabor_feats_batch(cap_arr, bank),
        }

    return extract
