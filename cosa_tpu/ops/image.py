"""Image normalization helpers (device-side).

The reference normalizes with ImageNet mean/std at the 0-255 scale
(dataloaders/transforms.py:43-50, utils/torch_helper.py:354-367). We keep
raw uint8 NHWC tensors on the host->device path and fold normalization into
the compiled step — 4x less host->device traffic than shipping f32.
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def normalize(img_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (or float 0-255) NHWC -> normalized float.

    Arithmetic is always f32; ``dtype=bfloat16`` only reduces the STORED
    result — the exact quantization the model applies at its patch-embed
    cast anyway — halving the traffic of every downstream resize/flip/concat
    on the teacher TTA path.
    """
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((img_u8.astype(jnp.float32) - mean) / std).astype(dtype)


def denormalize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """normalized f32 NHWC -> 0-255 f32 with uint8 truncation semantics
    (reference denormalize_img_ casts to uint8, torch_helper.py:354-361)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = img * std + mean
    return jnp.clip(x, 0, 255).astype(jnp.uint8).astype(jnp.float32)


def denormalize01(img: jnp.ndarray) -> jnp.ndarray:
    """reference denormalize_img (torch_helper.py:363-367): uint8 / 255."""
    return denormalize_u8(img) / 255.0


def hflip(img: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of NHWC (W is axis -2)."""
    return img[..., ::-1, :]
