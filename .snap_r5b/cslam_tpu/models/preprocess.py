"""Image preprocessing matching the reference's torchvision transform:

CenterCrop(image_crop_size) -> Resize(224, bicubic) -> scale to [0,1] ->
ImageNet normalization (reference ``cosplace.py:73-79``, ``netvlad.py:202-208``).
Implemented as a jittable batched op.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
TARGET = 224


def center_crop(images: np.ndarray, crop: int) -> np.ndarray:
    """Host-side center crop (sizes vary per dataset; crop before batching)."""
    h, w = images.shape[-3:-1]
    ch, cw = min(crop, h), min(crop, w)
    top, left = (h - ch) // 2, (w - cw) // 2
    return images[..., top:top + ch, left:left + cw, :]


@functools.partial(jax.jit, static_argnames=())
def normalize_and_resize(images: jax.Array) -> jax.Array:
    """``[B, H, W, 3]`` uint8/float -> ``[B, 224, 224, 3]`` normalized float32."""
    x = images.astype(jnp.float32) / 255.0
    b = x.shape[0]
    x = jax.image.resize(x, (b, TARGET, TARGET, 3), method="bicubic")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def preprocess(images: np.ndarray, crop: int) -> jax.Array:
    """Full pipeline for a batch (adds the batch dim for single images)."""
    if images.ndim == 3:
        images = images[None]
    return normalize_and_resize(jnp.asarray(center_crop(images, crop)))
