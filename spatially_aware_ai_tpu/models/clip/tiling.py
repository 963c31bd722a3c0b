"""Tiled CLIP feature extraction: overlapping patches -> per-patch embeddings.

Reference behavior (clipfusion.py:789-839): normalize with the CLIP channel
stats, unfold into overlapping patch_size/patch_stride tiles, resize each tile
to 224x224 (bilinear, align_corners=False), encode, and fold into a low-res
[n_patches_y, n_patches_x, C] feature image.

TPU-native: the unfold is a broadcasted gather, the resize is one batched
jax.image.resize, and the whole patch set is encoded in a single jitted
forward pass (no micro-batches of 8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def num_patches(size: int, patch_size: int, patch_stride: int) -> int:
    if (size - patch_size) % patch_stride != 0:
        raise ValueError(
            f"(size - patch_size) must be divisible by stride: "
            f"{size=} {patch_size=} {patch_stride=}"
        )
    return (size - patch_size) // patch_stride + 1


def get_patches(img, patch_size: int, patch_stride: int):
    """img [H, W, C] -> [ny, nx, patch_size, patch_size, C] overlapping tiles."""
    H, W = img.shape[0], img.shape[1]
    ny = num_patches(H, patch_size, patch_stride)
    nx = num_patches(W, patch_size, patch_stride)
    rows = (
        jnp.arange(ny)[:, None] * patch_stride + jnp.arange(patch_size)[None, :]
    )  # [ny, ps]
    cols = (
        jnp.arange(nx)[:, None] * patch_stride + jnp.arange(patch_size)[None, :]
    )  # [nx, ps]
    return img[rows[:, None, :, None], cols[None, :, None, :], :]


@functools.partial(
    jax.jit, static_argnames=("patch_size", "patch_stride", "encode_fn")
)
def tiled_image_features_batch(
    params, imgs, *, patch_size, patch_stride, encode_fn
):
    """Whole-chunk tiled CLIP features: [F, H, W, 3] -> [F, ny, nx, C].

    All F * ny * nx patches are encoded in ONE forward batch — the batch
    dimension feeding the MXU is the product of frames and patches, not the
    reference's micro-batches of 8 (clipfusion.py:826-833).
    """
    imgs = (imgs - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    patches = jax.vmap(
        lambda im: get_patches(im, patch_size, patch_stride)
    )(imgs)  # [F, ny, nx, ps, ps, 3]
    F, ny, nx = patches.shape[:3]
    flat = patches.reshape(F * ny * nx, patch_size, patch_size, 3)
    resized = jax.image.resize(
        flat, (F * ny * nx, 224, 224, 3), method="bilinear", antialias=False
    )
    feats = encode_fn(params, resized)
    return feats.reshape(F, ny, nx, -1)


@functools.partial(
    jax.jit, static_argnames=("patch_size", "patch_stride", "encode_fn")
)
def tiled_image_features(params, img, *, patch_size, patch_stride, encode_fn):
    """Compute the CLIP patch-feature image for one frame.

    Args:
      params: CLIP params pytree.
      img: [H, W, 3] float in [0, 1].
      encode_fn: (params, images[B, 224, 224, 3]) -> [B, C]; static so the
        underlying tower is traced once per shape.
    Returns:
      [ny, nx, C] feature image.
    """
    img = (img - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    patches = get_patches(img, patch_size, patch_stride)
    ny, nx = patches.shape[0], patches.shape[1]
    flat = patches.reshape(ny * nx, patch_size, patch_size, 3)
    resized = jax.image.resize(
        flat, (ny * nx, 224, 224, 3), method="bilinear", antialias=False
    )
    feats = encode_fn(params, resized)
    return feats.reshape(ny, nx, -1)
