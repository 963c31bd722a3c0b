"""kMaX-DeepLab: k-means Mask Transformer for panoptic segmentation (Flax).

Architecture (Yu et al., ECCV 2022, "k-means Mask Transformer"), sized by the
reference's deployment (ConvNeXt-L, COCO panoptic, 133 classes + void,
128 cluster centers):

- ConvNeXt backbone -> {os4..os32} pyramid
- FPN-style pixel decoder -> decoder features per level + final os4
  mask-feature map
- kMaX decoder blocks at os32/os16/os8: cluster centers attend to pixels
  with *k-means (hard, cluster-wise argmax) cross-attention*, then query
  self-attention + FFN
- heads: per-center class logits (134 = 133 + void) and mask embeddings;
  mask logits = mask_features @ mask_emb^T

Panoptic inference reproduces the reference's per-pixel contract
(KmaxSegmentationModel.run_on_image, handy_utils.py:60-161): resize long edge
to 1281, infer, and return a per-pixel COCO category-id map at the original
resolution with 133 = null. (The reference collapses instances of the same
class anyway — separation happens later via 3D flood fill, SURVEY.md §2.8.)

Weights: `convert.py` maps official checkpoints; in weight-free environments
the class is still the executable architecture + the panoptic plumbing.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .convnext import ConvNeXt, ConvNeXtConfig, CONVNEXT_LARGE, CONVNEXT_TINY_TEST


@dataclasses.dataclass(frozen=True)
class KMaxConfig:
    backbone: ConvNeXtConfig = CONVNEXT_LARGE
    num_queries: int = 128
    num_classes: int = 133  # + void handled as index 133
    dec_dim: int = 256
    num_heads: int = 8
    dec_blocks: Tuple[int, ...] = (2, 2, 2)  # at os32, os16, os8
    mask_dim: int = 256
    test_long_edge: int = 1281
    class_threshold: float = 0.3
    mask_threshold: float = 0.4
    overlap_threshold: float = 0.8


KMAX_CONVNEXT_LARGE = KMaxConfig()
KMAX_TINY_TEST = KMaxConfig(
    backbone=CONVNEXT_TINY_TEST, num_queries=16, dec_dim=32, num_heads=4,
    dec_blocks=(1, 1, 1), mask_dim=32, test_long_edge=129,
)


class KMaxBlock(nn.Module):
    """One kMaX decoder block: k-means cross-attention + self-attn + FFN."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, centers, pixels):
        """centers [B, N, D], pixels [B, HW, D] -> updated centers."""
        B, N, D = centers.shape

        # ---- k-means cross-attention (hard cluster-wise assignment) ----
        q = nn.Dense(D, dtype=self.dtype, name="xattn_q")(
            nn.LayerNorm(dtype=self.dtype, name="xattn_ln_q")(centers)
        )
        k = nn.Dense(D, dtype=self.dtype, name="xattn_k")(pixels)
        v = nn.Dense(D, dtype=self.dtype, name="xattn_v")(pixels)
        logits = jnp.einsum("bnd,bpd->bnp", q, k)  # [B, N, HW]
        # each pixel assigned to its argmax center (k-means E-step)
        assign = jax.nn.one_hot(
            jnp.argmax(logits, axis=1), N, axis=1, dtype=logits.dtype
        )  # [B, N, HW]
        pooled = jnp.einsum("bnp,bpd->bnd", assign, v)
        denom = jnp.maximum(assign.sum(axis=-1, keepdims=True), 1.0)
        pooled = pooled / denom  # cluster mean (M-step)
        centers = centers + nn.Dense(D, dtype=self.dtype, name="xattn_proj")(
            pooled
        )

        # ---- self-attention among centers ----
        h = nn.LayerNorm(dtype=self.dtype, name="sa_ln")(centers)
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="self_attn"
        )(h, h)
        centers = centers + sa

        # ---- FFN ----
        h = nn.LayerNorm(dtype=self.dtype, name="ffn_ln")(centers)
        h = nn.Dense(D * 4, dtype=self.dtype, name="ffn1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="ffn2")(h)
        return centers + h


class PixelDecoder(nn.Module):
    """FPN-style top-down decoder producing per-level features + os4 mask
    features."""

    dim: int
    mask_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        outs = {}
        prev = None
        for level in ["os32", "os16", "os8", "os4"]:
            lat = nn.Dense(self.dim, dtype=self.dtype, name=f"lat_{level}")(
                feats[level]
            )
            if prev is not None:
                up = jax.image.resize(
                    prev, (*lat.shape[:1], *lat.shape[1:3], prev.shape[-1]),
                    method="nearest",
                )
                lat = lat + up
            lat = nn.Conv(
                self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"smooth_{level}",
            )(lat)
            lat = nn.LayerNorm(dtype=self.dtype, name=f"ln_{level}")(lat)
            lat = nn.gelu(lat, approximate=False)
            outs[level] = lat
            prev = lat
        mask_feat = nn.Dense(self.mask_dim, dtype=self.dtype, name="mask_feat")(
            outs["os4"]
        )
        return outs, mask_feat


class KMaxDeepLab(nn.Module):
    cfg: KMaxConfig = KMAX_CONVNEXT_LARGE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images [B, H, W, 3] (normalized) ->
        (class_logits [B, N, num_classes + 1], mask_logits [B, H/4, W/4, N])
        """
        c = self.cfg
        feats = ConvNeXt(c.backbone, self.dtype, name="backbone")(images)
        dec_feats, mask_feat = PixelDecoder(
            c.dec_dim, c.mask_dim, self.dtype, name="pixel_decoder"
        )(feats)

        B = images.shape[0]
        centers = self.param(
            "cluster_centers", nn.initializers.normal(1.0),
            (c.num_queries, c.dec_dim),
        )
        centers = jnp.broadcast_to(
            centers.astype(self.dtype), (B, c.num_queries, c.dec_dim)
        )

        block_idx = 0
        for level, n_blocks in zip(["os32", "os16", "os8"], c.dec_blocks):
            f = dec_feats[level]
            pixels = f.reshape(B, -1, c.dec_dim)
            for _ in range(n_blocks):
                centers = KMaxBlock(
                    c.dec_dim, c.num_heads, self.dtype,
                    name=f"kmax_block{block_idx}",
                )(centers, pixels)
                block_idx += 1

        h = nn.LayerNorm(dtype=self.dtype, name="head_ln")(centers)
        class_logits = nn.Dense(
            c.num_classes + 1, dtype=self.dtype, name="class_head"
        )(h)
        mask_emb = nn.Dense(c.mask_dim, dtype=self.dtype, name="mask_head")(h)
        mask_logits = jnp.einsum("bhwd,bnd->bhwn", mask_feat, mask_emb)
        return class_logits, mask_logits


def panoptic_class_map(
    class_logits, mask_logits, out_hw, cfg: KMaxConfig, null_id: int = 133
):
    """Panoptic post-processing -> per-pixel category-id map.

    Mirrors the semantics of detectron2's panoptic inference + the
    reference's mask flattening (handy_utils.py:103-133): per-query class =
    argmax of the softmax over real classes; low-confidence queries are
    dropped; pixels pick their argmax query among survivors (weighted by
    class score, MaskFormer-style); unassigned pixels get `null_id`.

    Args:
      class_logits [N, C+1], mask_logits [h, w, N] (os4), out_hw target size.
    Returns: [out_h, out_w] int32 category-id map.
    """
    probs = jax.nn.softmax(class_logits, axis=-1)  # [N, C+1]
    scores = probs[:, :-1].max(axis=-1)  # best real class score
    classes = probs[:, :-1].argmax(axis=-1)
    keep = scores > cfg.class_threshold  # [N]

    mask_probs = jax.nn.sigmoid(mask_logits)  # [h, w, N]
    weighted = mask_probs * scores[None, None, :]
    weighted = jnp.where(keep[None, None, :], weighted, -1.0)
    best_q = jnp.argmax(weighted, axis=-1)  # [h, w]
    best_p = jnp.take_along_axis(
        mask_probs, best_q[..., None], axis=-1
    )[..., 0]
    any_keep = keep.any()
    cat = jnp.where(
        (best_p > cfg.mask_threshold) & any_keep, classes[best_q], null_id
    ).astype(jnp.int32)

    cat = jax.image.resize(
        cat[..., None].astype(jnp.float32),
        (out_hw[0], out_hw[1], 1),
        method="nearest",
    )[..., 0].astype(jnp.int32)
    return cat


# ImageNet statistics used by detectron2-style preprocessing
_PIXEL_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_PIXEL_STD = np.array([0.229, 0.224, 0.225], np.float32)


class KmaxSegmenter:
    """Engine with the reference's `run_on_image` contract
    (handy_utils.py:29-161): rgb [H, W, 3] float in [0, 1] -> per-pixel
    category-id mask [H, W] int32 with 133 = null."""

    def __init__(self, cfg: KMaxConfig = None, params=None, seed: int = 0):
        self.cfg = cfg or KMAX_CONVNEXT_LARGE
        self.model = KMaxDeepLab(self.cfg)
        if params is None:
            key = jax.random.PRNGKey(seed)
            probe = jnp.zeros((1, 64, 64, 3), jnp.float32)
            params = self.model.init(key, probe)
        self.params = params

        import functools

        @functools.partial(
            jax.jit, static_argnames=("crop_h4", "crop_w4", "out_h", "out_w")
        )
        def _infer(params, img, crop_h4, crop_w4, out_h, out_w):
            cls, masks = self.model.apply(params, img[None])
            # drop the pad-to-multiple-of-32 region before upsampling
            masks = masks[0][:crop_h4, :crop_w4]
            return panoptic_class_map(
                cls[0], masks, (out_h, out_w), self.cfg
            )

        self._infer = _infer

    @classmethod
    def tiny(cls, seed: int = 0) -> "KmaxSegmenter":
        return cls(KMAX_TINY_TEST, seed=seed)

    def _resize_for_test(self, rgb):
        """Resize long edge to cfg.test_long_edge keeping aspect, then pad to
        a multiple of 32 (the reference resizes long edge to 1281,
        handy_utils.py:76-90)."""
        H, W = rgb.shape[:2]
        long_edge = self.cfg.test_long_edge
        if W >= H:
            new_w, new_h = long_edge, int(round(long_edge * H / W))
        else:
            new_h, new_w = long_edge, int(round(long_edge * W / H))
        img = jax.image.resize(
            jnp.asarray(rgb), (new_h, new_w, 3), method="bilinear",
            antialias=False,
        )
        pad_h = (-new_h) % 32
        pad_w = (-new_w) % 32
        img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        return img, (new_h, new_w)

    def run_on_image(self, rgb) -> np.ndarray:
        rgb = np.asarray(rgb, np.float32)
        H, W = rgb.shape[:2]
        img, (new_h, new_w) = self._resize_for_test(rgb)
        img = (img - _PIXEL_MEAN) / _PIXEL_STD
        cat = self._infer(
            self.params, img, -(-new_h // 4), -(-new_w // 4), H, W
        )
        return np.asarray(cat)

    def run_on_batch(self, rgbs) -> np.ndarray:
        """Batched panoptic inference for a frame chunk [F, H, W, 3] (same
        size frames) -> [F, H, W] int32 masks. One forward batch feeds the
        MXU instead of F separate dispatches."""
        rgbs = np.asarray(rgbs, np.float32)
        F_, H, W = rgbs.shape[:3]
        img0, (new_h, new_w) = self._resize_for_test(rgbs[0])
        pad_h, pad_w = img0.shape[0], img0.shape[1]

        if not hasattr(self, "_infer_batch"):
            import functools

            @functools.partial(
                jax.jit,
                static_argnames=("crop_h4", "crop_w4", "out_h", "out_w"),
            )
            def _infer_batch(params, imgs, crop_h4, crop_w4, out_h, out_w):
                cls, masks = self.model.apply(params, imgs)
                masks = masks[:, :crop_h4, :crop_w4]
                return jax.vmap(
                    lambda c, m: panoptic_class_map(
                        c, m, (out_h, out_w), self.cfg
                    )
                )(cls, masks)

            self._infer_batch = _infer_batch

        imgs = jax.image.resize(
            jnp.asarray(rgbs), (F_, new_h, new_w, 3), method="bilinear",
            antialias=False,
        )
        imgs = jnp.pad(
            imgs, ((0, 0), (0, pad_h - new_h), (0, pad_w - new_w), (0, 0))
        )
        imgs = (imgs - _PIXEL_MEAN) / _PIXEL_STD
        cat = self._infer_batch(
            self.params, imgs, -(-new_h // 4), -(-new_w // 4), H, W
        )
        return np.asarray(cat)
