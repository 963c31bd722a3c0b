"""CLIP (ViT image tower + causal text transformer) in Flax, TPU-native.

The reference runs open_clip's `ViT-B-32-quickgelu / laion400m_e32` torch model
(clipfusion.py:766-781, 1188-1189). This is a from-scratch JAX implementation
of the same architecture:

- pre-LN transformer blocks, quickgelu activation (x * sigmoid(1.702 x))
- image tower: 32x32 conv patchify, class token, learned positional embedding,
  ln_pre/ln_post, linear projection to the shared embedding space
- text tower: token + positional embeddings, causal mask, ln_final, features
  taken at the EOT token (position of the max token id), text projection

`encode_image` returns *unnormalized* embeddings, matching the reference's
fusion path which averages unnormalized features (clipfusion.py:833).

TPU notes: the whole patch set of a frame is encoded in ONE jitted batch
(the reference micro-batches 8 patches at a time on GPU, clipfusion.py:826).
Weights can run in bf16 (`param_dtype`) — matmuls land on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    quick_gelu: bool = True


VIT_B_32_QUICKGELU = CLIPConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MLP(nn.Module):
    width: int
    quick: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(x)
        h = quick_gelu(h) if self.quick else jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)


class Attention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # NOTE: jax.nn.dot_product_attention measured faster in an isolated
        # transformer microbench (30.7 vs 35.4 ms/chunk) but 11% SLOWER in
        # the full tiled-encode program on v5e (125 vs 140 fused fps) — the
        # hand-rolled formulation fuses better with the surrounding program.
        B, T, _ = x.shape
        hd = self.width // self.heads
        qkv = nn.Dense(self.width * 3, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            att = att + mask
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    quick: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + Attention(self.width, self.heads, self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x), mask
        )
        x = x + MLP(self.width, self.quick, self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        )
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    quick: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.layers):
            x = ResidualBlock(
                self.width, self.heads, self.quick, self.dtype, name=f"resblock_{i}"
            )(x, mask)
        return x


class VisionTower(nn.Module):
    cfg: CLIPConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] already channel-normalized. -> [B, embed_dim]"""
        c = self.cfg
        x = nn.Conv(
            c.vision_width,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(images)
        B = x.shape[0]
        x = x.reshape(B, -1, c.vision_width)  # [B, grid*grid, W]
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, c.vision_width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (x.shape[1], c.vision_width),
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        x = Transformer(
            c.vision_width, c.vision_layers, c.vision_heads, c.quick_gelu,
            self.dtype, name="transformer",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.vision_width, c.embed_dim)
        )
        return x @ proj.astype(x.dtype)


class TextTower(nn.Module):
    cfg: CLIPConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids):
        """token_ids: [B, context_length] int32 -> [B, embed_dim]"""
        c = self.cfg
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (c.vocab_size, c.text_width),
        )
        x = emb[token_ids].astype(self.dtype)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.text_width),
        )
        x = x + pos.astype(x.dtype)
        T = c.context_length
        mask = jnp.full((T, T), -jnp.inf).astype(x.dtype)
        mask = jnp.triu(mask, k=1)
        x = Transformer(
            c.text_width, c.text_layers, c.text_heads, c.quick_gelu,
            self.dtype, name="transformer",
        )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        # features at the EOT token = position of the highest token id
        eot = jnp.argmax(token_ids, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02),
            (c.text_width, c.embed_dim),
        )
        return x @ proj.astype(x.dtype)


class CLIP(nn.Module):
    """Bundles both towers. Use `.encode_image` / `.encode_text` via apply:

        model = CLIP(cfg)
        params = model.init(key, images, token_ids)
        img_feats = model.apply(params, images, method=CLIP.encode_image)
    """

    cfg: CLIPConfig = VIT_B_32_QUICKGELU
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = VisionTower(self.cfg, self.dtype)
        self.text = TextTower(self.cfg, self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, token_ids):
        return self.text(token_ids)

    def __call__(self, images, token_ids):
        img = self.encode_image(images)
        txt = self.encode_text(token_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return img, txt, jnp.exp(self.logit_scale)
