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

from ..attention import attention_mode as _attention_mode


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
        in_proj = nn.Dense(self.width * 3, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.width, dtype=self.dtype, name="out_proj")
        if not self.is_initializing() and _attention_mode() == "folded":
            # Head-folded formulation: identical math and the identical
            # parameter tree (in_proj [D,3D] / out_proj [D,D], open_clip
            # layout), but q/k/v come out of three einsums whose OUTPUT is
            # already [B,H,T,hd] and the output projection consumes
            # [B,H,T,hd] directly — no split, no head reshape/transpose,
            # no merge transpose. The weight reshapes below are free views.
            p = self.variables["params"]
            w = jnp.asarray(p["in_proj"]["kernel"], self.dtype)
            b = jnp.asarray(p["in_proj"]["bias"], self.dtype)
            wo = jnp.asarray(p["out_proj"]["kernel"], self.dtype)
            bo = jnp.asarray(p["out_proj"]["bias"], self.dtype)
            D = self.width
            w = w.reshape(D, 3, self.heads, hd)
            b = b.reshape(3, self.heads, hd)
            xc = jnp.asarray(x, self.dtype)
            q = jnp.einsum("btd,dhc->bhtc", xc, w[:, 0]) + b[0][:, None]
            k = jnp.einsum("btd,dhc->bhtc", xc, w[:, 1]) + b[1][:, None]
            v = jnp.einsum("btd,dhc->bhtc", xc, w[:, 2]) + b[2][:, None]
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
            if mask is not None:
                att = att + mask
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
            att = att.astype(xc.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
            out = jnp.einsum("bhtc,hcd->btd", out, wo.reshape(self.heads, hd, D))
            return out + bo
        qkv = in_proj(x)
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
        return out_proj(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    quick: bool
    dtype: Any = jnp.float32
    # Fused LN->MLP Pallas kernel: None = OFF by default for the CLIP
    # transformer (measured neutral-to-slightly-negative on v5e vs
    # ConvNeXt's 17-27% win — the interleaved attention lets XLA pipeline
    # the unfused MLP well); True forces it (interpret mode off-TPU)
    fused_mlp: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + Attention(self.width, self.heads, self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x), mask
        )
        ln_2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")
        mlp = MLP(self.width, self.quick, self.dtype, name="mlp")
        from ..pallas_mlp import use_fused_mlp

        if not self.is_initializing() and use_fused_mlp(
            self.width, self.fused_mlp, default_on=False
        ):
            # fused LN->c_fc->act->c_proj->residual (models/pallas_mlp.py):
            # the 4x hidden stays in VMEM. Params were registered by the
            # submodules above at init; read them directly.
            import jax as _jax

            from ..pallas_mlp import fused_ln_mlp

            v = self.variables["params"]
            B, T, D = x.shape
            flat = x.reshape(B * T, D)
            out = fused_ln_mlp(
                flat, flat,
                v["ln_2"]["scale"], v["ln_2"]["bias"],
                v["mlp"]["c_fc"]["kernel"], v["mlp"]["c_fc"]["bias"],
                v["mlp"]["c_proj"]["kernel"], v["mlp"]["c_proj"]["bias"],
                act="quick_gelu" if self.quick else "gelu", eps=1e-5,
                interpret=_jax.default_backend() != "tpu",
            )
            return out.reshape(B, T, D)
        return x + mlp(ln_2(x))


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


class PatchifyConv(nn.Module):
    """The ViT patch-embedding conv.

    Same param tree as `nn.Conv(name="conv1", use_bias=False)` (one HWIO
    `kernel`). The opt-in fused stem (tiling.py, SAI_FUSED_STEM=1) reads
    this kernel directly (engine._conv_kernel) and applies it as a matmul
    straight out of a channels-first unfold — a dense STRIDED conv variant
    measured slower on v5e (XLA im2cols 3-channel input poorly) and was
    removed."""

    width: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.patch, self.patch, 3, self.width),
        )
        return jax.lax.conv_general_dilated(
            images.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.patch, self.patch),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class VisionTower(nn.Module):
    cfg: CLIPConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.conv1 = PatchifyConv(c.vision_width, c.patch_size, self.dtype)
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        )
        n_tok = (c.image_size // c.patch_size) ** 2 + 1
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (n_tok, c.vision_width),
        )
        self.ln_pre = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.transformer = Transformer(
            c.vision_width, c.vision_layers, c.vision_heads, c.quick_gelu,
            self.dtype,
        )
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.proj = self.param(
            "proj", nn.initializers.normal(0.02),
            (c.vision_width, c.embed_dim),
        )

    def __call__(self, images):
        """images: [B, H, W, 3] already channel-normalized. -> [B, embed_dim]"""
        x = self.conv1(images)
        B = x.shape[0]
        x = x.reshape(B, -1, self.cfg.vision_width)  # [B, grid*grid, W]
        return self.encode_tokens(x)

    def encode_tokens(self, x):
        """Post-conv1 patch tokens [B, grid*grid, vision_width] (row-major
        over the token grid) -> [B, embed_dim]."""
        B = x.shape[0]
        c = self.cfg
        cls = self.class_embedding
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, c.vision_width)), x],
            axis=1,
        )
        x = x + self.positional_embedding.astype(x.dtype)
        x = self.ln_pre(x)
        x = self.transformer(x)
        x = self.ln_post(x[:, 0])
        return x @ self.proj.astype(x.dtype)


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

    def encode_image_tokens(self, tokens):
        """Fused tiled-CLIP stem: per-patch token grids
        [B, grid*grid, vision_width] -> [B, embed_dim] (the conv1 stem is
        applied by the caller as a matmul; see tiling.py)."""
        return self.visual.encode_tokens(tokens)

    def encode_text(self, token_ids):
        return self.text(token_ids)

    def __call__(self, images, token_ids):
        img = self.encode_image(images)
        txt = self.encode_text(token_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return img, txt, jnp.exp(self.logit_scale)
