"""High-level CLIP engine: bundles model + params + tokenizer behind the same
API surface the reference's `Clip` wrapper exposes (clipfusion.py:766-1039):
tiled image inference, text inference, run_query, clip_feature_surgery,
prompt-ensemble text encoding.

TPU-native details: encode functions are jitted once per shape; the whole
patch set of a frame is encoded in one batch; weights can be bf16.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...query import text as query_text
from .model import CLIP, CLIPConfig, VIT_B_32_QUICKGELU
from .tiling import tiled_image_features, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from .tokenizer import ClipTokenizer


class ClipEngine:
    def __init__(self, cfg: CLIPConfig, params, bpe_path: Optional[str] = None,
                 compute_dtype=None):
        """compute_dtype None = bfloat16 on TPU, float32 elsewhere (bf16
        measured ~8% faster tiled encode on v5e; embeddings are
        cosine-normalized downstream so bf16 activations are safe). Params
        stay f32; embeddings are cast back to f32. Pass jnp.float32 to force
        full precision."""
        import os

        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32
            )
        self.cfg = cfg
        self.model = CLIP(cfg, dtype=compute_dtype)
        self.compute_dtype = compute_dtype
        self.params = params
        # standard CLIP BPE vocab path: explicit arg, else SAI_BPE_VOCAB env
        self.tokenizer = ClipTokenizer(
            bpe_path or os.environ.get("SAI_BPE_VOCAB")
        )
        self.feature_dim = cfg.embed_dim

        @jax.jit
        def _encode_image(p, images):
            out = self.model.apply(
                p, images.astype(compute_dtype), method=CLIP.encode_image
            )
            return out.astype(jnp.float32)

        @jax.jit
        def _encode_text(p, token_ids):
            out = self.model.apply(p, token_ids, method=CLIP.encode_text)
            return out.astype(jnp.float32)

        @jax.jit
        def _encode_tokens(p, tokens):
            out = self.model.apply(
                p, tokens.astype(compute_dtype),
                method=CLIP.encode_image_tokens,
            )
            return out.astype(jnp.float32)

        def _conv_kernel(p):
            return p["params"]["visual"]["conv1"]["kernel"]

        self._encode_image = _encode_image
        self._encode_text = _encode_text
        self._encode_tokens = _encode_tokens
        self._conv_kernel = _conv_kernel
        # fused conv stem (tiling.py): opt-in via SAI_FUSED_STEM=1.
        # Measured NEGATIVE on v5e-1 at the default operating point (encode
        # 207-190 fps vs 223 unfused) in both formulations tried — a dense
        # strided conv1 over the frame, and a channels-first unfold + matmul
        # — because prep is no longer the encode bottleneck after the
        # bf16-prep + k^2-slice-unfold rounds; kept for parity testing and
        # for hardware where the patch-tensor materialization dominates.
        self._use_fused_stem = (
            cfg.image_size == 224
            and os.environ.get("SAI_FUSED_STEM", "0") == "1"
        )

    # -- constructors -------------------------------------------------------

    @classmethod
    def random(cls, cfg: CLIPConfig = None, seed: int = 0,
               bpe_path: Optional[str] = None,
               compute_dtype=None) -> "ClipEngine":
        """Randomly initialized engine (tests / environments w/o weights)."""
        cfg = cfg or VIT_B_32_QUICKGELU
        model = CLIP(cfg)
        key = jax.random.PRNGKey(seed)
        imgs = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        ids = jnp.zeros((1, cfg.context_length), jnp.int32)
        params = model.init(key, imgs, ids)
        return cls(cfg, params, bpe_path, compute_dtype=compute_dtype)

    @classmethod
    def tiny(cls, seed: int = 0) -> "ClipEngine":
        """A small-config engine for tests (feature_dim 32)."""
        cfg = CLIPConfig(
            embed_dim=32, image_size=224, patch_size=56, vision_width=64,
            vision_layers=2, vision_heads=4, vocab_size=49408,
            context_length=77, text_width=64, text_heads=4, text_layers=2,
        )
        return cls.random(cfg, seed)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: CLIPConfig = None,
                        bpe_path: Optional[str] = None,
                        compute_dtype=None,
                        allow_fallback_vocab: bool = False) -> "ClipEngine":
        """Load converted params (pickle produced by cli/convert_clip).

        Real checkpoints were trained against the standard CLIP BPE vocab
        (open_clip's bpe_simple_vocab_16e6.txt.gz, clipfusion.py:772); pairing
        them with the merge-free byte fallback would silently produce garbage
        text embeddings, so this constructor REQUIRES the standard vocab
        (via `bpe_path` or the SAI_BPE_VOCAB env var) unless
        `allow_fallback_vocab=True` is passed explicitly.
        """
        import os
        import pickle

        with open(path, "rb") as f:
            params = pickle.load(f)
        if (
            isinstance(params, dict)
            and params.get("format") == "sai_clip_params"
        ):
            # self-describing pickle (cli/convert_clip embeds the shape-
            # inferred config); an explicit cfg arg still wins
            cfg = cfg or CLIPConfig(**params["config"])
            params = params["params"]
        cfg = cfg or VIT_B_32_QUICKGELU
        engine = cls(cfg, params, bpe_path, compute_dtype=compute_dtype)
        if not engine.tokenizer.has_standard_vocab:
            msg = (
                "ClipEngine.from_checkpoint: no standard BPE vocab found "
                f"(bpe_path={bpe_path!r}, SAI_BPE_VOCAB="
                f"{os.environ.get('SAI_BPE_VOCAB')!r}). Converted CLIP "
                "weights require open_clip's bpe_simple_vocab_16e6.txt.gz; "
                "the byte-level fallback tokenizer would produce garbage "
                "text embeddings. Provide the vocab file, or pass "
                "allow_fallback_vocab=True to proceed anyway (image-only "
                "use)."
            )
            if not allow_fallback_vocab:
                raise FileNotFoundError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return engine

    # -- image side ----------------------------------------------------------

    def encode_image(self, images) -> jnp.ndarray:
        """images [B, 224, 224, 3], channel-normalized -> [B, C]."""
        return self._encode_image(self.params, images)

    def img_inference_tiled(self, img, patch_size: int, patch_stride: int):
        """One frame [H, W, 3] in [0, 1] -> [ny, nx, C] feature image
        (reference clipfusion.py:808-839, one fused batch instead of
        micro-batches of 8)."""
        # NOTE: pass the stable jitted function object as the static
        # encode_fn so the tiling jit caches per (shape, stride) only.
        return tiled_image_features(
            self.params,
            jnp.asarray(img),
            patch_size=patch_size,
            patch_stride=patch_stride,
            encode_fn=self._encode_image,
            vit_size=self.cfg.image_size,
        )

    def img_inference_tiled_depthscaled(self, img, depth, K,
                                        patch_stride: int,
                                        footprint_m: float = 0.5):
        """Depth-scaled variant (constant physical footprint per patch)."""
        from .tiling import tiled_image_features_depthscaled

        return tiled_image_features_depthscaled(
            self.params,
            jnp.asarray(img),
            jnp.asarray(depth),
            jnp.asarray(K),
            patch_stride=patch_stride,
            encode_fn=self._encode_image,
            footprint_m=footprint_m,
            vit_size=self.cfg.image_size,
        )

    def img_inference_tiled_batch(self, imgs, patch_size: int,
                                  patch_stride: int):
        """Whole frame chunk [F, H, W, 3] -> [F, ny, nx, C] in one batch."""
        from .tiling import tiled_image_features_batch

        fused = self._use_fused_stem
        return tiled_image_features_batch(
            self.params,
            jnp.asarray(imgs),
            patch_size=patch_size,
            patch_stride=patch_stride,
            encode_fn=self._encode_image,
            prep_dtype=self.compute_dtype,
            conv_kernel_fn=self._conv_kernel if fused else None,
            encode_tokens_fn=self._encode_tokens if fused else None,
            conv_patch=self.cfg.patch_size if fused else None,
            vit_size=self.cfg.image_size,
        )

    # -- text side -----------------------------------------------------------

    def text_inference(self, texts: Sequence[str]) -> np.ndarray:
        """Tokenize + encode + L2 normalize (reference clipfusion.py:892-897)."""
        tokens = jnp.asarray(self.tokenizer(list(texts)))
        feats = self._encode_text(self.params, tokens)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return np.asarray(feats)

    def encode_text_with_prompt_ensemble(self, texts, prompt_templates=None):
        return query_text.encode_text_with_prompt_ensemble(
            lambda ids: self._encode_text(self.params, ids),
            self.tokenizer,
            texts,
            prompt_templates,
        )

    @property
    def _QUERY_V_BUCKET(self):
        # the SAME bucket meshing/extract pads device vertex features to —
        # the device-path detection below keys on it, so they must agree
        from ...meshing.extract import VERT_BUCKET

        return VERT_BUCKET

    def run_query(self, img_feats, labels: Sequence[str]) -> np.ndarray:
        """softmax(100 * img @ text^T) relevance (clipfusion.py:899-904).

        The vertex axis is bucket-padded so the jitted matmul is
        shape-stable across scans (per-scan vertex counts would otherwise
        recompile through the slow remote-compile path on every scan)."""
        text_feats = self.text_inference(labels)
        if (not isinstance(img_feats, np.ndarray)
                and hasattr(img_feats, "shape")
                and img_feats.ndim == 2
                and img_feats.shape[0] % self._QUERY_V_BUCKET == 0):
            # already a bucket-padded DEVICE array (extract_mesh
            # feats_on_device): query it in place — coercing to numpy here
            # would put a ~100 MB download + re-upload on the query path
            out = self._run_query_jit(img_feats, jnp.asarray(text_feats))
            return np.asarray(out)
        img_feats = np.asarray(img_feats, np.float32)
        n = len(img_feats)
        vb = max(self._QUERY_V_BUCKET,
                 -(-n // self._QUERY_V_BUCKET) * self._QUERY_V_BUCKET)
        if vb != n:
            img_feats = np.pad(img_feats, ((0, vb - n), (0, 0)))
        out = self._run_query_jit(
            jnp.asarray(img_feats), jnp.asarray(text_feats)
        )
        return np.asarray(out)[:n]

    @staticmethod
    @functools.partial(jax.jit)
    def _run_query_jit(img_feats, text_feats):
        return query_text.run_query(img_feats, text_feats)

    @staticmethod
    def clip_feature_surgery(image_features, text_features, redundant_feats=None):
        return np.asarray(
            query_text.clip_feature_surgery(
                jnp.asarray(image_features),
                jnp.asarray(text_features),
                None if redundant_feats is None else jnp.asarray(redundant_feats),
            )
        )
