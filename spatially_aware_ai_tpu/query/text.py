"""Natural-language spatial-query math.

Ports the reference's text/query stack behaviorally (clipfusion.py:892-1039,
clip_seem_fusion.py:482-561, query_mesh.py):

- `run_query`: softmax(100 * feats @ text^T) relevance against contrast labels
- `clip_feature_surgery`: CLIP-Surgery-style redundant-feature removal across
  a label bank (the server's query path)
- `encode_text_with_prompt_ensemble`: mean of normalized per-template
  embeddings over the 85 ImageNet prompt templates (OpenAI CLIP's public
  prompt-engineering set)
- post-processing for heatmaps (mean-subtract / clamp / min-max, or the
  offline 2-sigma variant)

Everything is pure jnp on device; a full scene query is a single
text-embedding x vertex-feature matmul (MXU) plus element-wise post-ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 63 hand-picked contrast labels (reference clipfusion.py:19-83).
CONTROL_OBJECTS = [
    "airplane", "bag", "bed", "bedclothes", "bench", "bicycle", "bird",
    "boat", "book", "bottle", "building", "bus", "cabinet", "car", "cat",
    "ceiling", "chair", "cloth", "computer", "cow", "cup", "curtain", "dog",
    "door", "fence", "floor", "flower", "food", "grass", "ground", "horse",
    "keyboard", "light", "motorbike", "mountain", "mouse", "person", "plate",
    "platform", "potted plant", "road", "rock", "sheep", "shelves",
    "sidewalk", "sign", "sky", "snow", "sofa", "table", "track", "train",
    "tree", "truck", "tv monitor", "wall", "water", "window", "wood",
    "sharp edges", "computer screen", "rug", "sharp corners",
]

# OpenAI CLIP's 85 ImageNet prompt templates (public; reference
# clipfusion.py:939-1025 uses the same set).
PROMPT_TEMPLATES_85 = [
    "a bad photo of a {}.", "a photo of many {}.", "a sculpture of a {}.",
    "a photo of the hard to see {}.", "a low resolution photo of the {}.",
    "a rendering of a {}.", "graffiti of a {}.", "a bad photo of the {}.",
    "a cropped photo of the {}.", "a tattoo of a {}.", "the embroidered {}.",
    "a photo of a hard to see {}.", "a bright photo of a {}.",
    "a photo of a clean {}.", "a photo of a dirty {}.",
    "a dark photo of the {}.", "a drawing of a {}.", "a photo of my {}.",
    "the plastic {}.", "a photo of the cool {}.", "a close-up photo of a {}.",
    "a black and white photo of the {}.", "a painting of the {}.",
    "a painting of a {}.", "a pixelated photo of the {}.",
    "a sculpture of the {}.", "a bright photo of the {}.",
    "a cropped photo of a {}.", "a plastic {}.", "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.", "a blurry photo of the {}.",
    "a photo of the {}.", "a good photo of the {}.", "a rendering of the {}.",
    "a {} in a video game.", "a photo of one {}.", "a doodle of a {}.",
    "a close-up photo of the {}.", "a photo of a {}.", "the origami {}.",
    "the {} in a video game.", "a sketch of a {}.", "a doodle of the {}.",
    "a origami {}.", "a low resolution photo of a {}.", "the toy {}.",
    "a rendition of the {}.", "a photo of the clean {}.",
    "a photo of a large {}.", "a rendition of a {}.", "a photo of a nice {}.",
    "a photo of a weird {}.", "a blurry photo of a {}.", "a cartoon {}.",
    "art of a {}.", "a sketch of the {}.", "a embroidered {}.",
    "a pixelated photo of a {}.", "itap of the {}.",
    "a jpeg corrupted photo of the {}.", "a good photo of a {}.",
    "a plushie {}.", "a photo of the nice {}.", "a photo of the small {}.",
    "a photo of the weird {}.", "the cartoon {}.", "art of the {}.",
    "a drawing of the {}.", "a photo of the large {}.",
    "a black and white photo of a {}.", "the plushie {}.",
    "a dark photo of a {}.", "itap of a {}.", "graffiti of the {}.",
    "a toy {}.", "itap of my {}.", "a photo of a cool {}.",
    "a photo of a small {}.", "a tattoo of the {}.",
    "there is a {} in the scene.", "there is the {} in the scene.",
    "this is a {} in the scene.", "this is the {} in the scene.",
    "this is one {} in the scene.",
]


def run_query(img_feats, text_feats):
    """softmax(100 * img @ text^T). Text features must be L2-normalized; text
    feature dim is truncated to the image feature dim like the reference
    (clipfusion.py:899-904). Last label column is typically the query."""
    d = img_feats.shape[-1]
    dotprod = 100.0 * (img_feats @ text_feats[:, :d].T)
    return jax.nn.softmax(dotprod, axis=-1)


def clip_feature_surgery(image_features, text_features, redundant_feats=None):
    """CLIP-Surgery redundant-feature removal (reference clipfusion.py:906-934).

    image_features: [B, N, C] (L2-normalized), text_features: [L, C].
    Returns similarity [B, N, L].

    Reference-shaped implementation (materializes the [B, N, L, C]
    outer-product tensor like the original); production paths use the
    algebraically identical `clip_feature_surgery_fast`.
    """
    if redundant_feats is not None:
        return image_features @ (text_features - redundant_feats).T

    prob = image_features[:, :1, :] @ text_features.T  # [B, 1, L]
    prob = jax.nn.softmax(prob * 2, axis=-1)
    w = prob / prob.mean(axis=-1, keepdims=True)  # [B, 1, L]

    b, n_i, c = image_features.shape
    n_t = text_features.shape[0]
    feats = image_features.reshape(b, n_i, 1, c) * text_features.reshape(1, 1, n_t, c)
    feats = feats * w.reshape(b, 1, n_t, 1)
    redundant = feats.mean(axis=2, keepdims=True)
    feats = feats - redundant
    return feats.sum(axis=-1)


@jax.jit
def clip_feature_surgery_fast(image_features, text_features):
    """Algebraically identical to `clip_feature_surgery` without the
    [B, N, L, C] intermediate:

        sim[b,n,l] = w[b,l] * (img[b,n] . text[l])
                     - img[b,n] . mean_l(w[b,l] * text[l])

    Two matmuls instead of an O(N*L*C) materialization (at 100K vertices x
    60 labels x 512 dims the old tensor is 12 GB; this is the production
    query path)."""
    prob = image_features[:, :1, :] @ text_features.T  # [B, 1, L]
    prob = jax.nn.softmax(prob * 2, axis=-1)
    w = prob / prob.mean(axis=-1, keepdims=True)  # [B, 1, L]
    sims = (image_features @ text_features.T) * w  # [B, N, L]
    tbar = (w @ text_features) / text_features.shape[0]  # [B, 1, C]
    red = jnp.einsum("bnc,bxc->bnx", image_features, tbar)  # [B, N, 1]
    return sims - red


def encode_text_with_prompt_ensemble(encode_text_fn, tokenizer, texts,
                                     prompt_templates=None):
    """Mean-of-normalized-template-embeddings per class; output re-normalized.

    encode_text_fn: token_ids [B, 77] -> [B, C] (unnormalized).
    Returns [len(texts), C] numpy.
    """
    if prompt_templates is None:
        prompt_templates = PROMPT_TEMPLATES_85
    out = []
    for t in texts:
        prompted = [tpl.format(t) for tpl in prompt_templates]
        tokens = tokenizer(prompted)
        emb = encode_text_fn(jnp.asarray(tokens))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.mean(axis=0)
        mean = mean / jnp.linalg.norm(mean)
        out.append(np.asarray(mean))
    return np.stack(out, axis=0)


def query_relevance_postprocess(relevance):
    """Server-style heatmap normalization: mean-subtract, clamp to [0, 1],
    min-max normalize (reference clip_seem_fusion.py:527-533)."""
    relevance = np.asarray(relevance, np.float32)
    relevance = relevance - relevance.mean()
    relevance = np.clip(relevance, 0.0, 1.0)
    lo, hi = relevance.min(), relevance.max()
    return (relevance - lo) / (hi - lo + 1e-12)


def surgery_relevance_2sigma(relevance):
    """Offline query_mesh.py:68-73 variant: zero out values below
    median + 2 * std."""
    relevance = np.asarray(relevance, np.float32)
    med = np.median(relevance)
    std = relevance.std(ddof=1) if relevance.size > 1 else 0.0
    return np.where(relevance > med + 2 * std, relevance, 0.0)
