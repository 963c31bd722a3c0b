"""Checkpoint converters: open_clip / HuggingFace torch CLIP -> our Flax params.

The reference loads `ViT-B-32-quickgelu / laion400m_e32` via open_clip
(clipfusion.py:769). To reuse such a checkpoint on TPU, convert its state
dict with `convert_open_clip_state_dict` (accepts a dict of numpy arrays or
torch tensors). `convert_hf_state_dict` handles transformers' CLIPModel layout
and doubles as the parity-test path (tests/test_clip_parity.py).
"""
from __future__ import annotations

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _block_from_openclip(sd, prefix):
    return {
        "ln_1": {
            "scale": _np(sd[f"{prefix}.ln_1.weight"]),
            "bias": _np(sd[f"{prefix}.ln_1.bias"]),
        },
        "attn": {
            "in_proj": {
                "kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            },
            "out_proj": {
                "kernel": _np(sd[f"{prefix}.attn.out_proj.weight"]).T,
                "bias": _np(sd[f"{prefix}.attn.out_proj.bias"]),
            },
        },
        "ln_2": {
            "scale": _np(sd[f"{prefix}.ln_2.weight"]),
            "bias": _np(sd[f"{prefix}.ln_2.bias"]),
        },
        "mlp": {
            "c_fc": {
                "kernel": _np(sd[f"{prefix}.mlp.c_fc.weight"]).T,
                "bias": _np(sd[f"{prefix}.mlp.c_fc.bias"]),
            },
            "c_proj": {
                "kernel": _np(sd[f"{prefix}.mlp.c_proj.weight"]).T,
                "bias": _np(sd[f"{prefix}.mlp.c_proj.bias"]),
            },
        },
    }


def convert_open_clip_state_dict(sd, vision_layers=12, text_layers=12):
    """open_clip CLIP state_dict -> flax params pytree for models.clip.CLIP."""
    visual = {
        "conv1": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": {
            "scale": _np(sd["visual.ln_pre.weight"]),
            "bias": _np(sd["visual.ln_pre.bias"]),
        },
        "transformer": {
            f"resblock_{i}": _block_from_openclip(
                sd, f"visual.transformer.resblocks.{i}"
            )
            for i in range(vision_layers)
        },
        "ln_post": {
            "scale": _np(sd["visual.ln_post.weight"]),
            "bias": _np(sd["visual.ln_post.bias"]),
        },
        "proj": _np(sd["visual.proj"]),
    }
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "transformer": {
            f"resblock_{i}": _block_from_openclip(sd, f"transformer.resblocks.{i}")
            for i in range(text_layers)
        },
        "ln_final": {
            "scale": _np(sd["ln_final.weight"]),
            "bias": _np(sd["ln_final.bias"]),
        },
        "text_projection": _np(sd["text_projection"]),
    }
    return {
        "params": {
            "visual": visual,
            "text": text,
            "logit_scale": _np(sd["logit_scale"]),
        }
    }


def count_layers(sd, prefix: str) -> int:
    """Number of transformer blocks in a state dict: max integer following
    `prefix` (e.g. "visual.transformer.resblocks.") + 1; 0 when none."""
    n = 0
    for k in sd:
        if k.startswith(prefix):
            idx = k[len(prefix):].split(".", 1)[0]
            if idx.isdigit():
                n = max(n, int(idx) + 1)
    return n


def infer_clip_config(params, quick_gelu: bool = True,
                      vision_heads: int = 0, text_heads: int = 0):
    """Reconstruct a CLIPConfig from a converted params pytree's shapes.

    Everything except the head counts and the activation is determined by
    the weights: conv1 [P, P, 3, W] gives patch size + vision width, the
    positional embeddings give image size / context length, proj /
    text_projection give the embed dim. Heads default to width // 64 (the
    CLIP family convention, e.g. ViT-B/32: 768/64=12 vision, 512/64=8 text);
    pass them explicitly for non-standard models. quick_gelu defaults True —
    the reference deployment is ViT-B-32-quickgelu (clipfusion.py:1188)."""
    from .model import CLIPConfig

    p = params["params"] if "params" in params else params
    v, t = p["visual"], p["text"]
    patch = int(v["conv1"]["kernel"].shape[0])
    vision_width = int(v["conv1"]["kernel"].shape[3])
    n_pos = int(v["positional_embedding"].shape[0])  # 1 + (img/patch)^2
    image_size = int(round((n_pos - 1) ** 0.5)) * patch
    text_width = int(t["token_embedding"].shape[1])
    return CLIPConfig(
        embed_dim=int(v["proj"].shape[1]),
        image_size=image_size,
        patch_size=patch,
        vision_width=vision_width,
        vision_layers=len(v["transformer"]),
        vision_heads=vision_heads or max(1, vision_width // 64),
        vocab_size=int(t["token_embedding"].shape[0]),
        context_length=int(t["positional_embedding"].shape[0]),
        text_width=text_width,
        text_heads=text_heads or max(1, text_width // 64),
        text_layers=len(t["transformer"]),
        quick_gelu=quick_gelu,
    )


def _block_from_hf(sd, prefix):
    q = _np(sd[f"{prefix}.self_attn.q_proj.weight"])
    k = _np(sd[f"{prefix}.self_attn.k_proj.weight"])
    v = _np(sd[f"{prefix}.self_attn.v_proj.weight"])
    qb = _np(sd[f"{prefix}.self_attn.q_proj.bias"])
    kb = _np(sd[f"{prefix}.self_attn.k_proj.bias"])
    vb = _np(sd[f"{prefix}.self_attn.v_proj.bias"])
    return {
        "ln_1": {
            "scale": _np(sd[f"{prefix}.layer_norm1.weight"]),
            "bias": _np(sd[f"{prefix}.layer_norm1.bias"]),
        },
        "attn": {
            "in_proj": {
                "kernel": np.concatenate([q, k, v], axis=0).T,
                "bias": np.concatenate([qb, kb, vb], axis=0),
            },
            "out_proj": {
                "kernel": _np(sd[f"{prefix}.self_attn.out_proj.weight"]).T,
                "bias": _np(sd[f"{prefix}.self_attn.out_proj.bias"]),
            },
        },
        "ln_2": {
            "scale": _np(sd[f"{prefix}.layer_norm2.weight"]),
            "bias": _np(sd[f"{prefix}.layer_norm2.bias"]),
        },
        "mlp": {
            "c_fc": {
                "kernel": _np(sd[f"{prefix}.mlp.fc1.weight"]).T,
                "bias": _np(sd[f"{prefix}.mlp.fc1.bias"]),
            },
            "c_proj": {
                "kernel": _np(sd[f"{prefix}.mlp.fc2.weight"]).T,
                "bias": _np(sd[f"{prefix}.mlp.fc2.bias"]),
            },
        },
    }


def convert_hf_state_dict(sd, vision_layers=12, text_layers=12):
    """transformers CLIPModel state_dict -> flax params pytree."""
    visual = {
        "conv1": {
            "kernel": _np(sd["vision_model.embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _np(
            sd["vision_model.embeddings.position_embedding.weight"]
        ),
        "ln_pre": {
            "scale": _np(sd["vision_model.pre_layrnorm.weight"]),
            "bias": _np(sd["vision_model.pre_layrnorm.bias"]),
        },
        "transformer": {
            f"resblock_{i}": _block_from_hf(sd, f"vision_model.encoder.layers.{i}")
            for i in range(vision_layers)
        },
        "ln_post": {
            "scale": _np(sd["vision_model.post_layernorm.weight"]),
            "bias": _np(sd["vision_model.post_layernorm.bias"]),
        },
        "proj": _np(sd["visual_projection.weight"]).T,
    }
    text = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "positional_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "transformer": {
            f"resblock_{i}": _block_from_hf(sd, f"text_model.encoder.layers.{i}")
            for i in range(text_layers)
        },
        "ln_final": {
            "scale": _np(sd["text_model.final_layer_norm.weight"]),
            "bias": _np(sd["text_model.final_layer_norm.bias"]),
        },
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    return {
        "params": {
            "visual": visual,
            "text": text,
            "logit_scale": _np(sd["logit_scale"]),
        }
    }
