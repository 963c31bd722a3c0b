"""Checkpoint conversion for kMaX-DeepLab weights (detectron2-style naming).

`convert_convnext_state_dict` maps the standard ConvNeXt torch layout
(facebookresearch/ConvNeXt, used inside kMaX-DeepLab checkpoints under a
`backbone.` prefix) onto our Flax ConvNeXt.

`convert_kmax_checkpoint` maps a full kMaX-DeepLab checkpoint in the
detectron2/bytedance naming convention onto `model.KMaxDeepLab`'s Flax
params. The reference deploys exactly such a checkpoint
(`kmax/kmax_convnext_large.pth`, /root/reference/clip_seem_fusion.py:78-79,
handy_utils.py:29-45). The naming contract implemented here (reconstructed
from the official release's module structure; every ConvBN is `.conv` +
`.norm`):

    backbone.downsample_layers.* / backbone.stages.*           (ConvNeXt)
    sem_seg_head.pixel_decoder._in_norms.{0..3}                (os32->os4)
    sem_seg_head.pixel_decoder._aspp.{_conv0,_conv1.._conv3,_pool_conv,
                                      _proj_conv_bn_act}
    sem_seg_head.pixel_decoder._stages.{s}.{b}.<block>         s=0..3
        axial block:  _conv1_bn_act, _attn_h/_attn_w
                      (._qkv_conv_bn, .rel_bias, ._out_bn), _conv3_bn
        bottleneck:   _conv1_bn_act, _conv2_bn_act, _conv3_bn
    sem_seg_head.pixel_decoder._resized_fuses.{0..2}
        ._lowres_conv_bn / ._highres_conv_bn
    sem_seg_head.predictor._pixel_space_head_conv0bnact
    sem_seg_head.predictor._pixel_space_head_conv1bnact
    sem_seg_head.predictor._pixel_space_head_last_convbn
    sem_seg_head.predictor._transformer_mask_head
    sem_seg_head.predictor._transformer_class_head              (conv, no BN)
    sem_seg_head.predictor._pixel_space_mask_batch_norm         (BatchNorm(1))
    sem_seg_head.transformer_decoder._cluster_centers.weight
    sem_seg_head.transformer_decoder._class_embedding_projection
    sem_seg_head.transformer_decoder._mask_embedding_projection
    sem_seg_head.transformer_decoder._pixel_space_projections.{0..2}
    sem_seg_head.transformer_decoder._panoptic_feature_projection
    sem_seg_head.transformer_decoder._kmax_transformer_layers.{i}.
        {_pixel_v_conv_bn, _kmeans_query_conv3_bn, _query_qkv_conv_bn,
         _query_self_attention_out_conv_bn, _query_ffn_conv1_bn_act,
         _query_ffn_conv2_bn}

If a real checkpoint uses different leaf names, only the `_D2` table below
needs editing — all tensor-layout transforms (the hard part) are
parity-tested in tests/test_kmax_convert.py against a torch mirror that uses
these exact names.
"""
from __future__ import annotations

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_convnext_state_dict(sd, depths=(3, 3, 27, 3), prefix=""):
    """torch ConvNeXt state_dict -> flax params for models.kmax.ConvNeXt."""

    def g(name):
        return _np(sd[prefix + name])

    params = {
        "stem_conv": {
            # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
            "kernel": g("downsample_layers.0.0.weight").transpose(2, 3, 1, 0),
            "bias": g("downsample_layers.0.0.bias"),
        },
        "stem_norm": {
            "scale": g("downsample_layers.0.1.weight"),
            "bias": g("downsample_layers.0.1.bias"),
        },
    }
    for stage in range(4):
        if stage > 0:
            params[f"down{stage}_norm"] = {
                "scale": g(f"downsample_layers.{stage}.0.weight"),
                "bias": g(f"downsample_layers.{stage}.0.bias"),
            }
            params[f"down{stage}_conv"] = {
                "kernel": g(f"downsample_layers.{stage}.1.weight").transpose(
                    2, 3, 1, 0
                ),
                "bias": g(f"downsample_layers.{stage}.1.bias"),
            }
        for blk in range(depths[stage]):
            p = f"stages.{stage}.{blk}."
            dw = g(p + "dwconv.weight")  # [C, 1, 7, 7]
            params[f"stage{stage}_block{blk}"] = {
                "dwconv": {
                    "kernel": dw.transpose(2, 3, 1, 0),  # [7,7,1,C]
                    "bias": g(p + "dwconv.bias"),
                },
                "norm": {
                    "scale": g(p + "norm.weight"),
                    "bias": g(p + "norm.bias"),
                },
                "pwconv1": {
                    "kernel": g(p + "pwconv1.weight").T,
                    "bias": g(p + "pwconv1.bias"),
                },
                "pwconv2": {
                    "kernel": g(p + "pwconv2.weight").T,
                    "bias": g(p + "pwconv2.bias"),
                },
                "gamma": g(p + "gamma"),
            }
    return params


# -- leaf converters ---------------------------------------------------------


def _conv_kernel(w):
    """torch conv weight -> flax kernel. [out,in,kh,kw] -> [kh,kw,in,out];
    [out,in,k] -> [k,in,out]. Depthwise [C,1,kh,kw] maps the same way."""
    w = _np(w)
    if w.ndim == 4:
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 3:
        return w.transpose(2, 1, 0)
    raise ValueError(f"unexpected conv weight rank {w.ndim}")


def _convbn(sd, name):
    """ConvBN (.conv + optional .norm) -> flax {conv: {...}, bn: {...}}."""
    out = {"conv": {"kernel": _conv_kernel(sd[f"{name}.conv.weight"])}}
    if f"{name}.conv.bias" in sd:
        out["conv"]["bias"] = _np(sd[f"{name}.conv.bias"])
    if f"{name}.norm.weight" in sd:
        out["bn"] = {
            "scale": _np(sd[f"{name}.norm.weight"]),
            "bias": _np(sd[f"{name}.norm.bias"]),
            "mean": _np(sd[f"{name}.norm.running_mean"]),
            "var": _np(sd[f"{name}.norm.running_var"]),
        }
    return out


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _axial_attn(sd, name):
    return {
        "qkv": _convbn(sd, f"{name}._qkv_conv_bn"),
        "rel_bias": _np(sd[f"{name}.rel_bias"]),
        "out_bn": {
            "scale": _np(sd[f"{name}._out_bn.weight"]),
            "bias": _np(sd[f"{name}._out_bn.bias"]),
            "mean": _np(sd[f"{name}._out_bn.running_mean"]),
            "var": _np(sd[f"{name}._out_bn.running_var"]),
        },
    }


def _axial_block(sd, name):
    out = {
        "conv1": _convbn(sd, f"{name}._conv1_bn_act"),
        "attn_h": _axial_attn(sd, f"{name}._attn_h"),
        "attn_w": _axial_attn(sd, f"{name}._attn_w"),
        "conv3": _convbn(sd, f"{name}._conv3_bn"),
    }
    if f"{name}._shortcut.conv.weight" in sd:
        out["shortcut"] = _convbn(sd, f"{name}._shortcut")
    return out


def _bottleneck_block(sd, name):
    out = {
        "conv1": _convbn(sd, f"{name}._conv1_bn_act"),
        "conv2": _convbn(sd, f"{name}._conv2_bn_act"),
        "conv3": _convbn(sd, f"{name}._conv3_bn"),
    }
    if f"{name}._shortcut.conv.weight" in sd:
        out["shortcut"] = _convbn(sd, f"{name}._shortcut")
    return out


def convert_kmax_checkpoint(sd, cfg=None):
    """Full kMaX-DeepLab checkpoint (detectron2-style names, see module
    docstring) -> flax variables {'params': ...} for model.KMaxDeepLab.

    Accepts either a raw state_dict mapping or a detectron2 checkpoint dict
    with a 'model' key (DetectionCheckpointer format)."""
    from .model import KMAX_CONVNEXT_LARGE

    if "model" in sd and not any(k.startswith("backbone.") for k in sd):
        sd = sd["model"]
    cfg = cfg or KMAX_CONVNEXT_LARGE

    PD = "sem_seg_head.pixel_decoder"
    PR = "sem_seg_head.predictor"
    TD = "sem_seg_head.transformer_decoder"

    params = {
        "backbone": convert_convnext_state_dict(
            sd, depths=cfg.backbone.depths, prefix="backbone."
        ),
        "cluster_centers": _np(sd[f"{TD}._cluster_centers.weight"]),
        "class_emb_proj": _convbn(sd, f"{TD}._class_embedding_projection"),
        "mask_emb_proj": _convbn(sd, f"{TD}._mask_embedding_projection"),
        "panoptic_proj": _convbn(sd, f"{TD}._panoptic_feature_projection"),
    }

    # pixel decoder
    pd = {}
    for i, lv in enumerate(["os32", "os16", "os8", "os4"]):
        pd[f"in_norm_{lv}"] = _ln(sd, f"{PD}._in_norms.{i}")
    aspp = {
        "conv0": _convbn(sd, f"{PD}._aspp._conv0"),
        "pool_conv": _convbn(sd, f"{PD}._aspp._pool_conv"),
        "proj": _convbn(sd, f"{PD}._aspp._proj_conv_bn_act"),
    }
    for i in range(len(cfg.aspp_rates)):
        aspp[f"conv{i + 1}"] = _convbn(sd, f"{PD}._aspp._conv{i + 1}")
    pd["aspp"] = aspp
    for s, lv in enumerate(["os32", "os16", "os8", "os4"]):
        for b in range(cfg.pd_blocks[s]):
            name = f"{PD}._stages.{s}.{b}"
            if lv in ("os32", "os16"):
                pd[f"stage_{lv}_block{b}"] = _axial_block(sd, name)
            else:
                pd[f"stage_{lv}_block{b}"] = _bottleneck_block(sd, name)
    for i, lv in enumerate(["os16", "os8", "os4"]):
        pd[f"fuse_{lv}"] = {
            "lowres": _convbn(sd, f"{PD}._resized_fuses.{i}._lowres_conv_bn"),
            "highres": _convbn(
                sd, f"{PD}._resized_fuses.{i}._highres_conv_bn"
            ),
        }
    params["pixel_decoder"] = pd

    # predictor (shared heads)
    params["predictor"] = {
        "pixel_conv0": _convbn(sd, f"{PR}._pixel_space_head_conv0bnact"),
        "pixel_conv1": _convbn(sd, f"{PR}._pixel_space_head_conv1bnact"),
        "pixel_last": _convbn(sd, f"{PR}._pixel_space_head_last_convbn"),
        "mask_head": _convbn(sd, f"{PR}._transformer_mask_head"),
        "class_head": {
            "kernel": _conv_kernel(sd[f"{PR}._transformer_class_head.weight"]),
            "bias": _np(sd[f"{PR}._transformer_class_head.bias"]),
        },
        "mask_bn_scale": _np(sd[f"{PR}._pixel_space_mask_batch_norm.weight"]),
        "mask_bn_bias": _np(sd[f"{PR}._pixel_space_mask_batch_norm.bias"]),
        "mask_bn_mean": _np(
            sd[f"{PR}._pixel_space_mask_batch_norm.running_mean"]
        ),
        "mask_bn_var": _np(
            sd[f"{PR}._pixel_space_mask_batch_norm.running_var"]
        ),
    }

    # per-level pixel-space projections feeding the kMaX layers
    for i, lv in enumerate(["os32", "os16", "os8"]):
        params[f"pixel_space_{lv}"] = _convbn(
            sd, f"{TD}._pixel_space_projections.{i}"
        )

    # kMaX transformer layers
    for i in range(sum(cfg.dec_blocks)):
        L = f"{TD}._kmax_transformer_layers.{i}"
        params[f"kmax_layer{i}"] = {
            "pixel_v": _convbn(sd, f"{L}._pixel_v_conv_bn"),
            "kmeans_conv3": _convbn(sd, f"{L}._kmeans_query_conv3_bn"),
            "qkv": _convbn(sd, f"{L}._query_qkv_conv_bn"),
            "attn_out": _convbn(
                sd, f"{L}._query_self_attention_out_conv_bn"
            ),
            "ffn_conv1": _convbn(sd, f"{L}._query_ffn_conv1_bn_act"),
            "ffn_conv2": _convbn(sd, f"{L}._query_ffn_conv2_bn"),
        }
    return {"params": params}
