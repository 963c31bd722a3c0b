"""Checkpoint conversion for kMaX-DeepLab weights.

`convert_convnext_state_dict` maps the standard ConvNeXt torch layout
(facebookresearch/ConvNeXt, also used inside kMaX-DeepLab checkpoints under a
`backbone.` prefix) onto our Flax ConvNeXt. The kMaX decoder heads differ
structurally between released checkpoints; converting them requires the
matching config — `convert_kmax_checkpoint` raises with a clear message until
a checkpoint is supplied to validate against (none is downloadable in this
sandbox; the reference loads kmax_convnext_large.pth from disk,
clip_seem_fusion.py:78-79).
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


def convert_kmax_checkpoint(sd):  # pragma: no cover - requires a checkpoint
    raise NotImplementedError(
        "Full kMaX-DeepLab checkpoint conversion needs the official "
        "checkpoint to validate decoder-head tensor layouts against; supply "
        "kmax_convnext_large.pth and extend this converter (the backbone "
        "maps via convert_convnext_state_dict(sd, prefix='backbone.'))."
    )
