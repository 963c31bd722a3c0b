"""Turbo colormap (Google's improved-rainbow), used by the reference via
matplotlib's plt.cm.turbo for query heatmaps (clip_seem_fusion.py:544,
query_mesh.py:43). Implemented with the published polynomial approximation
(public domain) — visually identical to the LUT, dependency-free, and
jit-able on device.
"""
from __future__ import annotations

import numpy as np

_R = np.array([0.13572138, 4.61539260, -42.66032258, 132.13108234,
               -152.94239396, 59.28637943])
_G = np.array([0.09140261, 2.19418839, 4.84296658, -14.18503333,
               4.27729857, 2.82956604])
_B = np.array([0.10667330, 12.64194608, -60.58204836, 110.36276771,
               -89.90310912, 27.34824973])


def turbo_colormap(x):
    """x in [0, 1] (any shape) -> rgb float array [..., 3] in [0, 1]."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    v = np.stack([np.ones_like(x), x, x**2, x**3, x**4, x**5], axis=-1)
    rgb = np.stack([v @ _R, v @ _G, v @ _B], axis=-1)
    return np.clip(rgb, 0.0, 1.0).astype(np.float32)
