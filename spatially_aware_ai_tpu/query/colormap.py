"""Turbo colormap for query heatmaps, matching the reference's plt.cm.turbo
(clip_seem_fusion.py:544, query_mesh.py:43).

Uses matplotlib's turbo LUT when available (exact parity with the reference's
colors); otherwise falls back to a piecewise-linear resample of a coarse
turbo anchor table (visually equivalent).
"""
from __future__ import annotations

import numpy as np

_LUT = None

# coarse turbo anchors (x = 0, 0.25, 0.5, 0.75, 1.0 from the published map)
_ANCHORS = np.array(
    [
        [0.18995, 0.07176, 0.23217],
        [0.15844, 0.73551, 0.92305],
        [0.64362, 0.98999, 0.23356],
        [0.98360, 0.49291, 0.12849],
        [0.47960, 0.01583, 0.01055],
    ],
    np.float32,
)


def _get_lut():
    global _LUT
    if _LUT is None:
        try:
            import matplotlib.pyplot as plt

            _LUT = plt.cm.turbo(np.linspace(0, 1, 256))[:, :3].astype(np.float32)
        except Exception:
            xs = np.linspace(0, 1, 256)
            anchor_x = np.linspace(0, 1, len(_ANCHORS))
            _LUT = np.stack(
                [np.interp(xs, anchor_x, _ANCHORS[:, c]) for c in range(3)], axis=-1
            ).astype(np.float32)
    return _LUT


def turbo_colormap(x):
    """x in [0, 1] (any shape) -> rgb float array [..., 3] in [0, 1]."""
    lut = _get_lut()
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    idx = np.round(x * 255).astype(np.int32)
    return lut[idx]
