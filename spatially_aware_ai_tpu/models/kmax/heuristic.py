"""Weight-free heuristic panoptic segmenter.

Checkpoint-free environments still need object discovery for the full
pipeline (3D flood fill, inventory tracking, in-situ learning): this
segmenter clusters pixels by color + position (seeded k-means, a few Lloyd
iterations) and assigns each cluster one of the framework's spare object
class slots ("object-1".."object-9", ids 134..142; the label histogram
reserves them, scene/colors.py). Connected 3D regions of one cluster then
become object instances exactly like kMaX classes would.

Deterministic (fixed seed + ordered init), run_on_image / run_on_batch
compatible with KmaxSegmenter. Intended as a fallback / smoke-test
segmenter, not a competitor to kMaX with real weights.
"""
from __future__ import annotations

import numpy as np

from ...scene.colors import NULL_CLASS_ID

SPARE_CLASS_BASE = 134  # "object-1"


class HeuristicSegmenter:
    def __init__(self, num_clusters: int = 6, iterations: int = 8,
                 position_weight: float = 0.3, seed: int = 0,
                 downsample: int = 4, dark_threshold: float = 0.04):
        self.k = min(num_clusters, 9)
        self.iterations = iterations
        self.position_weight = position_weight
        self.seed = seed
        self.downsample = downsample
        self.dark_threshold = dark_threshold

    def _features(self, rgb):
        H, W = rgb.shape[:2]
        ys, xs = np.meshgrid(
            np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij"
        )
        pos = np.stack([ys, xs], axis=-1) * self.position_weight
        return np.concatenate([rgb, pos], axis=-1).reshape(-1, 5)

    def run_on_image(self, rgb) -> np.ndarray:
        rgb = np.asarray(rgb, np.float32)
        H, W = rgb.shape[:2]
        ds = self.downsample
        small = rgb[::ds, ::ds]
        feats = self._features(small)

        # deterministic k-means++-ish init: evenly spaced samples of the
        # luminance-sorted features
        lum = feats[:, :3].sum(-1)
        order = np.argsort(lum, kind="stable")
        centers = feats[order[np.linspace(0, len(order) - 1, self.k).astype(int)]]

        for _ in range(self.iterations):
            d2 = ((feats[:, None, :] - centers[None]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(self.k):
                m = assign == c
                if m.any():
                    centers[c] = feats[m].mean(axis=0)

        # full-res assignment against the final centers
        full = self._features(rgb)
        d2 = ((full[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = d2.argmin(axis=1).reshape(H, W)

        out = (SPARE_CLASS_BASE + assign).astype(np.int32)
        # very dark pixels = background/invalid (the synthetic renderer and
        # many sensors emit black for no-return regions)
        dark = rgb.sum(axis=-1) < self.dark_threshold * 3
        out[dark] = NULL_CLASS_ID
        return out

    def run_on_batch(self, rgbs) -> np.ndarray:
        return np.stack([self.run_on_image(r) for r in np.asarray(rgbs)])
