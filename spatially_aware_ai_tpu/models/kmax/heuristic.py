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


class GeometricSegmenter(HeuristicSegmenter):
    """Depth-aware weight-free segmenter: classifies large planar regions
    from depth normals (floor-ish horizontal planes -> 'floor-wood' 87,
    vertical planes -> 'wall-other' normalized id 131), and clusters the
    rest by color into spare object classes. Needs per-frame depth + K, so
    it exposes `segment(rgb, depth, K, pose)`; `run_on_image` falls back to
    color-only clustering when no depth is given.

    The camera frame is right-down-forward; with roughly upright capture the
    world 'up' is approximately -y in camera space, which is how floors are
    told from walls without poses. When a pose is provided, normals are
    rotated to world space for an exact up test.
    """

    FLOOR_ID = 87   # floor-wood
    WALL_ID = 131   # wall-other(-merged) -> "wall"

    def __init__(self, plane_cos: float = 0.8, min_region: float = 0.02,
                 **kw):
        super().__init__(**kw)
        self.plane_cos = plane_cos
        self.min_region = min_region

    def _normals(self, depth, K):
        H, W = depth.shape
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        us, vs = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
        X = (us - cx) / fx * depth
        Y = (vs - cy) / fy * depth
        pts = np.stack([X, Y, depth], axis=-1)
        dx = np.gradient(pts, axis=1)
        dy = np.gradient(pts, axis=0)
        n = np.cross(dx, dy)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.maximum(norm, 1e-9)

    def segment(self, rgb, depth, K, pose=None) -> np.ndarray:
        rgb = np.asarray(rgb, np.float32)
        depth = np.asarray(depth, np.float32)
        out = self.run_on_image(rgb)  # color clusters + null

        valid = depth > 0
        if valid.mean() < 0.05:
            return out
        normals = self._normals(depth, K)
        if pose is not None:
            normals = normals @ np.asarray(pose, np.float32)[:3, :3].T
            up = np.array([0.0, -1.0, 0.0], np.float32)
        else:
            up = np.array([0.0, -1.0, 0.0], np.float32)  # camera "up"
        cos_up = np.abs(normals @ up)

        floor = valid & (cos_up > self.plane_cos)
        wall = valid & (cos_up < (1 - self.plane_cos))
        if floor.mean() > self.min_region:
            out[floor] = self.FLOOR_ID
        if wall.mean() > self.min_region:
            out[wall] = self.WALL_ID
        return out
