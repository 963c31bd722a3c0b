"""Synthetic RGB-D scene renderer: the test/bench oracle dataset.

The reference has no test fixtures at all (SURVEY.md §4); this renderer gives
the new framework ground truth: axis-aligned-box scenes rendered to RGB-D
frames with exact poses, intrinsics, per-pixel class labels, and known
geometry — so fusion, meshing, object segmentation, and inventory diffing are
all testable hermetically (and benchmarkable at any frame count/resolution).

Pure numpy ray-AABB casting, vectorized over pixels x boxes.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from .base import Frame, FrameDataset


@dataclasses.dataclass
class Box:
    lo: np.ndarray  # [3]
    hi: np.ndarray  # [3]
    color: np.ndarray  # [3] in [0, 1]
    class_id: int = 0
    name: str = ""

    def __post_init__(self):
        self.lo = np.asarray(self.lo, np.float32)
        self.hi = np.asarray(self.hi, np.float32)
        self.color = np.asarray(self.color, np.float32)


@dataclasses.dataclass
class SyntheticScene:
    boxes: List[Box]

    @staticmethod
    def demo_room(extra_boxes: Optional[Sequence[Box]] = None):
        """A 2x2x2 m room corner with a floor and a few labeled objects.

        Class ids follow the COCO-panoptic contiguous indexing the framework
        uses everywhere: floor-wood=87, table(-merged)=121, chair=56,
        suitcase=28 (see scene/colors.py).
        """
        boxes = [
            Box([-1.0, 0.95, -1.0], [1.0, 1.05, 1.0], [0.55, 0.40, 0.25],
                class_id=87, name="floor"),
            Box([-0.45, 0.55, -0.05], [0.15, 0.95, 0.45], [0.65, 0.35, 0.2],
                class_id=121, name="table"),
            Box([-0.30, 0.30, 0.05], [-0.05, 0.55, 0.30], [0.85, 0.1, 0.1],
                class_id=28, name="red_box"),
            Box([0.35, 0.65, -0.25], [0.75, 0.95, 0.15], [0.1, 0.2, 0.8],
                class_id=56, name="blue_chair"),
        ]
        if extra_boxes:
            boxes = boxes + list(extra_boxes)
        return SyntheticScene(boxes)

    def without(self, name: str) -> "SyntheticScene":
        return SyntheticScene([b for b in self.boxes if b.name != name])

    def render(self, pose, K, width: int, height: int, background_depth=0.0):
        """Render one frame. Returns (rgb [H,W,3], depth [H,W], labels [H,W]).

        depth is planar z-depth in the camera frame; pixels hitting nothing
        get `background_depth` (0 = invalid, matching real sensor output) and
        label -1 (callers map it to the null class, 133).
        """
        pose = np.asarray(pose, np.float32)
        K = np.asarray(K, np.float32)
        u, v = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
        uv1 = np.stack([u, v, np.ones_like(u)], axis=-1).reshape(-1, 3)
        dirs_cam = (np.linalg.inv(K) @ uv1.T).T  # z = 1
        R, t = pose[:3, :3], pose[:3, 3]
        dirs = dirs_cam @ R.T  # world
        origin = t[None, :]

        P = dirs.shape[0]
        best_t = np.full(P, np.inf, np.float32)
        best_box = np.full(P, -1, np.int32)
        inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)
        for bi, box in enumerate(self.boxes):
            t0 = (box.lo[None] - origin) * inv
            t1 = (box.hi[None] - origin) * inv
            tmin = np.minimum(t0, t1).max(axis=1)
            tmax = np.maximum(t0, t1).min(axis=1)
            hit_t = np.where(tmin > 1e-4, tmin, tmax)  # allow camera inside
            hit = (tmax >= np.maximum(tmin, 1e-4)) & (hit_t > 1e-4)
            closer = hit & (hit_t < best_t)
            best_t = np.where(closer, hit_t, best_t)
            best_box = np.where(closer, bi, best_box)

        depth = np.where(np.isinf(best_t), background_depth, best_t)
        colors = np.array([b.color for b in self.boxes], np.float32)
        labels = np.array([b.class_id for b in self.boxes], np.int32)
        rgb = np.where(
            (best_box >= 0)[:, None], colors[np.clip(best_box, 0, None)], 0.0
        )
        lab = np.where(best_box >= 0, labels[np.clip(best_box, 0, None)], -1)
        # cheap shading so RGB varies with geometry (depth-attenuated)
        shade = np.clip(1.0 - 0.15 * np.clip(best_t, 0, 4) / 4.0, 0.0, 1.0)
        rgb = rgb * np.where(np.isinf(best_t), 1.0, shade)[:, None]
        return (
            rgb.reshape(height, width, 3).astype(np.float32),
            depth.reshape(height, width).astype(np.float32),
            lab.reshape(height, width).astype(np.int32),
        )


def look_at_pose(position, target, up=(0.0, -1.0, 0.0)):
    """Camera-to-world pose, right-down-forward camera frame."""
    position = np.asarray(position, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - position
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(-upv, fwd)  # -up = world "down"
    nrm = np.linalg.norm(right)
    if nrm < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / nrm
    down = np.cross(fwd, right)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = right
    pose[:3, 1] = down
    pose[:3, 2] = fwd
    pose[:3, 3] = position
    return pose


class ColorSegmenter:
    """Ground-truth-ish panoptic segmenter for synthetic scenes: classifies
    each pixel by nearest box albedo direction (shading-invariant). Lets the
    full server pipeline run hermetically without kMaX weights."""

    def __init__(self, scene: SyntheticScene, null_id: int = 133):
        self.colors = np.stack([b.color for b in scene.boxes])
        self.colors /= np.linalg.norm(self.colors, axis=-1, keepdims=True)
        self.class_ids = np.array([b.class_id for b in scene.boxes], np.int32)
        self.null_id = null_id

    def run_on_image(self, rgb) -> np.ndarray:
        rgb = np.asarray(rgb, np.float32)
        norm = np.linalg.norm(rgb, axis=-1, keepdims=True)
        unit = rgb / np.maximum(norm, 1e-6)
        sim = unit @ self.colors.T  # [H, W, nboxes]
        label = self.class_ids[np.argmax(sim, axis=-1)]
        return np.where(norm[..., 0] < 0.05, self.null_id, label).astype(
            np.int32
        )


class ColorPanopticSegmenter(ColorSegmenter):
    """ColorSegmenter that additionally returns per-frame instance segment
    ids (box index + 1; 0 = unassigned), mirroring
    KmaxSegmenter.run_on_*_panoptic — so instance-aware label fusion is
    testable hermetically (two touching same-class boxes with distinct
    albedos resolve to distinct instances)."""

    def run_on_image_panoptic(self, rgb):
        rgb = np.asarray(rgb, np.float32)
        norm = np.linalg.norm(rgb, axis=-1, keepdims=True)
        unit = rgb / np.maximum(norm, 1e-6)
        sim = unit @ self.colors.T
        box = np.argmax(sim, axis=-1)
        valid = norm[..., 0] >= 0.05
        label = np.where(valid, self.class_ids[box], self.null_id)
        seg = np.where(valid, box + 1, 0)
        return label.astype(np.int32), seg.astype(np.int32)

    def run_on_batch_panoptic(self, rgbs):
        outs = [self.run_on_image_panoptic(r) for r in np.asarray(rgbs)]
        return (np.stack([o[0] for o in outs]),
                np.stack([o[1] for o in outs]))


class NoisySegmenter:
    """Wraps a segmenter with controlled label noise for vote-weighting
    ablations (r2 VERDICT next #9): a real kMaX mis-labels mostly at mask
    BOUNDARIES (mask misalignment) plus occasional whole-pixel flips.

    shift_px: per-frame random translation of the label map (boundary
    noise — misvotes land on voxels near surface edges, exactly where
    near_surface vote weighting should help); flip_prob: fraction of
    non-null pixels reassigned to a random other scene class."""

    def __init__(self, seg: ColorSegmenter, shift_px: int = 0,
                 flip_prob: float = 0.0, seed: int = 0):
        self.seg = seg
        self.shift_px = int(shift_px)
        self.flip_prob = float(flip_prob)
        self.rng = np.random.default_rng(seed)
        self.null_id = seg.null_id

    def _corrupt(self, label: np.ndarray) -> np.ndarray:
        if self.shift_px:
            dx, dy = self.rng.integers(-self.shift_px, self.shift_px + 1,
                                       size=2)
            label = np.roll(label, (int(dy), int(dx)), axis=(0, 1))
        if self.flip_prob > 0:
            classes = np.unique(self.seg.class_ids)
            flip = (self.rng.random(label.shape) < self.flip_prob) & (
                label != self.null_id
            )
            rand_cls = classes[
                self.rng.integers(0, len(classes), size=label.shape)
            ]
            label = np.where(flip, rand_cls, label)
        return label.astype(np.int32)

    def run_on_image(self, rgb) -> np.ndarray:
        return self._corrupt(self.seg.run_on_image(rgb))


class SyntheticSceneDataset(FrameDataset):
    """Orbit of cameras around the demo room, FrameDataset protocol."""

    @staticmethod
    def from_dir(scan_dir: str) -> "SyntheticSceneDataset":
        """Build from a version directory holding synthetic_scene.json:
        {"num_frames", "width", "height", "remove": [box names], "seed"}.
        Lets the manager's vNN input dirs define scene content (e.g. an
        object missing in a later scan version)."""
        import json
        import os

        params = {}
        cfg_path = os.path.join(scan_dir, "synthetic_scene.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                params = json.load(f)
        scene = SyntheticScene.demo_room()
        for name in params.pop("remove", []):
            scene = scene.without(name)
        return SyntheticSceneDataset(scene=scene, **params)

    def __init__(
        self,
        scene: Optional[SyntheticScene] = None,
        num_frames: int = 24,
        width: int = 128,
        height: int = 96,
        radius: float = 1.6,
        center=(0.0, 0.5, 0.1),
        fov_deg: float = 60.0,
        seed: int = 0,
    ):
        self.scene = scene or SyntheticScene.demo_room()
        self.imwidth = width
        self.imheight = height
        f = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
        self.K = np.array(
            [[f, 0, (width - 1) / 2], [0, f, (height - 1) / 2], [0, 0, 1]],
            np.float32,
        )
        center = np.asarray(center, np.float64)
        rng = np.random.default_rng(seed)
        self.poses = []
        for i in range(num_frames):
            ang = 2 * np.pi * i / num_frames
            pos = center + np.array(
                [radius * np.sin(ang), -0.6 + 0.1 * np.sin(3 * ang),
                 radius * np.cos(ang)]
            )
            jitter = rng.normal(scale=0.01, size=3)
            self.poses.append(look_at_pose(pos + jitter, center))
        self._cache = {}

    def __len__(self):
        return len(self.poses)

    def render_labels(self, i: int) -> np.ndarray:
        return self._render(i)[2]

    def _render(self, i: int):
        if i not in self._cache:
            self._cache[i] = self.scene.render(
                self.poses[i], self.K, self.imwidth, self.imheight
            )
        return self._cache[i]

    def __getitem__(self, i: int) -> Frame:
        rgb, depth, _ = self._render(i)
        return Frame(rgb=rgb, depth=depth, pose=self.poses[i], K=self.K, index=i)
