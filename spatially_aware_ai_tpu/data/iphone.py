"""3D Scanner App (iPhone LiDAR) scan loader.

Frame contract from the reference (clipfusion.py:259-374):
- files: frame_XXXXX.jpg (RGB 1920x1440), depth_XXXXX.png (16-bit mm,
  256x192), frame_XXXXX.json (intrinsics 3x3, cameraPoseARFrame 4x4,
  projectionMatrix, motionQuality, averageAngularVelocity)
- pose is ARKit right-up-back -> flipped to right-down-forward
- depth upscaled 4x (cubic), RGB downscaled (area) to 1024x768
- per-frame K scaled from the native RGB resolution
- frames with non-finite poses dropped
"""
from __future__ import annotations

import glob
import json
import os

import cv2
import numpy as np

from ..core.geometry import flip_ruB_to_rdf
from .base import Frame, FrameDataset


class IPhone3DScannerDataset(FrameDataset):
    def __init__(self, scan_dir: str, views_limit: int = 0):
        self.dataset_name = "iphone3dscanner"
        self.scan_dir = scan_dir

        rgb_files = sorted(glob.glob(os.path.join(scan_dir, "frame_*.jpg")))
        if views_limit > 0:
            rgb_files = rgb_files[:views_limit]

        entries = []
        for img_file in rgb_files:
            depth_file = img_file.replace(".jpg", ".png").replace(
                "frame_", "depth_"
            )
            pose_file = img_file.replace(".jpg", ".json")
            if os.path.exists(depth_file) and os.path.exists(pose_file):
                entries.append((img_file, depth_file, pose_file))
        if not entries:
            raise FileNotFoundError(f"no frames found in {scan_dir}")

        metas = []
        for _, _, pose_file in entries:
            with open(pose_file) as f:
                meta = json.load(f)
            K = np.array(meta["intrinsics"], np.float64).reshape(3, 3)
            pose = np.array(meta["cameraPoseARFrame"], np.float64).reshape(4, 4)
            pose = flip_ruB_to_rdf(pose.astype(np.float32))
            metas.append((K.astype(np.float32), pose))

        good = [i for i, (_, p) in enumerate(metas) if np.isfinite(p).all()]
        self.entries = [entries[i] for i in good]
        self.metas = [metas[i] for i in good]

        dep0 = cv2.imread(self.entries[0][1], cv2.IMREAD_ANYDEPTH)
        self.dep_h, self.dep_w = dep0.shape
        rgb0 = cv2.imread(self.entries[0][0])
        self.rgb_h, self.rgb_w = rgb0.shape[:2]
        # upsample depth 4x: 256x192 -> 1024x768
        self.imwidth = self.dep_w * 4
        self.imheight = self.dep_h * 4
        # the 4x cubic enlarge can run on device from the native uint16
        # frames (16x fewer depth bytes over the host->device link); the
        # pipeline checks this capability attribute (core/upsample.py)
        self.native_depth_scale = 4

    def __len__(self):
        return len(self.entries)

    # single definitions of the decode/rescale steps — __getitem__,
    # stacked_u8, and bounds_samples all share them, so their documented
    # bit-exactness relative to each other is structural
    def _load_rgb_u8(self, img_file: str) -> np.ndarray:
        rgb = cv2.cvtColor(cv2.imread(img_file), cv2.COLOR_BGR2RGB)
        return cv2.resize(
            rgb, (self.imwidth, self.imheight), None, 0, 0, cv2.INTER_AREA
        )

    def _load_depth(self, depth_file: str) -> np.ndarray:
        depth = cv2.imread(depth_file, cv2.IMREAD_ANYDEPTH)
        depth = cv2.resize(
            depth, (self.imwidth, self.imheight), None, 0, 0, cv2.INTER_CUBIC
        )
        return depth.astype(np.float32) / 1000.0

    def _scaled_K(self, K: np.ndarray) -> np.ndarray:
        Ki = K.copy()
        Ki[0] *= self.imwidth / self.rgb_w
        Ki[1] *= self.imheight / self.rgb_h
        return Ki

    def __getitem__(self, i: int) -> Frame:
        img_file, depth_file, _ = self.entries[i]
        K, pose = self.metas[i]
        rgb = self._load_rgb_u8(img_file).astype(np.float32) / 255.0
        return Frame(
            rgb=rgb, depth=self._load_depth(depth_file), pose=pose,
            K=self._scaled_K(K), index=i,
        )

    def stacked_u8(self, indices=None, native_depth=False):
        """Native-uint8 stacking for the quantized-transfer pipeline: RGB is
        decoded and INTER_AREA-resized in uint8 and passed through — the
        f32/255 -> rint*255 round-trip the default path performs is the
        identity on these values, so this is bit-exact and skips four
        full-frame conversions per chunk. Depth keeps the exact f32 cubic
        upsample from __getitem__ (the pipeline quantizes it to u16 mm) —
        unless native_depth=True, in which case the raw 256x192 uint16-mm
        frames are returned untouched (plus "depth_upsample": 4) and the
        pipeline performs the identical cubic enlarge on device
        (core/upsample.py), skipping both the host cv2 pass and 15/16 of
        the depth upload bytes."""
        if indices is None:
            indices = range(len(self))
        rgbs, depths, poses, Ks, idxs = [], [], [], [], []
        for i in indices:
            img_file, depth_file, _ = self.entries[i]
            K, pose = self.metas[i]
            rgbs.append(self._load_rgb_u8(img_file))
            if native_depth:
                depths.append(cv2.imread(depth_file, cv2.IMREAD_ANYDEPTH))
            else:
                depths.append(self._load_depth(depth_file))
            poses.append(pose)
            Ks.append(self._scaled_K(K))
            idxs.append(i)
        out = {
            "rgb": np.stack(rgbs),
            "depth": np.stack(depths),
            "pose": np.stack(poses),
            "K": np.stack(Ks),
            "index": np.array(idxs),
        }
        if native_depth:
            out["depth_upsample"] = self.native_depth_scale
        return out

    def bounds_samples(self, uv_size: int = 7):
        """Depth-only bounds pass: decode just the small 16-bit depth PNGs
        (RGB JPEGs are never touched — one saved decode per frame). The
        exact 4x-cubic upsample from __getitem__ is shared (_load_depth) so
        the bounds match the full-frame path bit-for-bit."""
        from ..core.bounds import subsample_grid

        uu, vv = subsample_grid(self.imwidth, self.imheight, uv_size)
        depths, poses, Ks = [], [], []
        for (_, depth_file, _), (K, pose) in zip(self.entries, self.metas):
            depths.append(self._load_depth(depth_file)[vv, uu])
            poses.append(pose)
            Ks.append(self._scaled_K(K))
        return np.stack(depths), uu, vv, np.stack(poses), np.stack(Ks)
