"""ScanNet scan loader.

Frame contract from the reference (clipfusion.py:193-256): color/*.jpg,
depth/*.png (16-bit mm), pose/*.txt (4x4 cam-to-world, already
right-down-forward), intrinsic/intrinsic_depth.txt; frames with non-finite
poses dropped; keyframes selected by translation distance > 0.1 m; RGB
resized (bilinear) to the 640x480 depth resolution.
"""
from __future__ import annotations

import glob
import os

import cv2
import numpy as np

from .base import Frame, FrameDataset


class ScanNetDataset(FrameDataset):
    def __init__(self, scan_dir: str, keyframe_tdist: float = 0.1):
        self.dataset_name = "scannet"
        self.scan_dir = scan_dir

        def num_key(f):
            return int(os.path.basename(f).split(".")[0])

        rgb_files = sorted(
            glob.glob(os.path.join(scan_dir, "color/*.jpg")), key=num_key
        )
        depth_files = sorted(
            glob.glob(os.path.join(scan_dir, "depth/*.png")), key=num_key
        )
        pose_files = sorted(
            glob.glob(os.path.join(scan_dir, "pose/*.txt")), key=num_key
        )
        if not rgb_files:
            raise FileNotFoundError(f"no ScanNet frames in {scan_dir}")

        K_file = os.path.join(scan_dir, "intrinsic", "intrinsic_depth.txt")
        self.K = np.loadtxt(K_file).astype(np.float32)[:3, :3]

        poses = np.stack([np.loadtxt(f) for f in pose_files]).astype(np.float32)
        good = ~np.any(np.isinf(poses), axis=(1, 2))
        poses = poses[good]
        rgb_files = np.array(rgb_files)[good]
        depth_files = np.array(depth_files)[good]

        # keyframe selection by translation distance (clipfusion.py:226-233)
        kf_idx = [0]
        last = poses[0]
        for i in range(1, len(poses)):
            if np.linalg.norm(poses[i, :3, 3] - last[:3, 3]) > keyframe_tdist:
                kf_idx.append(i)
                last = poses[i]
        kf_idx = np.array(kf_idx)

        self.kf_idx = kf_idx
        self.poses = poses[kf_idx]
        self.rgb_files = rgb_files[kf_idx]
        self.depth_files = depth_files[kf_idx]
        self.imwidth = 640
        self.imheight = 480

    def __len__(self):
        return len(self.depth_files)

    def _load_rgb(self, i: int, as_u8: bool) -> np.ndarray:
        """Shared decode+resize. as_u8 resizes in fixed-point uint8 (within
        1 LSB of the f32 path); f32 matches the reference's resize-on-float
        exactly."""
        rgb = cv2.cvtColor(cv2.imread(self.rgb_files[i]), cv2.COLOR_BGR2RGB)
        if not as_u8:
            rgb = rgb.astype(np.float32) / 255.0
        if rgb.shape[:2] != (self.imheight, self.imwidth):
            rgb = cv2.resize(
                rgb, (self.imwidth, self.imheight), None, 0, 0,
                cv2.INTER_LINEAR,
            )
        return rgb

    def __getitem__(self, i: int) -> Frame:
        depth = cv2.imread(self.depth_files[i], cv2.IMREAD_ANYDEPTH)
        depth = depth.astype(np.float32) / 1000.0
        return Frame(
            rgb=self._load_rgb(i, as_u8=False), depth=depth,
            pose=self.poses[i], K=self.K, index=int(self.kf_idx[i]),
        )

    def stacked_u8(self, indices=None):
        """Native-precision stacking for the quantized-transfer pipeline:
        rgb stays uint8 (resized in fixed-point; within 1/255 of the f32
        round-trip), depth stays the sensor's uint16 millimeters — the
        pipeline's own u16 quantization of the f32 path is the identity on
        these values, so this skips four full-frame conversions per chunk."""
        if indices is None:
            indices = range(len(self))
        rgbs, depths, poses, idxs = [], [], [], []
        for i in indices:
            rgbs.append(self._load_rgb(i, as_u8=True))
            depths.append(
                cv2.imread(self.depth_files[i], cv2.IMREAD_ANYDEPTH)
            )
            poses.append(self.poses[i])
            idxs.append(int(self.kf_idx[i]))
        return {
            "rgb": np.stack(rgbs),
            "depth": np.stack(depths).astype(np.uint16),
            "pose": np.stack(poses),
            "K": np.stack([self.K] * len(rgbs)),
            "index": np.array(idxs),
        }
