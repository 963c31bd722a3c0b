"""LERF (nerfstudio) scan loader.

Frame contract from the reference (clipfusion.py:86-190): images/*.jpg +
depth_simplerecon/*.png (16-bit mm) matched by frame id; transforms.json
provides poses (OpenGL right-up-back, optionally pre-multiplied by the
inverse applied_transform) and shared or per-frame intrinsics; everything is
resized to the depth resolution.
"""
from __future__ import annotations

import glob
import json
import os

import cv2
import numpy as np

from ..core.geometry import flip_ruB_to_rdf
from .base import Frame, FrameDataset


class LERFDataset(FrameDataset):
    def __init__(self, scan_dir: str):
        self.dataset_name = "lerf"
        rgb_files = sorted(glob.glob(os.path.join(scan_dir, "images/*.jpg")))
        depth_files = sorted(
            glob.glob(os.path.join(scan_dir, "depth_simplerecon/*.png"))
        )
        with open(os.path.join(scan_dir, "transforms.json")) as f:
            transforms = json.load(f)

        frames = sorted(transforms["frames"], key=lambda fr: fr["file_path"])

        def fid(path):
            return os.path.basename(path).split(".")[0]

        rgb_by_id = {fid(f): f for f in rgb_files}
        depth_by_id = {fid(f): f for f in depth_files}

        applied_inv = None
        if "applied_transform" in transforms:
            t = np.eye(4)
            t[:3] = np.array(transforms["applied_transform"])
            applied_inv = np.linalg.inv(t)

        rgb0 = cv2.imread(next(iter(rgb_by_id.values())))
        native_h, native_w = rgb0.shape[:2]
        dep0 = cv2.imread(next(iter(depth_by_id.values())), cv2.IMREAD_ANYDEPTH)
        self.imheight, self.imwidth = dep0.shape

        self.entries = []
        for fr in frames:
            frame_id = fid(fr["file_path"])
            if frame_id not in rgb_by_id or frame_id not in depth_by_id:
                continue
            pose = np.array(fr["transform_matrix"], np.float64)
            if applied_inv is not None:
                pose = applied_inv @ pose
            pose = flip_ruB_to_rdf(pose.astype(np.float32))

            src = fr if "fl_x" in fr else transforms
            K = np.array(
                [
                    [src["fl_x"], 0, src["cx"]],
                    [0, src["fl_y"], src["cy"]],
                    [0, 0, 1],
                ],
                np.float32,
            )
            K[0] *= self.imwidth / native_w
            K[1] *= self.imheight / native_h
            self.entries.append(
                (rgb_by_id[frame_id], depth_by_id[frame_id], pose, K)
            )

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i: int) -> Frame:
        rgb_file, depth_file, pose, K = self.entries[i]
        rgb = cv2.cvtColor(cv2.imread(rgb_file), cv2.COLOR_BGR2RGB)
        rgb = cv2.resize(
            rgb, (self.imwidth, self.imheight), None, 0, 0, cv2.INTER_AREA
        ).astype(np.float32) / 255.0
        depth = cv2.imread(depth_file, cv2.IMREAD_ANYDEPTH)
        depth = depth.astype(np.float32) / 1000.0
        return Frame(rgb=rgb, depth=depth, pose=pose, K=K, index=i)
