"""Magic Leap 2 scan preprocessing + loader.

The reference's ML2 path is an unfinished offline script with a per-pixel
Python registration loop and a breakpoint (magicleap2_camera_match.py;
SURVEY.md §2.9). This module completes it, fully vectorized:

- EXR depth read ('Y' float channel), via OpenEXR when available or cv2's
  EXR reader as fallback
- undistortion of both cameras (cv2)
- depth->RGB registration: unproject every depth pixel, transform by the
  relative pose, project into the RGB camera, cv2.remap — one vectorized
  pass instead of the reference's Python double loop
  (magicleap2_camera_match.py:146-163)
- `register_scan` writes registered rgb/depth + a merged per-frame metadata
  json so the result loads like any other RGB-D scan

The reference's server maps the "magicleap2" dataset name to the iPhone
loader (clip_seem_fusion.py:260-261); we keep that behavior for registered
scans via MagicLeap2Dataset.
"""
from __future__ import annotations

import glob
import json
import os

import cv2
import numpy as np

from .base import Frame, FrameDataset

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def read_exr_depth(filename: str) -> np.ndarray:
    """Read a float depth image: EXR 'Y' channel (via OpenEXR when
    available), or any cv2-readable float/uint16 format (TIFF, PNG...)."""
    if filename.lower().endswith(".exr"):
        try:
            import OpenEXR
            import Imath

            f = OpenEXR.InputFile(filename)
            dw = f.header()["dataWindow"]
            size = (dw.max.x - dw.min.x + 1, dw.max.y - dw.min.y + 1)
            depth = np.frombuffer(
                f.channel("Y", Imath.PixelType(Imath.PixelType.FLOAT)),
                dtype=np.float32,
            ).copy()
            depth.shape = (size[1], size[0])
            return depth
        except ImportError:
            pass  # fall through to cv2 (needs an EXR-enabled build)
    img = cv2.imread(filename, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise IOError(f"cannot read depth image {filename}")
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32)


def intrinsics_from_meta(meta: dict):
    intr = meta["intrinsics"]
    K = np.array(
        [
            [intr["FocalLength"]["x"], 0, intr["PrincipalPoint"]["x"]],
            [0, intr["FocalLength"]["y"], intr["PrincipalPoint"]["y"]],
            [0, 0, 1],
        ],
        np.float64,
    )
    dist = np.array(intr["Distortion"], np.float64)
    return K, dist


def extrinsic_from_meta(meta: dict) -> np.ndarray:
    p = meta["pose"]
    return np.array(
        [[p[f"e{i}{j}"] for j in range(4)] for i in range(4)], np.float64
    )


def register_depth_to_rgb(depth, depth_K, rgb_K, R_d2r, t_d2r):
    """Vectorized depth->RGB pixel mapping. Returns map [H, W, 2] float32 of
    RGB pixel coords per depth pixel (same math as the reference's loop)."""
    h, w = depth.shape
    u, v = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    pix = np.stack([u * depth, v * depth, depth], axis=-1)  # [H, W, 3]
    X = pix @ np.linalg.inv(depth_K).T
    Xt = X @ R_d2r.T + t_d2r
    z = np.where(np.abs(Xt[..., 2]) < 1e-9, 1e-9, Xt[..., 2])
    Xn = Xt / z[..., None]
    uv = Xn @ rgb_K.T
    return uv[..., :2].astype(np.float32)


def register_scan(base_dir: str, out_dir=None, depth_scale: float = 1.0):
    """Offline ML2 preprocessing: undistort + register every frame; writes
    frame_XXXXX.jpg / depth_XXXXX.png (mm) / frame_XXXXX.json into out_dir
    (default <base_dir>/registered) so the output is loadable by
    MagicLeap2Dataset / IPhone3DScannerDataset conventions."""
    out_dir = out_dir or os.path.join(base_dir, "registered")
    os.makedirs(out_dir, exist_ok=True)

    rgb_images = sorted(glob.glob(os.path.join(base_dir, "rgb", "*")))
    depth_images = sorted(glob.glob(os.path.join(base_dir, "depth", "*")))
    rgb_poses = sorted(glob.glob(os.path.join(base_dir, "rgbpose", "*")))
    depth_poses = sorted(glob.glob(os.path.join(base_dir, "depthpose", "*")))
    n = min(map(len, [rgb_images, depth_images, rgb_poses, depth_poses]))

    for i in range(n):
        rgb = cv2.imread(rgb_images[i])
        depth = read_exr_depth(depth_images[i]) * depth_scale
        with open(rgb_poses[i]) as f:
            rgb_meta = json.load(f)
        with open(depth_poses[i]) as f:
            depth_meta = json.load(f)

        rgb_K, rgb_dist = intrinsics_from_meta(rgb_meta)
        depth_K, depth_dist = intrinsics_from_meta(depth_meta)
        rgb_ext = extrinsic_from_meta(rgb_meta)
        depth_ext = extrinsic_from_meta(depth_meta)

        rgb = cv2.undistort(rgb, rgb_K, rgb_dist)
        depth = cv2.undistort(depth, depth_K, depth_dist)

        R_d2r = np.linalg.inv(depth_ext[:3, :3]) @ rgb_ext[:3, :3]
        t_d2r = rgb_ext[:3, 3] - R_d2r @ depth_ext[:3, 3]
        uv_map = register_depth_to_rgb(depth, depth_K, rgb_K, R_d2r, t_d2r)
        registered_rgb = cv2.remap(rgb, uv_map, None, cv2.INTER_LINEAR)

        cv2.imwrite(os.path.join(out_dir, f"frame_{i:05d}.jpg"),
                    registered_rgb)
        cv2.imwrite(
            os.path.join(out_dir, f"depth_{i:05d}.png"),
            np.clip(depth * 1000.0, 0, 65535).astype(np.uint16),
        )
        # pose of the depth camera in iPhone-loader conventions
        meta_out = {
            "intrinsics": depth_K.reshape(-1).tolist(),
            "cameraPoseARFrame": depth_ext.reshape(-1).tolist(),
            "projectionMatrix": np.eye(4).reshape(-1).tolist(),
            "motionQuality": 1.0,
            "averageAngularVelocity": 0.0,
        }
        with open(os.path.join(out_dir, f"frame_{i:05d}.json"), "w") as f:
            json.dump(meta_out, f)
    return out_dir


class MagicLeap2Dataset(FrameDataset):
    """Loads a registered ML2 scan; delegates to the iPhone loader like the
    reference's server does (clip_seem_fusion.py:260-261)."""

    def __init__(self, scan_dir: str, views_limit: int = 0):
        from .iphone import IPhone3DScannerDataset

        reg = (
            scan_dir
            if glob.glob(os.path.join(scan_dir, "frame_*.jpg"))
            else os.path.join(scan_dir, "registered")
        )
        self._inner = IPhone3DScannerDataset(reg, views_limit)
        self.dataset_name = "magicleap2"
        self.imwidth = self._inner.imwidth
        self.imheight = self._inner.imheight

    def __len__(self):
        return len(self._inner)

    def __getitem__(self, i: int) -> Frame:
        return self._inner[i]
