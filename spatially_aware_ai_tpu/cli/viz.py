"""Visualization scratch tools — viz_cam_coordinate.py / voxel_vis_plt.py
parity: dump camera-axis point clouds for a scan's poses, and plot an
occupancy view of a fused voxel grid.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def camera_axes_cloud(poses, axis_len: float = 0.1, samples: int = 10):
    """Per pose: 3 colored axis ray point sets (x red, y green, z blue)
    (reference viz_cam_coordinate.py)."""
    pts, cols = [], []
    colors = np.eye(3, dtype=np.float32)
    for pose in poses:
        origin = pose[:3, 3]
        for a in range(3):
            direction = pose[:3, a]
            t = np.linspace(0, axis_len, samples)[:, None]
            pts.append(origin[None] + t * direction[None])
            cols.append(np.tile(colors[a], (samples, 1)))
    return np.concatenate(pts), np.concatenate(cols)


def main(argv=None):
    from ..data import make_dataset
    from ..meshing.ply import write_ply

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    cam = sub.add_parser("cameras")
    cam.add_argument("scan_dir")
    cam.add_argument("--dataset", default="iphone")
    cam.add_argument("--out", default="camera_axes.ply")

    vox = sub.add_parser("voxels")
    vox.add_argument("version_dir", help="vNN output dir with voxel_rgb.npy")
    vox.add_argument("--out", default="voxels.png")

    args = parser.parse_args(argv)

    if args.cmd == "cameras":
        ds = make_dataset(args.dataset, args.scan_dir)
        poses = np.stack([ds[i].pose for i in range(len(ds))])
        pts, cols = camera_axes_cloud(poses)
        write_ply(args.out, pts, None, cols)
        print(f"saved {args.out} ({len(pts)} points)")
    elif args.cmd == "voxels":
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rgb = np.load(os.path.join(args.version_dir, "voxel_rgb.npy"))
        occ = (rgb > 0).any(axis=-1)
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        ax.voxels(occ, facecolors=np.clip(rgb, 0, 1), edgecolor=None)
        fig.savefig(args.out, dpi=120)
        print(f"saved {args.out} ({int(occ.sum())} occupied voxels)")


if __name__ == "__main__":
    main()
