"""Scene-bounds estimation: sparse depth backprojection + percentile bounds.

Reference behavior (clipfusion.py:510-572, 1100-1106): unproject a 7x7
subsample grid of every depth frame to a world point cloud, mask invalid /
over-max depths, then bounds = 1st/99th percentile +- trunc and
nvox = round((max - min) / voxel_size).

This pass is pure host numpy: the unprojection touches only 49 pixels per
frame, so subsampling before any device involvement avoids uploading full
depth frames, and the percentile is an O(F*49) sort.
"""
from __future__ import annotations

import numpy as np


def subsample_grid(width: int, height: int, uv_size: int = 7):
    """The reference's uv_size x uv_size bounds subsample grid
    (clipfusion.py:517-529): rounded linspace over each axis. Returns
    flattened (uu, vv) int32 pixel coords, xy meshgrid order."""
    u = np.round(np.linspace(0, width - 1, uv_size)).astype(np.int32)
    v = np.round(np.linspace(0, height - 1, uv_size)).astype(np.int32)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    return uu.reshape(-1), vv.reshape(-1)


def backproject_sparse_samples(depth, uu, vv, poses, Ks, max_depth=np.inf):
    """[M, 3] world cloud from per-frame depth SAMPLES.

    depth [F, P] meters at pixel coords (uu, vv) [P]; invalid / beyond-max
    samples removed (reference clipfusion.py:517-551, max_depth=4)."""
    depth = np.asarray(depth, np.float32)
    poses = np.asarray(poses, np.float32)
    Ks = np.asarray(Ks, np.float32)

    # rays = K^-1 @ [u, v, 1] at the sampled pixels (get_pix_vecs math)
    uv1 = np.stack(
        [uu.astype(np.float32), vv.astype(np.float32),
         np.ones_like(uu, np.float32)],
        axis=-1,
    )  # [P, 3]
    Kinv = np.linalg.inv(Ks)  # [F, 3, 3]
    rays = np.einsum("fij,pj->fpi", Kinv, uv1)  # [F, P, 3]

    xyz_cam = rays * depth[..., None]
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    xyz = np.einsum("fij,fpj->fpi", R, xyz_cam) + t[:, None, :]
    keep = ~np.isnan(depth) & (depth > 0) & (depth < max_depth)
    return xyz[keep].astype(np.float32)


def backproject_sparse_cloud(depth_imgs, poses, Ks, max_depth=np.inf, uv_size=7):
    """Returns an [M, 3] numpy world point cloud from a 7x7 subsample of every
    frame, with invalid/beyond-max depths removed (reference
    clipfusion.py:517-551 uses max_depth=4 for bounds).

    Pure host numpy: only 49 pixels per frame are needed, so subsampling
    happens BEFORE any device involvement — the previous device path
    uploaded every full depth frame (1.5 GB for a 500-frame iPhone scan)
    just to gather 49 samples each."""
    depth_imgs = np.asarray(depth_imgs)
    F, H, W = depth_imgs.shape
    uu, vv = subsample_grid(W, H, uv_size)
    return backproject_sparse_samples(
        depth_imgs[:, vv, uu], uu, vv, poses, Ks, max_depth
    )


def percentile_bounds(xyz, trunc_m, lo=1.0, hi=99.0):
    """minbound/maxbound = percentile(xyz, 1/99) -+ trunc
    (reference clipfusion.py:1100-1101)."""
    xyz = np.asarray(xyz)
    if len(xyz) == 0:
        raise ValueError(
            "no valid depth samples in the scan — cannot estimate scene "
            "bounds (all frames had empty/zero/NaN depth within max_depth)"
        )
    minbound = np.percentile(xyz, lo, axis=0).astype(np.float32) - trunc_m
    maxbound = np.percentile(xyz, hi, axis=0).astype(np.float32) + trunc_m
    return minbound, maxbound


def compute_grid_dims(minbound, maxbound, voxel_size):
    """nvox = round((max - min) / voxel_size) (reference clipfusion.py:1106).

    numpy round = round-half-to-even, same as torch's .round()."""
    nvox = np.round((np.asarray(maxbound) - np.asarray(minbound)) / voxel_size)
    return nvox.astype(np.int32)
