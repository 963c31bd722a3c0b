"""Scene-bounds estimation: sparse depth backprojection + percentile bounds.

Reference behavior (clipfusion.py:510-572, 1100-1106): unproject a 7x7
subsample grid of every depth frame to a world point cloud, mask invalid /
over-max depths, then bounds = 1st/99th percentile +- trunc and
nvox = round((max - min) / voxel_size).

TPU-native version: the per-frame unprojection is one batched jit over all
frames at once (frames x 49 points is tiny); the percentile runs in numpy on
host (it is a O(F*49) sort).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import cam_to_world, get_pix_vecs


@functools.partial(jax.jit, static_argnames=("imwidth", "imheight", "uv_size"))
def _backproject_batch(depth_imgs, poses, Ks, *, imwidth, imheight, uv_size=7):
    """depth_imgs [F, H, W], poses [F, 4, 4], Ks [F, 3, 3] ->
    (xyz [F, uv_size^2, 3], valid [F, uv_size^2])."""
    u = jnp.round(jnp.linspace(0, imwidth - 1, uv_size)).astype(jnp.int32)
    v = jnp.round(jnp.linspace(0, imheight - 1, uv_size)).astype(jnp.int32)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    uu = uu.reshape(-1)
    vv = vv.reshape(-1)

    pix_vecs = get_pix_vecs(imwidth, imheight, Ks)  # [F, H, W, 3]
    rays = pix_vecs[:, vv, uu]  # [F, P, 3]
    depth = depth_imgs[:, vv, uu]  # [F, P]
    xyz_cam = rays * depth[..., None]
    xyz_world = cam_to_world(xyz_cam, poses)
    valid = ~jnp.isnan(depth) & (depth > 0)
    return xyz_world, valid, depth


def backproject_sparse_cloud(depth_imgs, poses, Ks, max_depth=np.inf, uv_size=7):
    """Returns an [M, 3] numpy world point cloud from a 7x7 subsample of every
    frame, with invalid/beyond-max depths removed (reference
    clipfusion.py:517-551 uses max_depth=4 for bounds)."""
    depth_imgs = jnp.asarray(depth_imgs)
    F, H, W = depth_imgs.shape
    xyz, valid, depth = _backproject_batch(
        depth_imgs, jnp.asarray(poses), jnp.asarray(Ks), imwidth=W, imheight=H,
        uv_size=uv_size,
    )
    xyz = np.asarray(xyz)
    keep = np.asarray(valid) & (np.asarray(depth) < max_depth)
    return xyz[keep]


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
