"""Camera geometry: intrinsics, pose conventions, projection, pixel rays.

Pure-JAX, jit-able, batched. Behavioral contracts match the reference system
(see /root/reference/clipfusion.py:497-507 `get_pix_vecs`,
:648-659 voxel projection, :108-109 and :308-312 pose-convention flips,
:467-494 Hypersim M_to_K) but are re-derived here for TPU (static shapes,
no per-frame Python).

Conventions:
- Poses are 4x4 camera-to-world matrices, camera frame is right-down-forward
  (OpenCV). Datasets that store right-up-back (ARKit / nerfstudio) are flipped
  at ingest with `flip_ruB_to_rdf`.
- Intrinsics K are 3x3, pixel coordinates have the origin at the center of the
  top-left pixel (u in [0, W-1]).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flip_ruB_to_rdf(pose):
    """Flip a camera-to-world pose from right-up-back to right-down-forward.

    Equivalent to negating columns 1 and 2 of the rotation block, as done for
    ARKit / nerfstudio poses (reference clipfusion.py:108-109, :308-312).
    Works for numpy or jax arrays, shape [..., 4, 4].
    """
    flip = np.ones_like(np.asarray(pose)) if isinstance(pose, np.ndarray) else None
    if flip is not None:
        out = pose.copy()
        out[..., :3, 1] *= -1
        out[..., :3, 2] *= -1
        return out
    scale = jnp.array([1.0, -1.0, -1.0, 1.0])
    return pose * scale[None, :]


def scale_intrinsics(K, sx, sy):
    """Scale a 3x3 intrinsics matrix for an image resize by (sx, sy).

    Matches the reference convention `K[0] *= w_new/w_old; K[1] *= h_new/h_old`
    (clipfusion.py:148-149, :371-372). Note this scales cx/cy without the
    half-pixel correction, exactly as the reference does.
    """
    K = np.asarray(K, dtype=np.float32).copy()
    K[..., 0, :] *= sx
    K[..., 1, :] *= sy
    return K


def get_pix_vecs(imwidth: int, imheight: int, K):
    """Per-pixel ray directions: K^-1 @ [u, v, 1] for every pixel.

    Args:
      K: [..., 3, 3] intrinsics.
    Returns:
      [..., H, W, 3] ray directions in the camera frame (unit z for pinhole K).
    Reference: clipfusion.py:497-507.
    """
    u = jnp.arange(imwidth, dtype=jnp.float32)
    v = jnp.arange(imheight, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")  # [H, W]
    uv1 = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)  # [H, W, 3]
    Kinv = jnp.linalg.inv(K)
    return jnp.einsum("...ij,hwj->...hwi", Kinv, uv1)


def world_to_cam(xyz_world, pose):
    """Transform world points into the camera frame of a camera-to-world pose.

    xyz_cam = R^T @ (xyz_world - t). Reference: clipfusion.py:648-650.

    Args:
      xyz_world: [N, 3]
      pose: [..., 4, 4] camera-to-world
    Returns: [..., N, 3]
    """
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    delta = xyz_world - t[..., None, :]  # [..., N, 3]
    return jnp.einsum("...ji,...nj->...ni", R, delta)


def cam_to_world(xyz_cam, pose):
    """Inverse of `world_to_cam`: xyz_world = R @ xyz_cam + t."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, xyz_cam) + t[..., None, :]


def project_points(xyz_cam, K):
    """Project camera-frame points to pixel coordinates.

    uvz = K @ xyz_cam ; uv = uvz[:2] / z. Reference: clipfusion.py:652-654.

    Args:
      xyz_cam: [..., N, 3]
      K: [..., 3, 3]
    Returns:
      (uv [..., N, 2], z [..., N])
    """
    uvz = jnp.einsum("...ij,...nj->...ni", K, xyz_cam)
    z = uvz[..., 2]
    uv = uvz[..., :2] / z[..., None]
    return uv, z


def in_frustum_mask(uv, z, imwidth: int, imheight: int):
    """Validity mask matching the reference's normalized-grid bound check.

    The reference builds g = ((uv + 0.5) / [W, H]) * 2 - 1 and requires
    |g| <= 1 and z > 0 (clipfusion.py:656-673), which is equivalent to
    u in [-0.5, W - 0.5], v in [-0.5, H - 0.5], z > 0.
    """
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= -0.5)
        & (u <= imwidth - 0.5)
        & (v >= -0.5)
        & (v <= imheight - 0.5)
        & (z > 0)
    )


def hypersim_M_to_K(M, imwidth: int, imheight: int):
    """Convert a Hypersim cam-from-uv calibration matrix M to intrinsics K.

    Port of the reference's calibration-matrix conversion
    (clipfusion.py:467-494): builds the uv->pixel affine map, flips the v axis,
    and inverts. Numpy, host-side (tiny 3x3 math).
    """
    M = np.asarray(M, dtype=np.float64)
    u_min, u_max, v_min, v_max = -1.0, 1.0, -1.0, 1.0
    half_du = 0.5 * (u_max - u_min) / imwidth
    half_dv = 0.5 * (v_max - v_min) / imheight

    fx = M[0, 0] * (2 * (u_max - half_du)) / (imwidth - 1)
    fy = M[1, 1] * (2 * (v_max - half_dv)) / (imheight - 1)
    cx = M[0, 0] * (u_min + half_du)
    cy = M[1, 1] * (v_min + half_dv)
    w0 = M[2, 0] * (2 * (u_max - half_du)) / (imwidth - 1)
    w1 = M[2, 1] * (2 * (v_max - half_dv)) / (imheight - 1)
    w2 = M[2, 0] * (u_min + half_du)
    w3 = M[2, 1] * (v_min + half_dv)

    K = np.array(
        [
            [fx, 0.0, cx + M[0, 2]],
            [0.0, fy, cy + M[1, 2]],
            [w0, w1, M[2, 2] + w2 + w3],
        ],
        dtype=np.float64,
    )
    K[1] *= -1
    return np.linalg.inv(K).astype(np.float32)
