"""Golden tests for core geometry + sampling against torch's grid_sample
(the semantics the reference system is defined in terms of)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from spatially_aware_ai_tpu.core import (
    get_pix_vecs,
    project_points,
    world_to_cam,
    cam_to_world,
    hypersim_M_to_K,
    sample_image_at_uv,
    trilinear_sample,
    percentile_bounds,
    compute_grid_dims,
)
from spatially_aware_ai_tpu.core.geometry import in_frustum_mask

RNG = np.random.default_rng(0)


def random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q
    pose[:3, 3] = rng.normal(size=3)
    return pose


def make_K(fx=500.0, fy=480.0, cx=320.0, cy=240.0):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)


def test_pix_vecs_matches_manual():
    K = make_K()
    vecs = np.asarray(get_pix_vecs(8, 6, jnp.asarray(K)))
    Kinv = np.linalg.inv(K)
    for v in range(6):
        for u in range(8):
            expect = Kinv @ np.array([u, v, 1.0])
            np.testing.assert_allclose(vecs[v, u], expect, atol=1e-5)


def test_world_cam_roundtrip():
    pose = random_pose(RNG)
    pts = RNG.normal(size=(50, 3)).astype(np.float32)
    cam = world_to_cam(jnp.asarray(pts), jnp.asarray(pose))
    back = cam_to_world(cam, jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


def test_project_points():
    K = make_K()
    pts = np.abs(RNG.normal(size=(20, 3))).astype(np.float32) + 0.5
    uv, z = project_points(jnp.asarray(pts), jnp.asarray(K))
    uvz = (K @ pts.T).T
    np.testing.assert_allclose(np.asarray(z), uvz[:, 2], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(uv), uvz[:, :2] / uvz[:, 2:3], rtol=1e-4)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_sample_image_matches_torch_grid_sample(mode):
    H, W, C = 13, 17, 4
    img = RNG.normal(size=(H, W, C)).astype(np.float32)
    # include out-of-bounds and boundary coords
    uv = np.stack(
        [
            RNG.uniform(-2, W + 2, size=400),
            RNG.uniform(-2, H + 2, size=400),
        ],
        axis=-1,
    ).astype(np.float32)

    ours = np.asarray(sample_image_at_uv(jnp.asarray(img), jnp.asarray(uv), mode=mode))

    # reference semantics: grid = ((uv + 0.5) / [W, H]) * 2 - 1
    grid = ((uv + 0.5) / np.array([W, H]) * 2 - 1).astype(np.float32)
    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]  # [1, C, H, W]
    t_grid = torch.from_numpy(grid)[None, None]  # [1, 1, P, 2]
    theirs = (
        F.grid_sample(t_img, t_grid, mode=mode, align_corners=False)[0, :, 0]
        .permute(1, 0)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_trilinear_sample_matches_torch(mode):
    D0, D1, D2, C = 7, 9, 11, 3
    vol = RNG.normal(size=(D0, D1, D2, C)).astype(np.float32)
    # vertex-like coords inside the volume plus some OOB
    coords = np.stack(
        [
            RNG.uniform(-1, D0, size=300),
            RNG.uniform(-1, D1, size=300),
            RNG.uniform(-1, D2, size=300),
        ],
        axis=-1,
    ).astype(np.float32)

    ours = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(coords), mode=mode))

    # reference: grid = (verts + 0.5) / nvox * 2 - 1, channels-first volume,
    # grid axes permuted to torch (x=last-dim) order
    nvox = np.array([D0, D1, D2])
    grid = ((coords + 0.5) / nvox * 2 - 1).astype(np.float32)
    grid = grid[..., [2, 1, 0]]
    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # [1, C, D0, D1, D2]
    t_grid = torch.from_numpy(grid)[None, None, None]  # [1, 1, 1, P, 3]
    theirs = (
        F.grid_sample(t_vol, t_grid, mode=mode, align_corners=False)[0, :, 0, 0]
        .permute(1, 0)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_in_frustum_mask_matches_grid_convention():
    W, H = 10, 8
    uv = np.array(
        [[-0.5, 0], [-0.51, 0], [9.5, 0], [9.51, 0], [3, -0.5], [3, 7.5], [3, 7.51]],
        dtype=np.float32,
    )
    z = np.ones(len(uv), np.float32)
    m = np.asarray(in_frustum_mask(jnp.asarray(uv), jnp.asarray(z), W, H))
    grid = (uv + 0.5) / np.array([W, H]) * 2 - 1
    expect = (np.abs(grid) <= 1).all(axis=-1)
    np.testing.assert_array_equal(m, expect)
    # z <= 0 always invalid
    m2 = np.asarray(in_frustum_mask(jnp.asarray(uv), jnp.asarray(-z), W, H))
    assert not m2.any()


def test_hypersim_M_to_K_identityish():
    # A symmetric pinhole-like M should produce a K whose inverse-projection
    # round-trips: K @ (M @ uv) == pixel coords of uv.
    M = np.array([[1.2, 0, 0], [0, 0.9, 0], [0, 0, -1.0]], dtype=np.float64)
    W, H = 64, 48
    K = hypersim_M_to_K(M, W, H)
    assert K.shape == (3, 3)
    assert np.isfinite(K).all()
    # center pixel: uv = (0, 0) in ndc maps to cam ray M @ [0,0,1] = [0,0,-1]
    ray = M @ np.array([0.0, 0.0, 1.0])
    uvz = K @ ray.astype(np.float32)
    uv = uvz[:2] / uvz[2]
    np.testing.assert_allclose(uv, [(W - 1) / 2, (H - 1) / 2], atol=1e-3)


def test_percentile_bounds_and_grid_dims():
    xyz = RNG.normal(size=(5000, 3)).astype(np.float32)
    mn, mx = percentile_bounds(xyz, trunc_m=0.12)
    np.testing.assert_allclose(mn, np.percentile(xyz, 1, axis=0) - 0.12, atol=1e-5)
    np.testing.assert_allclose(mx, np.percentile(xyz, 99, axis=0) + 0.12, atol=1e-5)
    nvox = compute_grid_dims(mn, mx, 0.04)
    assert nvox.dtype == np.int32
    np.testing.assert_array_equal(nvox, np.round((mx - mn) / 0.04).astype(np.int32))


def test_percentile_bounds_empty_cloud_raises():
    with pytest.raises(ValueError, match="no valid depth"):
        percentile_bounds(np.zeros((0, 3), np.float32), 0.1)


def test_packed_bilinear_matches_plain():
    from spatially_aware_ai_tpu.core.sampling import (
        pack_bilinear_corners,
        sample_bilinear_packed,
    )

    H, W, C = 13, 17, 3
    img = RNG.normal(size=(H, W, C)).astype(np.float32)
    uv = np.stack(
        [RNG.uniform(-2, W + 2, size=500), RNG.uniform(-2, H + 2, size=500)],
        axis=-1,
    ).astype(np.float32)
    plain = np.asarray(
        sample_image_at_uv(jnp.asarray(img), jnp.asarray(uv), mode="bilinear")
    )
    packed = np.asarray(
        sample_bilinear_packed(
            pack_bilinear_corners(jnp.asarray(img)), jnp.asarray(uv), C
        )
    )
    np.testing.assert_allclose(packed, plain, atol=1e-6)
