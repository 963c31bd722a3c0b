"""Brick-culled integrator (grid/brick.py) parity and conservativeness.

The brick integrator must reproduce the dense scan path bit-for-bit for ANY
input: culling is conservative (plane-AABB frustum test), selected-brick
processing runs the same math, and both capacity overflows (brick slots,
near-surface voxel slots) fall back in-jit without changing results.
"""
import numpy as np
import jax.numpy as jnp

from spatially_aware_ai_tpu.grid import FrameBatch, integrate_frames
from spatially_aware_ai_tpu.grid.brick import (
    active_brick_mask,
    integrate_frames_brick,
)
from spatially_aware_ai_tpu.grid.voxel_grid import create_grid

from test_fusion import make_scene
from test_parallel import build_batch, grid_args

RNG = np.random.default_rng(7)

INT_FIELDS = ["tsdf_w", "w", "label_hist"]
F32_FIELDS = [("tsdf_sum", 1e-5), ("rgb_sum", 1e-5), ("feat_sum", 1e-4)]


def assert_grid_parity(out, ref, n):
    for name in INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name))[:n],
            np.asarray(getattr(ref, name)), err_msg=name,
        )
    for name, atol in F32_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name))[:n],
            np.asarray(getattr(ref, name)), atol=atol, err_msg=name,
        )
    # padding (incl. the scatter sink) stays clean
    assert np.asarray(out.w)[n:].sum() == 0
    assert np.abs(np.asarray(out.feat_sum)[n:]).sum() == 0


def brick_grid(scene, **over):
    return create_grid(**dict(grid_args(scene), pad_to=8, min_padding=1),
                       **over)


def test_brick_branch_matches_dense():
    scene = make_scene(num_frames=5)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    n = ref.tsdf_sum.shape[0]

    out, nb, cnt = integrate_frames_brick(
        brick_grid(scene), batch, brick_size=16, with_count=True,
    )
    # default capacities cover the whole tiny grid -> brick branch taken
    nb_total = -(-out.tsdf_sum.shape[0] // 16)
    assert 0 < int(nb) <= nb_total
    assert_grid_parity(out, ref, n)


def test_brick_overflow_falls_back_sparse():
    scene = make_scene(num_frames=4)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    n = ref.tsdf_sum.shape[0]

    # brick_capacity=1 certainly overflows -> sparse-integrator fallback
    out = integrate_frames_brick(
        brick_grid(scene), batch, brick_size=16, brick_capacity=1,
    )
    assert_grid_parity(out, ref, n)


def test_voxel_overflow_within_bricks_falls_back_dense():
    scene = make_scene(num_frames=4)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    n = ref.tsdf_sum.shape[0]

    # bricks fit but the voxel union overflows capacity=8 -> dense-within-
    # bricks branch
    out = integrate_frames_brick(
        brick_grid(scene), batch, brick_size=16, capacity=8,
    )
    assert_grid_parity(out, ref, n)


def test_with_count_reports_true_counts():
    scene = make_scene(num_frames=4)
    batch = build_batch(scene, with_labels=True)

    out, nb, cnt = integrate_frames_brick(
        brick_grid(scene), batch, brick_size=16, with_count=True,
    )
    expect_vox = int((np.asarray(out.w) > 0).sum())
    assert int(cnt) == expect_vox
    mask = np.asarray(active_brick_mask(brick_grid(scene), batch, 16))
    assert int(nb) == int(mask.sum())


def test_cull_is_conservative_and_actually_culls():
    """Every voxel the dense path touches lies in an active brick, and a
    camera that sees only part of the scene culls a nontrivial fraction."""
    scene = make_scene(num_frames=1)
    # move the camera close so the frustum covers only a corner of the grid
    depth, rgb, pose, K, feat_img, labels = scene["frames"][0]
    pose = pose.copy()
    pose[:3, 3] = np.array([-0.2, -0.15, 0.45], np.float32)  # at grid corner
    scene["frames"][0] = (depth, rgb, pose, K, feat_img, labels)
    batch = build_batch(scene, with_labels=True)

    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    touched = (np.asarray(ref.tsdf_w) > 0) | (np.asarray(ref.w) > 0)

    B = 8
    g = brick_grid(scene)
    mask = np.asarray(active_brick_mask(g, batch, B))
    n = ref.tsdf_sum.shape[0]
    per_voxel_active = np.repeat(mask, B)[:n]
    assert (per_voxel_active | ~touched).all(), (
        "cull dropped a voxel the dense path updates"
    )
    assert mask.sum() < mask.size, "nothing culled for a partial view"

    # and the integrate itself still matches
    out = integrate_frames_brick(g, batch, brick_size=B)
    assert_grid_parity(out, ref, n)


def test_projective_K_parity():
    """Hypersim-style K with a non-[0,0,1] bottom row: the plane derivation
    uses the K rows directly, so generalized projective cameras stay exact
    (core/geometry.py:hypersim_M_to_K produces such K)."""
    scene = make_scene(num_frames=3)
    fixed = []
    for depth, rgb, pose, K, feat_img, labels in scene["frames"]:
        K = K.copy()
        K[2] = np.array([0.01, -0.02, 1.0], np.float32)
        fixed.append((depth, rgb, pose, K, feat_img, labels))
    scene["frames"] = fixed
    batch = build_batch(scene, with_labels=True)

    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    out = integrate_frames_brick(brick_grid(scene), batch, brick_size=16)
    assert_grid_parity(out, ref, ref.tsdf_sum.shape[0])


def test_invalid_frames_are_noops_and_culled():
    scene = make_scene(num_frames=3)
    batch = build_batch(scene, with_labels=True)
    pad = lambda x: jnp.concatenate([x, x[-1:]], axis=0)
    padded = FrameBatch(
        depth=pad(batch.depth), rgb=pad(batch.rgb), pose=pad(batch.pose),
        K=pad(batch.K), feat_img=pad(batch.feat_img),
        labels=pad(batch.labels),
        frame_valid=jnp.array([True, True, True, False]),
    )
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    out = integrate_frames_brick(brick_grid(scene), padded, brick_size=16)
    assert_grid_parity(out, ref, ref.tsdf_sum.shape[0])

    # an all-invalid chunk activates no bricks at all
    none = FrameBatch(
        depth=batch.depth, rgb=batch.rgb, pose=batch.pose, K=batch.K,
        feat_img=batch.feat_img, labels=batch.labels,
        frame_valid=jnp.zeros(3, bool),
    )
    mask = np.asarray(active_brick_mask(brick_grid(scene), none, 16))
    assert mask.sum() == 0


def test_near_surface_votes_parity():
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames_sparse

    scene = make_scene(num_frames=4)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames_sparse(
        brick_grid(scene), batch, label_vote_mode="near_surface",
    )
    out = integrate_frames_brick(
        brick_grid(scene), batch, brick_size=16,
        label_vote_mode="near_surface",
    )
    np.testing.assert_array_equal(
        np.asarray(out.label_hist), np.asarray(ref.label_hist)
    )


def test_nearest_rgb_parity():
    scene = make_scene(num_frames=3)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(
        create_grid(**grid_args(scene)), batch, rgb_mode="nearest"
    )
    out = integrate_frames_brick(
        brick_grid(scene), batch, brick_size=16, rgb_mode="nearest"
    )
    assert_grid_parity(out, ref, ref.tsdf_sum.shape[0])


def test_brick_random_adversarial_scenes_exact():
    """Seeded sweep of hostile geometry: cameras inside/behind/far from the
    grid, arbitrary look directions, projective K rows, zero/huge/inf
    depth pixels. The brick path must match the dense scan oracle on the
    integer channels BIT-FOR-BIT every time (the conservative cull +
    epsilon margin can only keep extra bricks, never drop a live one)."""
    rng = np.random.default_rng(123)
    nvox = (9, 8, 7)
    origin = np.array([-0.2, -0.15, 0.5], np.float32)

    for trial in range(6):
        frames = []
        for _ in range(3):
            # random orientation via QR; random position around the grid
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = (q * np.sign(np.linalg.det(q))).astype(np.float32)
            pose[:3, 3] = origin + rng.normal(scale=0.6, size=3).astype(
                np.float32
            )
            K = np.array(
                [[rng.uniform(10, 60), 0, 16], [0, rng.uniform(10, 60), 12],
                 [0, 0, 1]], np.float32,
            )
            if trial % 2:
                K[2, :2] = rng.normal(scale=0.02, size=2)
            depth = rng.uniform(0.05, 1.5, size=(24, 32)).astype(np.float32)
            if trial % 3 == 0:
                depth[rng.random(depth.shape) < 0.1] = 0.0
            if trial % 3 == 1:
                depth[rng.random(depth.shape) < 0.05] = np.inf
            rgb = rng.uniform(0, 1, size=(24, 32, 3)).astype(np.float32)
            feat_img = rng.normal(size=(3, 4, 16)).astype(np.float32)
            labels = rng.integers(0, 7, size=(24, 32)).astype(np.int32)
            frames.append((depth, rgb, pose, K, feat_img, labels))
        scene = dict(
            nvox=nvox, origin=origin, voxel_size=0.05, trunc=0.1,
            frames=frames, feat_dim=16, n_classes=7, H=24, W=32,
        )
        batch = build_batch(scene, with_labels=True)
        ref = integrate_frames(create_grid(**grid_args(scene)), batch)
        for B in (8, 64):
            out = integrate_frames_brick(
                brick_grid(scene), batch, brick_size=B
            )
            for name in INT_FIELDS:
                np.testing.assert_array_equal(
                    np.asarray(getattr(out, name))[: ref.tsdf_sum.shape[0]],
                    np.asarray(getattr(ref, name)),
                    err_msg=f"trial={trial} B={B} {name}",
                )


def test_sharded_compact_integrators_match_dense():
    """sparse/brick inside the shard_map step: each device compacts its own
    voxel slice (voxel_start), incl. the per-shard overflow fallbacks —
    results match single-device dense integration on the 8-device mesh."""
    import jax

    from spatially_aware_ai_tpu.parallel import make_mesh, shard_grid
    from spatially_aware_ai_tpu.parallel.sharded import (
        make_sharded_integrate,
    )

    assert len(jax.devices()) > 1
    mesh = make_mesh()
    n_dev = mesh.devices.size

    scene = make_scene(num_frames=5)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    n = ref.tsdf_sum.shape[0]

    cases = [
        dict(integrator="sparse"),
        dict(integrator="sparse", capacity=8),        # per-shard overflow
        dict(integrator="brick", brick_size=16),
        dict(integrator="brick", brick_size=16, brick_capacity=1),
        dict(integrator="brick", brick_size=16, capacity=8),
    ]
    for kw in cases:
        g = shard_grid(
            mesh, create_grid(**dict(grid_args(scene), pad_to=n_dev))
        )
        step = make_sharded_integrate(mesh, g, batch, **kw)
        out = step(g, batch)
        for name in INT_FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(out, name))[:n],
                np.asarray(getattr(ref, name)), err_msg=f"{kw} {name}",
            )
        np.testing.assert_allclose(
            np.asarray(out.feat_sum)[:n], np.asarray(ref.feat_sum),
            atol=1e-4, err_msg=str(kw),
        )


def test_sharded_compact_adversarial_scenes_exact():
    """Adversarial geometry THROUGH the sharded compact step: random
    orientations/positions, projective K rows, zero/inf depth, shard
    boundaries splitting bricks, tiny per-shard budgets forcing the
    in-shard overflow fallbacks. Distilled from a 20-trial offline sweep
    (all exact); two representative trials keep suite time bounded."""
    import jax

    from spatially_aware_ai_tpu.parallel import make_mesh, shard_grid
    from spatially_aware_ai_tpu.parallel.sharded import (
        make_sharded_integrate,
    )

    assert len(jax.devices()) > 1
    mesh = make_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(2024)

    for trial in range(2):
        nvox = tuple(int(x) for x in rng.integers(5, 12, 3))
        origin = rng.normal(scale=0.3, size=3).astype(np.float32)
        frames = []
        for _ in range(3):
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = (q * np.sign(np.linalg.det(q))).astype(np.float32)
            pose[:3, 3] = origin + rng.normal(scale=0.7, size=3).astype(
                np.float32
            )
            K = np.array([[rng.uniform(8, 70), 0, 16],
                          [0, rng.uniform(8, 70), 12], [0, 0, 1]],
                         np.float32)
            if trial % 2:
                K[2, :2] = rng.normal(scale=0.03, size=2)
            depth = rng.uniform(0.03, 1.8, size=(24, 32)).astype(np.float32)
            m = rng.random(depth.shape)
            depth[m < 0.07] = 0.0
            depth[(m > 0.07) & (m < 0.12)] = np.inf
            rgb = rng.uniform(0, 1, size=(24, 32, 3)).astype(np.float32)
            feat_img = rng.normal(size=(3, 4, 16)).astype(np.float32)
            labels = rng.integers(0, 7, size=(24, 32)).astype(np.int32)
            frames.append((depth, rgb, pose, K, feat_img, labels))
        scene = dict(nvox=nvox, origin=origin,
                     voxel_size=float(rng.uniform(0.03, 0.08)), trunc=0.1,
                     frames=frames, feat_dim=16, n_classes=7, H=24, W=32)
        batch = build_batch(scene, with_labels=True)
        ref = integrate_frames(create_grid(**grid_args(scene)), batch)
        n = ref.tsdf_sum.shape[0]
        for kw in (
            dict(integrator="sparse", capacity=8),
            dict(integrator="brick", brick_size=16, brick_capacity=2,
                 capacity=8),
        ):
            g = shard_grid(
                mesh, create_grid(**dict(grid_args(scene), pad_to=n_dev))
            )
            step = make_sharded_integrate(mesh, g, batch, **kw)
            out = step(g, batch)
            for name in INT_FIELDS:
                np.testing.assert_array_equal(
                    np.asarray(getattr(out, name))[:n],
                    np.asarray(getattr(ref, name)),
                    err_msg=f"trial={trial} {kw} {name}",
                )
            np.testing.assert_allclose(
                np.asarray(out.feat_sum)[:n], np.asarray(ref.feat_sum),
                atol=1e-4, err_msg=f"trial={trial} {kw}",
            )


def test_dense_inner_fill_slot_duplicates_keep_votes():
    """Regression (r4): when nb_count < brick_capacity, nonzero's fill
    slots duplicate brick NB-1's voxel rows in `idx`. The dense-within-
    bricks branch updates the label histogram with a gather/saturate/SET,
    which is only duplicate-safe for unique indices — a fill slot's
    old+0 write can land after the real slot's old+contrib write (XLA
    scatter duplicate order is unspecified; serial backends take the
    last) and silently drop the chunk's votes for the LAST brick. The
    fixture forces: brick NB-1 active near the surface, at least one
    brick frustum-culled (so fill slots exist), and a voxel-capacity
    overflow (so dense_inner runs)."""
    scene = make_scene(num_frames=3)
    for depth, _rgb, pose, _K, _feat, _labels in scene["frames"]:
        # shift the cameras toward the grid's high-x/high-y corner so the
        # low-corner bricks leave the frustum while brick NB-1 stays
        # visible; constant depth puts the surface near the top-z face,
        # so the last brick accumulates real label votes
        pose[:3, 3] = np.array([0.3, 0.25, 0.0], np.float32)
        depth[:] = 0.9
    batch = build_batch(scene, with_labels=True)

    g = brick_grid(scene)
    # brick_size=16 on this 512-row buffer: NB=32, 30 active, and the LAST
    # brick holds real tail voxels and is active (probed fixture)
    mask = np.asarray(active_brick_mask(g, batch, 16)).reshape(-1)
    assert mask[-1] and not mask.all(), (
        f"fixture drifted: need last brick active + >=1 culled, got "
        f"{mask.sum()}/{mask.size} active, last={mask[-1]}"
    )

    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    n = ref.tsdf_sum.shape[0]
    out = integrate_frames_brick(g, batch, brick_size=16, capacity=8)
    assert_grid_parity(out, ref, n)
