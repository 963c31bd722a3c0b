"""Golden tests for grid fusion: our order-independent sum-form JAX path vs a
sequential torch oracle that implements the reference's exact running-average
update rule (clipfusion.py:627-721 / clip_seem_fusion.py:676-822)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from spatially_aware_ai_tpu.grid import (
    FrameBatch,
    finalize_grid,
    integrate_frames,
    voxel_world_coords,
)
from spatially_aware_ai_tpu.grid.voxel_grid import create_grid

RNG = np.random.default_rng(42)


class TorchOracle:
    """Sequential reference-semantics TSDF+feature fusion (torch, CPU)."""

    def __init__(self, origin, voxel_size, nvox, trunc, feat_dim, n_classes=None):
        self.origin = torch.tensor(origin, dtype=torch.float32)
        self.voxel_size = voxel_size
        self.nvox = nvox
        self.trunc = trunc
        n = int(np.prod(nvox))
        self.tsdf = torch.zeros(n)
        self.rgb = torch.zeros(n, 3)
        self.feat = torch.zeros(n, feat_dim)
        self.weight = torch.zeros(n, dtype=torch.int32)
        self.tsdf_weight = torch.zeros(n, dtype=torch.int32)
        self.n_classes = n_classes
        if n_classes:
            self.labels_one_hot = torch.zeros(n, n_classes, dtype=torch.int32)
        x, y, z = [torch.arange(v) for v in nvox]
        xx, yy, zz = torch.meshgrid(x, y, z, indexing="ij")
        idx = torch.stack([xx, yy, zz], dim=-1).view(-1, 3).float()
        self.xyz_world = idx * voxel_size + self.origin

    def integrate(self, depth, rgb, pose, K, feat_img, labels=None,
                  rgb_mode="bilinear"):
        H, W = depth.shape
        pose = torch.tensor(pose)
        K = torch.tensor(K)
        depth_t = torch.tensor(depth)
        rgb_t = torch.tensor(rgb)
        feat_t = torch.tensor(feat_img)

        xyz_cam = (pose[:3, :3].T @ (self.xyz_world - pose[:3, 3]).T).T
        uvz = (K @ xyz_cam.T).T
        z = uvz[:, 2]
        uv = uvz[:, :2] / z[:, None]

        grid = (uv + 0.5) / torch.tensor([W, H]).float() * 2 - 1

        d = F.grid_sample(
            depth_t[None, None], grid[None, None], mode="nearest",
            align_corners=False,
        )[0, 0, 0]
        sdf = (d - z) / self.trunc
        tsdf = sdf.clamp(-1, 1)

        _valid = (grid.abs() <= 1).all(dim=1) & (z > 0)
        valid = _valid & (sdf.abs() <= 1)
        tsdf_valid = _valid & (sdf > -1)

        tsdf = torch.where(tsdf_valid, tsdf, torch.zeros_like(tsdf))
        new_w = self.tsdf_weight + tsdf_valid.to(torch.int32)
        upd = tsdf_valid
        a = new_w[upd].float()
        b = (self.tsdf_weight.float() / new_w.float())[upd]
        self.tsdf[upd] = tsdf[upd] / a + self.tsdf[upd] * b
        self.tsdf_weight = new_w

        grid_valid = grid[valid]
        rgb_s = F.grid_sample(
            rgb_t.permute(2, 0, 1)[None], grid_valid[None, None], mode=rgb_mode,
            align_corners=False,
        )[0, :, 0].T
        feat_s = F.grid_sample(
            feat_t.permute(2, 0, 1)[None], grid_valid[None, None], mode="bilinear",
            align_corners=False,
        )[0, :, 0].T

        new_w = self.weight + valid.to(torch.int32)
        a = 1.0 / new_w[valid, None].float()
        b = self.weight[valid, None].float() * a
        self.rgb[valid] = rgb_s * a + self.rgb[valid] * b
        self.feat[valid] = feat_s * a + self.feat[valid] * b
        self.weight = new_w

        if labels is not None:
            lab_t = torch.tensor(labels, dtype=torch.float32)
            lab_s = F.grid_sample(
                lab_t[None, None], grid_valid[None, None], mode="nearest",
                align_corners=False,
            )[0, 0, 0]
            self.labels_one_hot[valid] += F.one_hot(
                lab_s.long(), num_classes=self.n_classes
            ).to(torch.int32)


def make_scene(num_frames=5, H=24, W=32, feat_dim=16, n_classes=7):
    """Random frames looking at a random box of voxels."""
    nvox = (9, 8, 7)
    origin = np.array([-0.2, -0.15, 0.5], np.float32)
    voxel_size = 0.05
    trunc = 0.1

    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    frames = []
    for _ in range(num_frames):
        # camera at origin looking +z toward the grid with small jitter
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = RNG.normal(scale=0.05, size=3).astype(np.float32)
        th = RNG.normal(scale=0.1)
        c, s = np.cos(th), np.sin(th)
        pose[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        depth = RNG.uniform(0.4, 1.2, size=(H, W)).astype(np.float32)
        rgb = RNG.uniform(0, 1, size=(H, W, 3)).astype(np.float32)
        feat_img = RNG.normal(size=(3, 4, feat_dim)).astype(np.float32)
        labels = RNG.integers(0, n_classes, size=(H, W)).astype(np.int32)
        frames.append((depth, rgb, pose, K, feat_img, labels))
    return dict(
        nvox=nvox, origin=origin, voxel_size=voxel_size, trunc=trunc,
        frames=frames, feat_dim=feat_dim, n_classes=n_classes, H=H, W=W,
    )


def run_ours(scene, with_labels, rgb_mode):
    grid = create_grid(
        scene["origin"], scene["voxel_size"], scene["nvox"], scene["trunc"],
        feature_dim=scene["feat_dim"], with_labels=with_labels,
        num_classes=scene["n_classes"],
    )
    fs = scene["frames"]
    batch = FrameBatch(
        depth=jnp.stack([f[0] for f in fs]),
        rgb=jnp.stack([f[1] for f in fs]),
        pose=jnp.stack([f[2] for f in fs]),
        K=jnp.stack([f[3] for f in fs]),
        feat_img=jnp.stack([f[4] for f in fs]),
        labels=jnp.stack([f[5] for f in fs]) if with_labels else None,
        frame_valid=jnp.ones(len(fs), bool),
    )
    grid = integrate_frames(grid, batch, rgb_mode=rgb_mode)
    return finalize_grid(grid)


def run_oracle(scene, with_labels, rgb_mode):
    o = TorchOracle(
        scene["origin"], scene["voxel_size"], scene["nvox"], scene["trunc"],
        scene["feat_dim"], scene["n_classes"] if with_labels else None,
    )
    for depth, rgb, pose, K, feat_img, labels in scene["frames"]:
        o.integrate(depth, rgb, pose, K, feat_img,
                    labels if with_labels else None, rgb_mode=rgb_mode)
    return o


def test_fusion_matches_reference_semantics():
    scene = make_scene()
    ours = run_ours(scene, with_labels=True, rgb_mode="bilinear")
    oracle = run_oracle(scene, with_labels=True, rgb_mode="bilinear")

    w = oracle.weight.numpy()
    tw = oracle.tsdf_weight.numpy()
    assert w.sum() > 100, "test scene has too few observed voxels"

    np.testing.assert_array_equal(np.asarray(ours["weight"]), w)
    np.testing.assert_array_equal(np.asarray(ours["tsdf_weight"]), tw)

    # means match the sequential running average where observed
    obs = tw > 0
    np.testing.assert_allclose(
        np.asarray(ours["tsdf"])[obs], oracle.tsdf.numpy()[obs], atol=1e-5
    )
    fobs = w > 0
    np.testing.assert_allclose(
        np.asarray(ours["rgb"])[fobs], oracle.rgb.numpy()[fobs], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["feat"])[fobs], oracle.feat.numpy()[fobs], atol=1e-5
    )

    # label histogram counts identical; argmax-with-check -1 convention
    hist = oracle.labels_one_hot.numpy()
    any_nz = hist.any(axis=1)
    expect_cls = np.where(any_nz, hist.argmax(axis=1), -1)
    np.testing.assert_array_equal(np.asarray(ours["class_id"]), expect_cls)


def test_fusion_nearest_rgb_mode():
    scene = make_scene(num_frames=3)
    ours = run_ours(scene, with_labels=False, rgb_mode="nearest")
    oracle = run_oracle(scene, with_labels=False, rgb_mode="nearest")
    fobs = oracle.weight.numpy() > 0
    np.testing.assert_allclose(
        np.asarray(ours["rgb"])[fobs], oracle.rgb.numpy()[fobs], atol=1e-5
    )


def test_fusion_frame_padding_is_noop():
    scene = make_scene(num_frames=4)
    grid_args = dict(
        origin=scene["origin"], voxel_size=scene["voxel_size"],
        nvox=scene["nvox"], trunc=scene["trunc"],
        feature_dim=scene["feat_dim"], with_labels=True,
        num_classes=scene["n_classes"],
    )
    fs = scene["frames"]

    def batch_with_valid(n_pad):
        pad = lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], n_pad, axis=0)])
        valid = jnp.array([True] * len(fs) + [False] * n_pad)
        return FrameBatch(
            depth=pad(jnp.stack([f[0] for f in fs])),
            rgb=pad(jnp.stack([f[1] for f in fs])),
            pose=pad(jnp.stack([f[2] for f in fs])),
            K=pad(jnp.stack([f[3] for f in fs])),
            feat_img=pad(jnp.stack([f[4] for f in fs])),
            labels=pad(jnp.stack([f[5] for f in fs])),
            frame_valid=valid,
        )

    g1 = integrate_frames(create_grid(**grid_args), batch_with_valid(0))
    g2 = integrate_frames(create_grid(**grid_args), batch_with_valid(3))
    f1, f2 = finalize_grid(g1), finalize_grid(g2)
    for k in f1:
        np.testing.assert_allclose(
            np.asarray(f1[k]), np.asarray(f2[k]), atol=1e-6, err_msg=k
        )


def test_no_recompile_across_scene_sizes():
    """Grid dims are traced data: scans with different nvox but the same
    bucketed buffer size must share one compiled executable (compiles cost
    minutes through some TPU toolchains)."""
    scene = make_scene(num_frames=2)
    batch = FrameBatch(
        depth=jnp.stack([f[0] for f in scene["frames"]]),
        rgb=jnp.stack([f[1] for f in scene["frames"]]),
        pose=jnp.stack([f[2] for f in scene["frames"]]),
        K=jnp.stack([f[3] for f in scene["frames"]]),
        feat_img=jnp.stack([f[4] for f in scene["frames"]]),
        labels=jnp.stack([f[5] for f in scene["frames"]]),
        frame_valid=jnp.ones(2, bool),
    )

    def grid_for(nvox):
        return create_grid(
            scene["origin"], scene["voxel_size"], nvox, scene["trunc"],
            feature_dim=scene["feat_dim"], with_labels=True,
            num_classes=scene["n_classes"], pad_to=1024,
        )

    before = integrate_frames._cache_size()
    integrate_frames(grid_for((9, 8, 7)), batch)
    mid = integrate_frames._cache_size()
    integrate_frames(grid_for((10, 9, 8)), batch)
    after = integrate_frames._cache_size()
    assert mid == after == before + 1


def test_fusion_fuzz_random_configs():
    """Property fuzz: random scene/config variations must all match the
    sequential torch oracle (guards the core contract broadly)."""
    fuzz_rng = np.random.default_rng(123)
    for trial in range(6):
        H = int(fuzz_rng.integers(12, 40))
        W = int(fuzz_rng.integers(16, 48))
        feat_dim = int(fuzz_rng.choice([4, 16, 32]))
        n_classes = int(fuzz_rng.integers(3, 12))
        rgb_mode = ["bilinear", "nearest"][trial % 2]
        with_labels = trial % 3 != 0

        global RNG
        old_rng = RNG
        RNG = np.random.default_rng(1000 + trial)
        try:
            scene = make_scene(
                num_frames=int(fuzz_rng.integers(2, 6)), H=H, W=W,
                feat_dim=feat_dim, n_classes=n_classes,
            )
            scene["voxel_size"] = float(fuzz_rng.uniform(0.03, 0.09))
            scene["trunc"] = float(fuzz_rng.uniform(0.05, 0.2))
            ours = run_ours(scene, with_labels=with_labels, rgb_mode=rgb_mode)
            oracle = run_oracle(scene, with_labels=with_labels,
                                rgb_mode=rgb_mode)
        finally:
            RNG = old_rng

        np.testing.assert_array_equal(
            np.asarray(ours["weight"]), oracle.weight.numpy(),
            err_msg=f"trial {trial}",
        )
        fobs = oracle.weight.numpy() > 0
        np.testing.assert_allclose(
            np.asarray(ours["feat"])[fobs], oracle.feat.numpy()[fobs],
            atol=1e-4, err_msg=f"trial {trial}",
        )
        np.testing.assert_allclose(
            np.asarray(ours["rgb"])[fobs], oracle.rgb.numpy()[fobs],
            atol=1e-4, err_msg=f"trial {trial}",
        )
        if with_labels:
            hist = oracle.labels_one_hot.numpy()
            expect = np.where(hist.any(1), hist.argmax(1), -1)
            np.testing.assert_array_equal(
                np.asarray(ours["class_id"]), expect,
                err_msg=f"trial {trial}",
            )


def test_camera_plane_voxels_do_not_poison_accumulators():
    """Voxels on the camera plane (z == 0 in camera frame) project to
    inf/NaN uv. The frustum mask rejects them, but before the frame_geometry
    uv sanitization the sampled NaN values poisoned unobserved accumulator
    rows via `NaN * 0-weight` (found by the 1-vs-8 parity replay in
    __graft_entry__.dryrun_multichip). Every integrator variant must produce
    fully finite accumulators and agree on a grid that straddles z == 0."""
    from spatially_aware_ai_tpu.grid.fusion import (
        integrate_frames_einsum,
        integrate_frames_sparse,
    )

    rng = np.random.default_rng(7)
    F_, H, W = 3, 20, 24
    nvox = (6, 5, 8)
    # origin at negative z so the grid contains the z == 0 camera plane
    grid_args = dict(
        origin=np.array([-0.1, -0.1, -0.1], np.float32),
        voxel_size=0.05, nvox=nvox, trunc=0.1,
        feature_dim=8, with_labels=True, num_classes=5,
    )
    batch = FrameBatch(
        depth=jnp.asarray(rng.uniform(0.05, 0.4, (F_, H, W)), jnp.float32),
        rgb=jnp.asarray(rng.uniform(0, 1, (F_, H, W, 3)), jnp.float32),
        pose=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (F_, 1, 1))),
        K=jnp.asarray(np.tile(
            np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]],
                     np.float32), (F_, 1, 1))),
        feat_img=jnp.asarray(rng.normal(size=(F_, 3, 4, 8)), jnp.float32),
        labels=jnp.asarray(rng.integers(0, 5, (F_, H, W)), jnp.int32),
        frame_valid=jnp.ones((F_,), bool),
    )

    base = integrate_frames(create_grid(**grid_args), batch)
    for name in ("tsdf_sum", "rgb_sum", "feat_sum"):
        arr = np.asarray(getattr(base, name))
        assert np.isfinite(arr).all(), f"{name} contains non-finite values"
    assert int(np.asarray(base.w).sum()) > 0, "scene should observe voxels"

    for fn in (integrate_frames_einsum, integrate_frames_sparse):
        other = fn(create_grid(**grid_args), batch)
        for name in ("tsdf_sum", "tsdf_w", "rgb_sum", "feat_sum", "w",
                     "label_hist"):
            np.testing.assert_allclose(
                np.asarray(getattr(other, name)),
                np.asarray(getattr(base, name)),
                atol=1e-5, err_msg=f"{fn.__name__}: {name}",
            )


def test_sparse_brick_rgb_exact_at_half_integer_pixels():
    """Review r5: the sparse/brick integrators used to reconstruct the rgb
    pixel coordinate from the stored PATCH coordinate ((uv+0.5)*s, later
    /s) — not bit-exact in f32 at non-power-of-two patch scales, so a
    'nearest' sample on a knife-edge half-integer pixel could round to a
    different pixel than the dense oracle. This scene puts EVERY voxel's
    u,v exactly on .5 with scale 1/6; the carried-pixel-uv fix makes
    sparse/brick rgb_sum bit-identical to the dense scan."""
    from spatially_aware_ai_tpu.grid.brick import integrate_frames_brick
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames_sparse

    rng = np.random.default_rng(7)
    W, H, Px, Py = 42, 30, 7, 5  # patch scale 1/6 (non power of two)
    nvox = (12, 8, 3)
    vs = 1.0 / 6.0
    origin = np.array([0.0, 0.0, 0.9], np.float32)
    # cx=cy=0.5 puts voxel columns at u = k + 0.5 from k=0: k=0 and k=6
    # are knife-edge pixels whose old patch->pixel round trip FLIPS the
    # rounded pixel at s=1/6 (measured: 164 of the first 2000 half-integer
    # pixels flip at this scale)
    K = np.array([[6.0, 0, 0.5], [0, 6.0, 0.5], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)  # camera at origin, +z forward

    depth = np.full((1, H, W), 1.0, np.float32)
    rgb = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    feat = rng.normal(size=(1, Py, Px, 4)).astype(np.float32)
    batch = FrameBatch(
        depth=jnp.asarray(depth), rgb=jnp.asarray(rgb),
        pose=jnp.asarray(pose[None]), K=jnp.asarray(K[None]),
        feat_img=jnp.asarray(feat), labels=None,
        frame_valid=jnp.ones((1,), bool),
    )

    def fresh(min_padding=0):
        return create_grid(origin, vs, nvox, 2 * vs, feature_dim=4,
                           min_padding=min_padding)

    dense = integrate_frames(fresh(), batch, rgb_mode="nearest")
    # sanity: the scene really exercises half-integer projections
    assert int(np.asarray(dense.w).sum()) > 50

    sparse = integrate_frames_sparse(fresh(1), batch, rgb_mode="nearest")
    n = dense.rgb_sum.shape[0]
    np.testing.assert_array_equal(
        np.asarray(sparse.rgb_sum)[:n], np.asarray(dense.rgb_sum)
    )
    np.testing.assert_array_equal(
        np.asarray(sparse.w)[:n], np.asarray(dense.w)
    )
    np.testing.assert_allclose(
        np.asarray(sparse.feat_sum)[:n], np.asarray(dense.feat_sum),
        atol=1e-5,
    )

    brick = integrate_frames_brick(fresh(1), batch, rgb_mode="nearest",
                                   brick_size=64)
    np.testing.assert_array_equal(
        np.asarray(brick.rgb_sum)[:n], np.asarray(dense.rgb_sum)
    )
    np.testing.assert_array_equal(
        np.asarray(brick.w)[:n], np.asarray(dense.w)
    )
