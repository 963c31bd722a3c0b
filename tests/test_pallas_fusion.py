"""The Pallas fused feature-splat must match the XLA scan path exactly
(interpret mode on CPU; the real kernel runs in bench on TPU)."""
import numpy as np
import jax.numpy as jnp

from spatially_aware_ai_tpu.grid import FrameBatch, finalize_grid, integrate_frames
from spatially_aware_ai_tpu.grid.fusion import integrate_frames_pallas
from spatially_aware_ai_tpu.grid.pallas_fusion import fused_feature_splat
from spatially_aware_ai_tpu.grid.voxel_grid import create_grid

from test_fusion import make_scene
from test_parallel import build_batch, grid_args

RNG = np.random.default_rng(33)


def test_fused_splat_matches_manual():
    """Direct kernel check against a dense numpy bilinear splat."""
    N, C, F, Py, Px = 256, 8, 3, 4, 5
    tile = 128
    P = Py * Px
    feat_sum = RNG.normal(size=(N, C)).astype(np.float32)
    feat_imgs = RNG.normal(size=(F, Py, Px, C)).astype(np.float32)
    # coords: mix of interior, boundary, and out-of-bounds
    uvw = np.stack(
        [
            RNG.uniform(-1.5, Px + 0.5, size=(N, F)),
            RNG.uniform(-1.5, Py + 0.5, size=(N, F)),
            RNG.integers(0, 2, size=(N, F)).astype(np.float64),
        ],
        axis=-1,
    ).astype(np.float32)

    out = np.asarray(
        fused_feature_splat(
            jnp.asarray(feat_sum.copy()), jnp.asarray(uvw),
            jnp.asarray(feat_imgs), tile=tile, interpret=True,
        )
    )

    expect = feat_sum.copy()
    for v in range(N):
        for f in range(F):
            px, py, val = uvw[v, f]
            if val == 0:
                continue
            x0, y0 = int(np.floor(px)), int(np.floor(py))
            fx, fy = px - x0, py - y0
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    cx, cy = x0 + dx, y0 + dy
                    if 0 <= cx < Px and 0 <= cy < Py:
                        expect[v] += val * wx * wy * feat_imgs[f, cy, cx]

    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_hybrid_integration_matches_scan_path():
    scene = make_scene(num_frames=6)
    batch = build_batch(scene, with_labels=True)

    ref = integrate_frames(create_grid(**grid_args(scene)), batch)

    # hybrid path needs N % tile == 0
    n = ref.tsdf_sum.shape[0]
    tile = 56  # 504 = 9*8*7 divisible by 56
    assert n % tile == 0
    out = integrate_frames_pallas(
        create_grid(**grid_args(scene)), batch, tile=tile, interpret=True
    )

    for name in ["tsdf_sum", "tsdf_w", "rgb_sum", "w", "label_hist"]:
        a = np.asarray(getattr(out, name))
        b = np.asarray(getattr(ref, name))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(out.feat_sum), np.asarray(ref.feat_sum), atol=1e-4
    )

    fv_ref = finalize_grid(ref)
    fv_out = finalize_grid(out)
    np.testing.assert_allclose(
        np.asarray(fv_out["feat"]), np.asarray(fv_ref["feat"]), atol=1e-4
    )


def test_einsum_integration_matches_scan_path():
    scene = make_scene(num_frames=5)
    batch = build_batch_local(scene)
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames_einsum

    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    out = integrate_frames_einsum(create_grid(**grid_args(scene)), batch)
    np.testing.assert_allclose(
        np.asarray(out.feat_sum), np.asarray(ref.feat_sum), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out.w), np.asarray(ref.w))
    np.testing.assert_allclose(
        np.asarray(out.rgb_sum), np.asarray(ref.rgb_sum), atol=1e-5
    )


def build_batch_local(scene):
    fs = scene["frames"]
    return FrameBatch(
        depth=jnp.stack([f[0] for f in fs]),
        rgb=jnp.stack([f[1] for f in fs]),
        pose=jnp.stack([f[2] for f in fs]),
        K=jnp.stack([f[3] for f in fs]),
        feat_img=jnp.stack([f[4] for f in fs]),
        labels=jnp.stack([f[5] for f in fs]),
        frame_valid=jnp.ones(len(fs), bool),
    )


def test_einsum_splat_blocked_matches_unblocked():
    from spatially_aware_ai_tpu.grid.fusion import einsum_feature_splat

    rng = np.random.default_rng(1)
    N, C, F, Py, Px = 1000, 8, 3, 4, 5
    feat_sum = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    uvw = jnp.asarray(
        np.stack(
            [
                rng.uniform(-1, Px, size=(N, F)),
                rng.uniform(-1, Py, size=(N, F)),
                rng.integers(0, 2, size=(N, F)).astype(np.float64),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    feat_imgs = jnp.asarray(rng.normal(size=(F, Py, Px, C)).astype(np.float32))
    full = einsum_feature_splat(feat_sum, uvw, feat_imgs, block_voxels=4096)
    blocked = einsum_feature_splat(feat_sum, uvw, feat_imgs, block_voxels=128)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(blocked), atol=1e-5
    )


def test_hybrid_frame_padding_is_noop():
    """Padded (frame_valid=False) frames contribute nothing in the hybrid
    integrators (their uvw validity collapses to zero)."""
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames_einsum

    scene = make_scene(num_frames=3)
    batch = build_batch_local(scene)
    pad = lambda x: jnp.concatenate([x, x[-1:]], axis=0)
    padded = FrameBatch(
        depth=pad(batch.depth), rgb=pad(batch.rgb), pose=pad(batch.pose),
        K=pad(batch.K), feat_img=pad(batch.feat_img),
        labels=pad(batch.labels),
        frame_valid=jnp.array([True, True, True, False]),
    )
    g1 = integrate_frames_einsum(create_grid(**grid_args(scene)), batch)
    g2 = integrate_frames_einsum(create_grid(**grid_args(scene)), padded)
    np.testing.assert_allclose(
        np.asarray(g1.feat_sum), np.asarray(g2.feat_sum), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(g1.w), np.asarray(g2.w))
    np.testing.assert_array_equal(
        np.asarray(g1.label_hist), np.asarray(g2.label_hist)
    )


def test_sparse_integration_matches_dense():
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames_sparse

    scene = make_scene(num_frames=5)
    batch = build_batch_local(scene)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    n = ref.tsdf_sum.shape[0]

    # generous capacity -> sparse branch taken
    g_args = dict(grid_args(scene), pad_to=8, min_padding=1)
    out = integrate_frames_sparse(
        create_grid(**g_args), batch, capacity=n
    )
    for name in ["tsdf_sum", "tsdf_w", "w", "label_hist"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name))[:n],
            np.asarray(getattr(ref, name)), err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(out.rgb_sum)[:n], np.asarray(ref.rgb_sum), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.feat_sum)[:n], np.asarray(ref.feat_sum), atol=1e-4
    )
    # padding (incl. the scatter sink) stays clean
    assert np.asarray(out.w)[n:].sum() == 0
    assert np.abs(np.asarray(out.feat_sum)[n:]).sum() == 0


def test_sparse_integration_overflow_falls_back_dense():
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames_sparse

    scene = make_scene(num_frames=4)
    batch = build_batch_local(scene)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)
    n = ref.tsdf_sum.shape[0]

    # capacity 8 certainly overflows -> dense fallback, still exact
    g_args = dict(grid_args(scene), pad_to=8, min_padding=1)
    out = integrate_frames_sparse(
        create_grid(**g_args), batch, capacity=8
    )
    np.testing.assert_array_equal(np.asarray(out.w)[:n], np.asarray(ref.w))
    np.testing.assert_allclose(
        np.asarray(out.feat_sum)[:n], np.asarray(ref.feat_sum), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.rgb_sum)[:n], np.asarray(ref.rgb_sum), atol=1e-5
    )


def test_sparse_with_count_reports_union_size():
    """with_count returns the chunk's active-voxel union — the feedback
    signal for the pipeline's adaptive capacity controller. The count is
    exact in both the sparse branch and the dense-fallback branch."""
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames_sparse

    scene = make_scene(num_frames=4)
    batch = build_batch_local(scene)
    n = int(np.prod(scene["nvox"]))
    g_args = dict(grid_args(scene), pad_to=8, min_padding=1)

    out, cnt = integrate_frames_sparse(
        create_grid(**g_args), batch, capacity=n, with_count=True
    )
    expect = int((np.asarray(out.w) > 0).sum())
    assert int(np.asarray(cnt)) == expect

    out2, cnt2 = integrate_frames_sparse(
        create_grid(**g_args), batch, capacity=8, with_count=True
    )  # overflows -> dense fallback; count still the true union
    assert int(np.asarray(cnt2)) == expect
