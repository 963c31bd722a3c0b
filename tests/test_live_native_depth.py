"""Native low-res depth pushes on the live streaming path: the client
ships the sensor's own uint16 frames (iPhone 256x192) and the cubic
enlarge runs on device (core/upsample.py) — same contract as the batch
pipeline's device_depth_upsample, ~16x fewer depth bytes per push."""
import json
import os

import cv2
import numpy as np
import pytest

from spatially_aware_ai_tpu.data.live import LiveScanDataset
from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
    SyntheticSceneDataset,
)
from spatially_aware_ai_tpu.manager import InSituManager
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine


def make_manager(root, frame_chunk=3):
    d = root / "scans" / "demo" / "v00"
    os.makedirs(d, exist_ok=True)
    with open(d / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 6, "width": 64, "height": 48}, f)
    return InSituManager(
        scan_dir=str(root / "scans"),
        scan_name="demo",
        dataset="synthetic",
        output_dir=str(root / "out"),
        voxel_size=0.08,
        trunc_vox=2,
        clip_patch_size=32,
        clip_patch_stride=16,
        clip_engine=ClipEngine.tiny(),
        seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        frame_chunk=frame_chunk,
    )


def _native_frames(n=6):
    """Full-res rgb (64x48) + the 'sensor native' quarter-res u16 depth
    (16x12), rendered from the same camera track."""
    full = SyntheticSceneDataset(num_frames=n, width=64, height=48)
    quarter = SyntheticSceneDataset(num_frames=n, width=16, height=12)
    rgb = full.stacked(range(n))["rgb"]
    q = quarter.stacked(range(n))
    d_native = np.clip(
        np.rint(q["depth"] * 1000.0), 0, 65535
    ).astype(np.uint16)
    # K must correspond to the RGB resolution (push contract)
    return rgb, d_native, q["pose"], full.stacked(range(n))["K"]


def _grid_values(manager):
    sess = manager._live
    res, _ = sess.end()
    return res


def test_native_push_matches_host_upsampled_push(tmp_path):
    rgb, d_native, pose, K = _native_frames(6)
    d_full = np.stack([
        cv2.resize(d, (64, 48), None, 0, 0, cv2.INTER_CUBIC)
        for d in d_native
    ])

    m1 = make_manager(tmp_path / "a")
    m1.live_begin()
    st = m1.live_push(rgb, d_native, pose, K)
    assert st["frames_integrated"] == 6
    r_native = _grid_values(m1)

    m2 = make_manager(tmp_path / "b")
    m2.live_begin()
    m2.live_push(rgb, d_full, pose, K)
    r_full = _grid_values(m2)

    assert r_native.nvox == r_full.nvox
    w_n = np.asarray(r_native.values["weight"]).ravel()
    w_f = np.asarray(r_full.values["weight"]).ravel()
    # differ only by cv2's <=0.5 mm output rounding -> isolated
    # near-surface-threshold flips at most
    assert (w_n != w_f).mean() < 0.02
    # tsdf averages over its own free-space vote count; compare where the
    # two paths saw identical vote sets
    tw_n = np.asarray(r_native.values["tsdf_weight"]).ravel()
    tw_f = np.asarray(r_full.values["tsdf_weight"]).ravel()
    assert (tw_n != tw_f).mean() < 0.02
    both = (tw_n > 0) & (tw_n == tw_f)
    t_n = np.asarray(r_native.values["tsdf"]).ravel()[both]
    t_f = np.asarray(r_full.values["tsdf"]).ravel()[both]
    # per-vote tsdf delta is bounded by 0.5 mm / trunc ~= 3e-3; equal
    # counts can still hide a swapped vote pair at validity boundaries,
    # so bound the bulk tightly and the tail by frequency
    d = np.abs(t_n - t_f)
    assert np.quantile(d, 0.995) < 5e-3
    assert (d > 5e-3).mean() < 0.01


def test_scale_change_mid_stream_raises(tmp_path):
    rgb, d_native, pose, K = _native_frames(2)
    m = make_manager(tmp_path)
    m.live_begin()
    m.live_push(rgb[:1], d_native[:1], pose[:1], K[:1])
    with pytest.raises(ValueError, match="resolution changed"):
        m.live_push(
            rgb[1:2],
            np.zeros((1, 48, 64), np.uint16),
            pose[1:2], K[1:2],
        )
    # non-integer ratio rejected outright
    with pytest.raises(ValueError, match="integer divisor"):
        m.live_push(
            rgb[1:2], np.zeros((1, 13, 17), np.uint16), pose[1:2], K[1:2]
        )
    m.live_abort()


def test_native_archive_roundtrip(tmp_path):
    """live_end persists the native frames untouched; LiveScanDataset
    reads them back with the device-upsample capability, and its host
    accessors reproduce the full-res view."""
    rgb, d_native, pose, K = _native_frames(6)
    m = make_manager(tmp_path)
    m.live_begin()
    m.live_push(rgb, d_native, pose, K)
    out = m.live_end()
    import glob

    hits = glob.glob(
        str(tmp_path / "**" / "live_frames.npz"), recursive=True
    )
    assert len(hits) == 1
    scan_dir = os.path.dirname(hits[0])

    ds = LiveScanDataset(scan_dir)
    assert ds.native_depth_scale == 4
    assert len(ds) == 6

    f = ds[0]
    assert f.rgb.shape == (48, 64, 3)
    assert f.depth.shape == (48, 64)
    ref = cv2.resize(
        d_native[0], (64, 48), None, 0, 0, cv2.INTER_CUBIC
    ).astype(np.float32) / 1000.0
    np.testing.assert_allclose(f.depth, ref, atol=1e-6)

    nat = ds.stacked_u8(native_depth=True)
    np.testing.assert_array_equal(nat["depth"], d_native)
    assert nat["depth_upsample"] == 4
    full = ds.stacked_u8()
    assert full["depth"].shape == (6, 48, 64)

    # sparse bounds pass == dense samples of the device upsample
    d_sp, uu, vv, _, _ = ds.bounds_samples()
    from spatially_aware_ai_tpu.core.upsample import (
        upsample_depth_u16_device,
    )

    dense = np.asarray(upsample_depth_u16_device(d_native, 4))
    np.testing.assert_allclose(d_sp, dense[:, vv, uu], atol=2e-5)
    assert out["version"] >= 1
