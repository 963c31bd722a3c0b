"""Dataset loader tests against generated on-disk scans in each format."""
import json
import os

import cv2
import numpy as np
import pytest

from spatially_aware_ai_tpu.data import (
    IPhone3DScannerDataset,
    LERFDataset,
    ScanNetDataset,
    SyntheticSceneDataset,
    make_dataset,
)

RNG = np.random.default_rng(21)


def write_iphone_scan(d, num_frames=3):
    """3D Scanner App format: frame_*.jpg (1920x1440), depth_*.png
    (256x192, mm), frame_*.json with ARKit (right-up-back) pose."""
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    poses = []
    for i in range(num_frames):
        rgb = (RNG.uniform(0, 255, (1440, 1920, 3))).astype(np.uint8)
        cv2.imwrite(str(d / f"frame_{i:05d}.jpg"), rgb)
        depth_m = RNG.uniform(0.3, 3.0, (192, 256)).astype(np.float32)
        cv2.imwrite(
            str(d / f"depth_{i:05d}.png"),
            (depth_m * 1000).astype(np.uint16),
        )
        pose_rdf = np.eye(4)
        pose_rdf[:3, 3] = [i * 0.1, 0, 0]
        pose_arkit = pose_rdf.copy()
        pose_arkit[:3, 1] *= -1
        pose_arkit[:3, 2] *= -1
        poses.append(pose_rdf)
        meta = {
            "intrinsics": [1400.0, 0, 960.0, 0, 1400.0, 720.0, 0, 0, 1.0],
            "cameraPoseARFrame": pose_arkit.reshape(-1).tolist(),
            "projectionMatrix": np.eye(4).reshape(-1).tolist(),
            "motionQuality": 1.0,
            "averageAngularVelocity": 0.01,
        }
        with open(d / f"frame_{i:05d}.json", "w") as f:
            json.dump(meta, f)
    return poses


def test_iphone_loader(tmp_path):
    poses = write_iphone_scan(tmp_path)
    ds = IPhone3DScannerDataset(str(tmp_path))
    assert len(ds) == 3
    assert (ds.imwidth, ds.imheight) == (1024, 768)
    f = ds[1]
    assert f.rgb.shape == (768, 1024, 3)
    assert f.depth.shape == (768, 1024)
    assert 0.29 < f.depth.mean() < 3.01
    # ARKit flip undone -> right-down-forward pose round-trips
    np.testing.assert_allclose(f.pose, poses[1], atol=1e-6)
    # K scaled from 1920x1440 to 1024x768
    np.testing.assert_allclose(f.K[0, 0], 1400 * 1024 / 1920, rtol=1e-6)
    np.testing.assert_allclose(f.K[1, 2], 720 * 768 / 1440, rtol=1e-6)


def test_iphone_bounds_samples_skip_rgb(tmp_path):
    """The depth-only bounds override must equal the full-frame default
    bit-for-bit (it reproduces the 4x-cubic upsample), without touching the
    RGB JPEGs."""
    from spatially_aware_ai_tpu.data.base import FrameDataset

    write_iphone_scan(tmp_path)
    ds = IPhone3DScannerDataset(str(tmp_path))
    d_fast, uu, vv, poses, Ks = ds.bounds_samples()
    d_ref, uu2, vv2, poses2, Ks2 = FrameDataset.bounds_samples(ds)
    np.testing.assert_array_equal(uu, uu2)
    np.testing.assert_array_equal(vv, vv2)
    np.testing.assert_array_equal(d_fast, d_ref)
    np.testing.assert_array_equal(poses, poses2)
    np.testing.assert_array_equal(Ks, Ks2)

    # and it must not read the JPEGs
    for f in os.listdir(tmp_path):
        if f.endswith(".jpg"):
            os.rename(tmp_path / f, tmp_path / (f + ".hidden"))
    d_again = ds.bounds_samples()[0]
    np.testing.assert_array_equal(d_again, d_fast)


def test_stacked_u8_native_roundtrip(tmp_path):
    """iphone/scannet stacked_u8 must equal the quantization the pipeline
    would apply to the f32 stacked() output (bit-exact for iphone rgb and
    scannet depth; within 1 LSB for scannet's fixed-point u8 resize)."""
    write_iphone_scan(tmp_path)
    ds = IPhone3DScannerDataset(str(tmp_path))
    f32 = ds.stacked([0, 1])
    u8 = ds.stacked_u8([0, 1])
    assert u8["rgb"].dtype == np.uint8
    want_rgb = np.clip(np.rint(f32["rgb"] * 255.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(u8["rgb"], want_rgb)
    np.testing.assert_array_equal(u8["depth"], f32["depth"])
    np.testing.assert_array_equal(u8["pose"], f32["pose"])
    np.testing.assert_array_equal(u8["K"], f32["K"])

    # generic fallback (synthetic renders f32): conversion matches pipeline
    sds = SyntheticSceneDataset(num_frames=2, width=32, height=24)
    sf32 = sds.stacked([0, 1])
    su8 = sds.stacked_u8([0, 1])
    np.testing.assert_array_equal(
        su8["rgb"],
        np.clip(np.rint(sf32["rgb"] * 255.0), 0, 255).astype(np.uint8),
    )


def test_scannet_stacked_u8(tmp_path):
    _write_scannet(tmp_path)
    ds = ScanNetDataset(str(tmp_path))
    f32 = ds.stacked(range(len(ds)))
    u8 = ds.stacked_u8(range(len(ds)))
    assert u8["depth"].dtype == np.uint16
    want_d16 = np.clip(
        np.rint(np.nan_to_num(f32["depth"]) * 1000.0), 0, 65535
    ).astype(np.uint16)
    np.testing.assert_array_equal(u8["depth"], want_d16)
    want_rgb = np.clip(np.rint(f32["rgb"] * 255.0), 0, 255).astype(np.int32)
    # u8 fixed-point resize vs f32 resize: within 1 LSB
    assert np.abs(u8["rgb"].astype(np.int32) - want_rgb).max() <= 1
    np.testing.assert_array_equal(u8["index"], f32["index"])


def test_bounds_samples_matches_stacked_path():
    """compute_scene_bounds via bounds_samples == the chunked stacked
    fallback (same cloud, same percentile bounds)."""
    from spatially_aware_ai_tpu.core.bounds import (
        backproject_sparse_cloud,
        backproject_sparse_samples,
    )

    ds = SyntheticSceneDataset(num_frames=5, width=64, height=48)
    depth, uu, vv, poses, Ks = ds.bounds_samples()
    cloud_new = backproject_sparse_samples(
        depth, uu, vv, poses, Ks, max_depth=4.0
    )
    stack = ds.stacked(range(len(ds)))
    cloud_old = backproject_sparse_cloud(
        stack["depth"], stack["pose"], stack["K"], max_depth=4.0
    )
    np.testing.assert_allclose(cloud_new, cloud_old, atol=1e-6)


def _write_scannet(tmp_path):
    os.makedirs(tmp_path / "color")
    os.makedirs(tmp_path / "depth")
    os.makedirs(tmp_path / "pose")
    os.makedirs(tmp_path / "intrinsic")
    K = np.array([[580.0, 0, 320, 0], [0, 580, 240, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_depth.txt", K)
    # 5 frames: 0 and 3 far apart, 1/2 close to 0 (filtered), 4 has inf pose
    positions = [0.0, 0.02, 0.05, 0.5, 1.0]
    for i, x in enumerate(positions):
        rgb = RNG.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "color" / f"{i}.jpg"), rgb)
        cv2.imwrite(
            str(tmp_path / "depth" / f"{i}.png"),
            (RNG.uniform(500, 3000, (480, 640))).astype(np.uint16),
        )
        pose = np.eye(4)
        pose[0, 3] = x
        if i == 4:
            pose[1, 3] = np.inf
        np.savetxt(tmp_path / "pose" / f"{i}.txt", pose)
    return K


def test_scannet_loader(tmp_path):
    K = _write_scannet(tmp_path)
    ds = ScanNetDataset(str(tmp_path))
    # frame 4 dropped (inf), keyframes = 0 and 3
    assert len(ds) == 2
    f = ds[1]
    assert f.pose[0, 3] == pytest.approx(0.5)
    assert f.rgb.shape == (480, 640, 3)
    np.testing.assert_allclose(f.K, K[:3, :3])


def test_lerf_loader(tmp_path):
    os.makedirs(tmp_path / "images")
    os.makedirs(tmp_path / "depth_simplerecon")
    frames = []
    for i in range(2):
        cv2.imwrite(
            str(tmp_path / "images" / f"frame_{i:03d}.jpg"),
            RNG.uniform(0, 255, (480, 640, 3)).astype(np.uint8),
        )
        cv2.imwrite(
            str(tmp_path / "depth_simplerecon" / f"frame_{i:03d}.png"),
            RNG.uniform(500, 2000, (192, 256)).astype(np.uint16),
        )
        pose = np.eye(4)
        pose[2, 3] = i
        frames.append(
            {
                "file_path": f"images/frame_{i:03d}.jpg",
                "transform_matrix": pose.tolist(),
            }
        )
    transforms = {
        "fl_x": 500.0, "fl_y": 500.0, "cx": 320.0, "cy": 240.0,
        "frames": frames,
    }
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump(transforms, f)
    ds = LERFDataset(str(tmp_path))
    assert len(ds) == 2
    f = ds[0]
    assert f.depth.shape == (192, 256)
    assert f.rgb.shape == (192, 256, 3)
    # OpenGL flip applied to rotation columns 1, 2
    np.testing.assert_allclose(f.pose[:3, 1], [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(f.pose[:3, 2], [0, 0, -1], atol=1e-6)
    # intrinsics scaled to the depth resolution
    np.testing.assert_allclose(f.K[0, 0], 500 * 256 / 640, rtol=1e-6)


def test_make_dataset_dispatch(tmp_path):
    write_iphone_scan(tmp_path)
    ds = make_dataset("iphone", str(tmp_path))
    assert len(ds) == 3
    ds2 = make_dataset("synthetic", "")
    assert isinstance(ds2, SyntheticSceneDataset)
    with pytest.raises(NotImplementedError):
        make_dataset("nope", "")


def test_magicleap2_registration(tmp_path):
    """register_scan produces a loadable registered scan."""
    from spatially_aware_ai_tpu.data.magicleap2 import register_scan

    for sub in ["rgb", "depth", "rgbpose", "depthpose"]:
        os.makedirs(tmp_path / sub)
    H, W = 96, 128
    for i in range(2):
        cv2.imwrite(
            str(tmp_path / "rgb" / f"{i:03d}.png"),
            RNG.uniform(0, 255, (H, W, 3)).astype(np.uint8),
        )
        depth = RNG.uniform(0.5, 2.0, (H, W)).astype(np.float32)
        cv2.imwrite(str(tmp_path / "depth" / f"{i:03d}.tiff"), depth)
        meta = {
            "intrinsics": {
                "Width": W, "Height": H,
                "FocalLength": {"x": 100.0, "y": 100.0},
                "PrincipalPoint": {"x": W / 2, "y": H / 2},
                "Distortion": [0.0, 0.0, 0.0, 0.0, 0.0],
            },
            "pose": {
                f"e{r}{c}": float(np.eye(4)[r, c])
                for r in range(4)
                for c in range(4)
            },
        }
        for sub in ["rgbpose", "depthpose"]:
            with open(tmp_path / sub / f"{i:03d}.json", "w") as f:
                json.dump(meta, f)

    out = register_scan(str(tmp_path))
    ds = make_dataset("magicleap2", str(tmp_path))
    assert len(ds) == 2
    f = ds[0]
    assert f.depth.shape[0] == H * 4
    assert np.isfinite(f.pose).all()
    assert 0.4 < np.median(f.depth[f.depth > 0]) < 2.1
