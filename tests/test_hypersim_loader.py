"""Hypersim loader test against generated HDF5 scan files."""
import os

import h5py
import numpy as np

from spatially_aware_ai_tpu.data.hypersim import HypersimDataset

RNG = np.random.default_rng(4)


def write_hypersim_scan(root, scan_name="ai_001_001", n_frames=2,
                        W=64, H=48):
    scan = root / scan_name
    geo = scan / "images" / "scene_cam_00_geometry_hdf5"
    fin = scan / "images" / "scene_cam_00_final_hdf5"
    detail = scan / "_detail" / "cam_00"
    for d in (geo, fin, detail):
        os.makedirs(d)

    # camera parameter csv shared at the dataset root
    M = np.diag([1.2, 0.9, -1.0])
    cols = ["scene_name", "settings_output_img_height",
            "settings_output_img_width"] + [
        f"M_cam_from_uv_{i}{j}" for i in range(3) for j in range(3)
    ]
    vals = [scan_name, H, W] + [M[i, j] for i in range(3) for j in range(3)]
    with open(root / "metadata_camera_parameters.csv", "w") as f:
        f.write(",".join(cols) + "\n")
        f.write(",".join(str(v) for v in vals) + "\n")

    with open(scan / "_detail" / "metadata_scene.csv", "w") as f:
        f.write("parameter_name,parameter_value\n")
        f.write("meters_per_asset_unit,0.02\n")

    pos = RNG.normal(size=(n_frames, 3)).astype(np.float32)
    rot = np.tile(np.eye(3, dtype=np.float32), (n_frames, 1, 1))
    with h5py.File(detail / "camera_keyframe_positions.hdf5", "w") as f:
        f.create_dataset("dataset", data=pos)
    with h5py.File(detail / "camera_keyframe_orientations.hdf5", "w") as f:
        f.create_dataset("dataset", data=rot)

    for i in range(n_frames):
        rgb = RNG.uniform(0, 1.4, size=(H, W, 3)).astype(np.float32)
        dist = RNG.uniform(0.5, 3.0, size=(H, W)).astype(np.float32)
        with h5py.File(fin / f"frame.{i:04d}.color.hdf5", "w") as f:
            f.create_dataset("dataset", data=rgb)
        with h5py.File(geo / f"frame.{i:04d}.depth_meters.hdf5", "w") as f:
            f.create_dataset("dataset", data=dist)
    return pos


def test_hypersim_loader(tmp_path):
    pos = write_hypersim_scan(tmp_path)
    ds = HypersimDataset(str(tmp_path / "ai_001_001"))
    assert len(ds) == 2
    assert (ds.imwidth, ds.imheight) == (64, 48)
    f = ds[0]
    assert f.rgb.shape == (48, 64, 3)
    assert f.rgb.max() <= 1.0  # HDR clamped like the reference
    assert f.depth.shape == (48, 64)
    # distance-along-ray -> planar conversion shrinks off-center depths
    assert (ds.dist_to_depth <= 1.0 + 1e-5).all()
    center = ds.dist_to_depth[24, 32]
    corner = ds.dist_to_depth[0, 0]
    assert corner < center
    # asset-unit scaling applied to camera positions
    np.testing.assert_allclose(f.pose[:3, 3], pos[0] * 0.02, atol=1e-6)
    assert np.isfinite(f.K).all()
