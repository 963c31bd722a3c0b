"""Loader tests against the CHECKED-IN miniature real-format archives
(tests/fixtures/archives/, VERDICT r3 next #7 / ROADMAP gap 3).

Unlike test_data_loaders.py (which writes scans at test time and round-trips
them), these fixtures are frozen bytes in the real export layouts with
manifest.json oracles computed from the reference's own equations at
generation time (tests/fixtures/generate_archives.py) — so they catch loader
drift, pose-convention regressions, and format-quirk handling (4x4 intrinsic
files, inf poses, parent-dir csvs, distance-along-ray depth) without any
self-consistency loop through the loader under test."""
import json
import os

import numpy as np
import pytest

from spatially_aware_ai_tpu.data import (
    HypersimDataset,
    IPhone3DScannerDataset,
    LERFDataset,
    ScanNetDataset,
    make_dataset,
)

ARCHIVES = os.path.join(os.path.dirname(__file__), "fixtures", "archives")


def manifest(*parts):
    with open(os.path.join(ARCHIVES, *parts, "manifest.json")) as f:
        return json.load(f)


def test_iphone_archive():
    d = os.path.join(ARCHIVES, "iphone_mini")
    m = manifest("iphone_mini")
    ds = IPhone3DScannerDataset(d)
    # the nan-pose frame is dropped
    assert len(ds) == m["n_frames"] == 3
    assert (ds.imwidth, ds.imheight) == tuple(m["size"])
    for i in range(len(ds)):
        f = ds[i]
        assert f.rgb.shape == (768, 1024, 3)
        assert f.depth.shape == (768, 1024)
        # ARKit right-up-back -> right-down-forward
        np.testing.assert_allclose(
            f.pose, np.array(m["poses_rdf"][i], np.float32), atol=1e-6
        )
        np.testing.assert_allclose(
            f.K, np.array(m["K_scaled"], np.float32), rtol=1e-6
        )
        # mm -> m with the 4x cubic enlarge (ramp is 4 mm/px: corner
        # extrapolation stays within a couple of mm)
        assert abs(float(f.depth[0, 0]) - m["depth_probe"][i]) < 0.02
    # native-depth capability (device-side enlarge contract)
    assert ds.native_depth_scale == 4
    stack = ds.stacked_u8([0, 1], native_depth=True)
    assert stack["depth"].dtype == np.uint16
    assert stack["depth"].shape[1:] == (192, 256)
    assert stack["depth_upsample"] == 4


def test_scannet_archive():
    d = os.path.join(ARCHIVES, "scannet_mini", "scene0706_00")
    m = manifest("scannet_mini", "scene0706_00")
    ds = ScanNetDataset(d)
    # 5 frames on disk -> inf pose dropped, 0.05 m frame keyframed away,
    # numeric (not lexical) id sort keeps 100 last
    assert len(ds) == m["n_frames"] == 3
    np.testing.assert_allclose(ds.K, np.array(m["K"], np.float32), rtol=1e-6)
    for i in range(len(ds)):
        f = ds[i]
        assert f.rgb.shape == (480, 640, 3)  # 1296x968 color resized
        assert f.depth.shape == (480, 640)
        np.testing.assert_allclose(
            f.pose, np.array(m["poses_rdf"][i], np.float32), atol=1e-6
        )
        assert abs(float(f.depth[0, 0]) - m["depth_probe"][i]) < 1e-3


def test_lerf_archive():
    d = os.path.join(ARCHIVES, "lerf_mini")
    m = manifest("lerf_mini")
    ds = LERFDataset(d)
    assert len(ds) == m["n_frames"] == 3
    for i in range(len(ds)):
        f = ds[i]
        # rgb resized to the SimpleRecon depth resolution
        assert f.rgb.shape == (192, 256, 3)
        assert f.depth.shape == (192, 256)
        # applied_transform inverted + OpenGL -> CV flip
        np.testing.assert_allclose(
            f.pose, np.array(m["poses_rdf"][i], np.float32), atol=1e-5
        )
        # global fl_x scaled from native 994x738 to depth res
        np.testing.assert_allclose(
            f.K, np.array(m["K_scaled"], np.float32), rtol=1e-5
        )
        assert abs(float(f.depth[0, 0]) - m["depth_probe"][i]) < 1e-3


def test_hypersim_archive():
    scan = os.path.join(ARCHIVES, "hypersim_mini", "ai_001_001")
    m = manifest("hypersim_mini", "ai_001_001")
    ds = HypersimDataset(scan)
    assert len(ds) == m["n_frames"] == 2
    assert (ds.imwidth, ds.imheight) == tuple(m["size"])
    # K from M_cam_from_uv via the reference's M_to_K equations
    np.testing.assert_allclose(ds.K, np.array(m["K"], np.float32),
                               rtol=1e-4)
    for i in range(len(ds)):
        f = ds[i]
        assert f.rgb.shape == (m["size"][1], m["size"][0], 3)
        # asset-unit positions scaled by meters_per_asset_unit
        np.testing.assert_allclose(
            f.pose, np.array(m["poses_rdf"][i], np.float32), atol=1e-5
        )
        # stored distance-along-ray (f16) -> planar depth everywhere
        planar = m["depth_probe"][i]
        np.testing.assert_allclose(
            f.depth, np.full_like(f.depth, planar), rtol=5e-3
        )


@pytest.mark.parametrize(
    "name,sub",
    [
        ("iphone", "iphone_mini"),
        ("scannet", os.path.join("scannet_mini", "scene0706_00")),
        ("lerf", "lerf_mini"),
        ("hypersim", os.path.join("hypersim_mini", "ai_001_001")),
    ],
)
def test_make_dataset_dispatch_on_archives(name, sub):
    ds = make_dataset(name, os.path.join(ARCHIVES, sub))
    assert len(ds) >= 2
    f = ds[0]
    assert np.isfinite(f.pose).all()
    assert f.depth.ndim == 2 and f.rgb.ndim == 3
