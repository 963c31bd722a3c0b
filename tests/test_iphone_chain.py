"""End-to-end rehearsal of the headline product ingest path: a 3D Scanner
App (iPhone LiDAR) scan directory through the batch fuse CLI (dataset
AUTODETECTED from the path; the reference's per-dataset patch defaults
clipfusion.py:1196-1218 apply — 256/128 tiles the 1024x768 frames
exactly), then the offline query CLI over the produced artifacts
(reference query_mesh.py).

ScanNet and Hypersim have the same rehearsal in test_scannet_chain.py;
the iPhone format (per-frame K + ARKit pose flip + 4x depth upsample,
reference clipfusion.py:259-374) only had loader-level coverage.
"""
import os

import numpy as np

from spatially_aware_ai_tpu.cli import fuse as fuse_cli
from spatially_aware_ai_tpu.cli import query as query_cli
from spatially_aware_ai_tpu.meshing.ply import read_ply

from test_data_loaders import write_iphone_scan


def test_fuse_cli_then_query_chain_iphone(tmp_path):
    scan_dir = tmp_path / "iphone_scans" / "kitchen"
    os.makedirs(scan_dir)
    write_iphone_scan(scan_dir, num_frames=3)

    out_root = tmp_path / "out3d"
    # no --dataset: "iphone" must be autodetected from the path
    fuse_cli.main([
        str(tmp_path / "iphone_scans"), str(out_root),
        "--voxel-size", "0.3", "--tiny-clip", "--frame-chunk", "2",
    ])
    pred_dir = out_root / "kitchen"
    for name in ["mesh_rgb.ply", "vertex_clip_feats.npy", "config.yml"]:
        assert (pred_dir / name).exists(), name

    verts, faces, _ = read_ply(str(pred_dir / "mesh_rgb.ply"))
    assert len(verts) > 10
    feats = np.load(pred_dir / "vertex_clip_feats.npy")
    assert feats.shape[0] == len(verts)
    assert np.isfinite(feats[np.abs(feats).sum(axis=1) > 0]).all()

    query_cli.main([str(pred_dir), "--targets", "floor", "--tiny-clip"])
    assert (pred_dir / "clipfusion_floor.ply").exists()
    assert (pred_dir / "clipSurgery_floor.ply").exists()
