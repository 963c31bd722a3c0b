"""Conversion-day rehearsal of the full ScanNet parity procedure
(SURVEY.md §6): a ScanNet-FORMAT scan directory (color jpgs, 16-bit mm depth
pngs, pose txts, intrinsic_depth.txt) rendered from the synthetic oracle is
fused through the batch CLI and evaluated through evals.scannet.main —
exactly the chain that will run on real ScanNet scans once weights exist.
"""
import json
import os

import cv2
import numpy as np
import pytest

from spatially_aware_ai_tpu.cli import fuse as fuse_cli
from spatially_aware_ai_tpu.data.scannet import ScanNetDataset
from spatially_aware_ai_tpu.data.synthetic import SyntheticSceneDataset
from spatially_aware_ai_tpu.evals import scannet as sn
from spatially_aware_ai_tpu.meshing.ply import read_ply, write_ply
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine

SCENE = "scene0777_00"


@pytest.fixture(scope="module")
def scannet_dir(tmp_path_factory):
    """Write a ScanNet-format scan from the synthetic renderer."""
    root = tmp_path_factory.mktemp("scannet_fmt")
    scan = root / SCENE
    for sub in ["color", "depth", "pose", "intrinsic"]:
        os.makedirs(scan / sub)

    ds = SyntheticSceneDataset(num_frames=10, width=640, height=480)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = ds.K
    np.savetxt(scan / "intrinsic" / "intrinsic_depth.txt", K4)

    for i in range(len(ds)):
        f = ds[i]
        bgr = cv2.cvtColor(
            (np.clip(f.rgb, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
        )
        cv2.imwrite(str(scan / "color" / f"{i}.jpg"), bgr)
        d16 = np.clip(np.rint(f.depth * 1000.0), 0, 65535).astype(np.uint16)
        cv2.imwrite(str(scan / "depth" / f"{i}.png"), d16)
        np.savetxt(scan / "pose" / f"{i}.txt", f.pose)

    # one frame with an infinite pose: the loader must drop it (reference
    # clipfusion.py:215)
    bad = np.full((4, 4), np.inf)
    np.savetxt(scan / "pose" / "10.txt", bad)
    cv2.imwrite(str(scan / "color" / "10.jpg"), bgr)
    cv2.imwrite(str(scan / "depth" / "10.png"), d16)
    return root


def test_loader_reads_format_and_filters(scannet_dir):
    ds = ScanNetDataset(str(scannet_dir / SCENE), keyframe_tdist=0.1)
    assert 2 <= len(ds) <= 10  # keyframed, inf pose dropped
    f = ds[0]
    assert f.rgb.shape == (480, 640, 3)
    assert f.depth.shape == (480, 640)
    assert f.depth.max() < 65.0  # meters, not millimeters
    assert np.isfinite(f.pose).all()


def test_fuse_cli_then_scannet_eval_chain(scannet_dir, tmp_path):
    out_root = tmp_path / "pred"
    fuse_cli.main([
        str(scannet_dir), str(out_root), "--dataset", "scannet",
        "--voxel-size", "0.08", "--tiny-clip",
        "--clip-patch-size", "160", "--clip-patch-stride", "80",
        "--frame-chunk", "4",
    ])
    pred_dir = out_root / SCENE
    for name in ["mesh_rgb.ply", "vertex_clip_feats.npy", "config.yml"]:
        assert (pred_dir / name).exists(), name

    verts, faces, _ = read_ply(str(pred_dir / "mesh_rgb.ply"))
    assert len(verts) > 100
    feats = np.load(pred_dir / "vertex_clip_feats.npy")
    assert feats.shape[0] == len(verts)

    # GT in ScanNet's format, derived from the true scene geometry: every
    # mesh vertex labeled by its nearest box ("floor" / "table" are in the
    # 20-class label set)
    ds = SyntheticSceneDataset(num_frames=1, width=64, height=48)
    gt_dir = tmp_path / "gt" / SCENE
    os.makedirs(gt_dir)
    write_ply(str(gt_dir / f"{SCENE}_vh_clean_2.ply"), verts, faces)

    def nearest_box(p):
        best, name = 1e9, None
        for b in ds.scene.boxes:
            q = np.maximum(b.lo - p, 0) + np.maximum(p - b.hi, 0)
            d = np.linalg.norm(q)
            if d < best:
                best, name = d, b.name
        return name

    name_to_label = {"floor": "floor", "table": "table",
                     "red_box": "otherfurniture", "blue_chair": "chair"}
    seg_indices = []
    groups = {}
    for vi, v in enumerate(verts):
        label = name_to_label[nearest_box(v)]
        seg_indices.append(vi)
        groups.setdefault(label, []).append(vi)
    with open(gt_dir / f"{SCENE}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_indices}, f)
    with open(gt_dir / f"{SCENE}.aggregation.json", "w") as f:
        json.dump(
            {"segGroups": [
                {"label": k, "segments": v} for k, v in groups.items()
            ]},
            f,
        )

    stats = sn.main(
        [str(out_root), str(tmp_path / "gt")], clip_engine=ClipEngine.tiny()
    )
    # random-weight CLIP -> scores are meaningless; the chain must be
    # mechanically sound end to end
    assert 0.0 <= stats["miou"] <= 1.0
    assert (out_root / "scene_cmats.json").exists()
    assert (pred_dir / "transferred.ply").exists()


def test_fuse_cli_then_hypersim_eval_chain(tmp_path):
    """Same rehearsal for Hypersim: an HDF5-format scan through the batch
    CLI, then evals.hypersim.main over the reconstruction dir."""
    from test_hypersim_loader import write_hypersim_scan

    from spatially_aware_ai_tpu.evals import hypersim as hyp

    scans_root = tmp_path / "hypersim"
    os.makedirs(scans_root)
    write_hypersim_scan(scans_root, scan_name="ai_001_001", n_frames=3,
                        W=64, H=48)
    out_root = tmp_path / "recon"
    fuse_cli.main([
        str(scans_root), str(out_root), "--dataset", "hypersim",
        "--voxel-size", "0.2", "--tiny-clip",
        "--clip-patch-size", "32", "--clip-patch-stride", "16",
        "--frame-chunk", "2",
    ])
    pred = out_root / "ai_001_001"
    assert (pred / "vertex_clip_feats.npy").exists()

    csv_path = tmp_path / "labels.csv"
    csv_path.write_text(
        "scene_name,frame,label,x,y\n"
        "ai_001_001,0,a chair,1,2\n"
        "ai_001_001,1,a lamp,3,4\n"
    )
    out = tmp_path / "hyp.json"
    stats = hyp.main(
        [str(out_root), "--labels-csv", str(csv_path), "--out", str(out)],
        clip_engine=ClipEngine.tiny(),
    )
    assert stats["scenes_evaluated"] == 1
    assert len(stats["precision"]) == 101
    assert out.exists()
