"""CLI smoke/behavior tests on a synthetic scan."""
import json
import os

import numpy as np
import pytest

from spatially_aware_ai_tpu.cli import fuse as fuse_cli
from spatially_aware_ai_tpu.cli import query as query_cli
from spatially_aware_ai_tpu.cli import extract_obj as extract_cli
from spatially_aware_ai_tpu.cli import viz as viz_cli
from spatially_aware_ai_tpu.meshing.ply import read_ply


@pytest.fixture(scope="module")
def fused_scan(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    scan = root / "synthetic_scans" / "roomA"
    os.makedirs(scan)
    with open(scan / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 8, "width": 80, "height": 60}, f)
    out = root / "out3d"
    fuse_cli.main([
        str(root / "synthetic_scans"), str(out), "--dataset", "synthetic",
        "--voxel-size", "0.06", "--tiny-clip",
        "--clip-patch-size", "40", "--clip-patch-stride", "20",
        "--frame-chunk", "4",
    ])
    return out / "roomA"


def test_fuse_cli_outputs(fused_scan):
    assert (fused_scan / "mesh_rgb.ply").exists()
    assert (fused_scan / "vertex_clip_feats.npy").exists()
    assert (fused_scan / "config.yml").exists()
    verts, faces, colors = read_ply(str(fused_scan / "mesh_rgb.ply"))
    feats = np.load(fused_scan / "vertex_clip_feats.npy")
    assert len(verts) > 100
    assert len(feats) == len(verts)
    import yaml

    with open(fused_scan / "config.yml") as f:
        cfg = yaml.safe_load(f)
    assert cfg["dataset"] == "synthetic"
    assert cfg["clip_patch_size"] == 40


def test_query_cli(fused_scan):
    query_cli.main([
        str(fused_scan), "--targets", "floor", "rug", "--tiny-clip",
    ])
    assert (fused_scan / "clipfusion_floor.ply").exists()
    assert (fused_scan / "clipSurgery_floor.ply").exists()
    v, f, c = read_ply(str(fused_scan / "clipfusion_floor.ply"))
    assert c is not None and len(c) == len(v)


def test_extract_obj_cli(fused_scan, tmp_path):
    # fabricate a vertex_obj_idx for the fused mesh
    verts, _, _ = read_ply(str(fused_scan / "mesh_rgb.ply"))
    obj_idx = (np.arange(len(verts)) % 2).astype(np.int32) - 3
    np.save(fused_scan / "vertex_obj_idx.npy", obj_idx)
    extract_cli.main([str(fused_scan), "--out-dir", str(tmp_path)])
    outs = os.listdir(tmp_path)
    assert any(o.startswith("object_") for o in outs)


def test_viz_cameras_cli(tmp_path):
    out = tmp_path / "cams.ply"
    scan = tmp_path / "scan"
    os.makedirs(scan)
    with open(scan / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 4, "width": 32, "height": 24}, f)
    viz_cli.main(["cameras", str(scan), "--dataset", "synthetic",
                  "--out", str(out)])
    v, faces, c = read_ply(str(out))
    assert len(v) == 4 * 3 * 10
    assert c is not None


def test_fuse_cli_incremental_meshes(tmp_path):
    scan = tmp_path / "scans" / "roomB"
    os.makedirs(scan)
    with open(scan / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 4, "width": 64, "height": 48}, f)
    out = tmp_path / "out"
    fuse_cli.main([
        str(tmp_path / "scans"), str(out), "--dataset", "synthetic",
        "--voxel-size", "0.08", "--tiny-clip",
        "--clip-patch-size", "32", "--clip-patch-stride", "16",
        "--frame-chunk", "2", "--incremental-meshes",
    ])
    meshes = sorted(os.listdir(out / "roomB" / "meshes"))
    assert len(meshes) == 2  # one per chunk
    v, f, c = read_ply(str(out / "roomB" / "meshes" / meshes[-1]))
    assert len(v) > 0


def test_test2d_cli(tmp_path):
    from spatially_aware_ai_tpu.cli import test2d as test2d_cli

    scan = tmp_path / "scan"
    os.makedirs(scan)
    with open(scan / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 3, "width": 64, "height": 48}, f)
    out = tmp_path / "sheets"
    test2d_cli.main([
        str(scan), "a red box", "--dataset", "synthetic", "--tiny-clip",
        "--patch-size", "32", "--patch-stride", "16",
        "--out-dir", str(out), "--max-frames", "2",
    ])
    sheets = os.listdir(out)
    assert len(sheets) == 2


def test_warm_query_programs_without_scene_warms_text_tower():
    """Boot-time warmup regression: with no scene installed,
    manager.clip_text_query returns None BEFORE any device work, so the
    old warmup was a silent no-op that still printed success. The helper
    must fall back to priming the text tower directly and report which
    mode ran."""
    from spatially_aware_ai_tpu.cli.serve import warm_query_programs

    calls = []

    class StubClip:
        def encode_text_with_prompt_ensemble(self, texts, prompt_templates):
            calls.append((tuple(texts), tuple(prompt_templates)))
            return [[0.0]]

    class StubManager:
        clip_model = StubClip()

        def clip_text_query(self, text):
            return None  # no scene installed

    assert warm_query_programs(StubManager()) == "text_tower_only"
    assert calls == [(("warmup",), ("a photo of {}",))]

    obj_calls = []

    class StubManagerWithScene(StubManager):
        def clip_text_query(self, text):
            return {"vertices": []}

        def object_text_query(self, text, top_k=0):
            obj_calls.append((text, top_k))
            return []

    calls.clear()
    assert warm_query_programs(StubManagerWithScene()) == "full"
    assert calls == []  # full query already primed the text tower
    assert obj_calls == [("warmup", 1)]  # object-ranking program primed too


def test_doctor_ok_and_json(tmp_path, capsys):
    from spatially_aware_ai_tpu.cli import doctor

    rc = doctor.main(["--no-device", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["ok"]
    assert {"imports", "compile_cache", "weights", "native",
            "knobs"} <= set(out["checks"])
    assert out["checks"]["weights"]["status"] == "warn"  # no weights here


def test_doctor_fails_on_missing_weight_file(monkeypatch, capsys):
    from spatially_aware_ai_tpu.cli import doctor

    monkeypatch.setenv("SAI_CLIP_CHECKPOINT", "/nonexistent/clip.pkl")
    rc = doctor.main(["--no-device", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and not out["ok"]
    assert "MISSING" in out["checks"]["weights"]["SAI_CLIP_CHECKPOINT"]


def test_doctor_scan_check(tmp_path, capsys):
    from spatially_aware_ai_tpu.cli import doctor

    d = tmp_path / "scans" / "demo" / "v00"
    os.makedirs(d)
    (d / "synthetic_scene.json").write_text("{}")
    rc = doctor.main([
        "--no-device", "--json", "--scan-dir", str(tmp_path / "scans"),
        "--scan-name", "demo",
    ])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["checks"]["scan"]["versions"]["v00"] == {
        "files": 1, "processed": False,
    }

    rc = doctor.main([
        "--no-device", "--json", "--scan-dir", str(tmp_path / "scans"),
        "--scan-name", "nope",
    ])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and out["checks"]["scan"]["status"] == "fail"


def test_doctor_validates_knob_values(monkeypatch, capsys):
    """Every high-blast-radius SAI_* knob fails fast on a typo instead of
    surfacing as a mid-fusion ValueError (or a silent perf cliff)."""
    from spatially_aware_ai_tpu.cli import doctor

    for knob, bad in [
        ("SAI_INTEGRATOR", "einsumm"),
        ("SAI_LABEL_VOTES", "nearsurface"),
        ("SAI_MESH_EXTRACTOR", "cubes"),
        ("SAI_LIVE_WARM", "yes"),
    ]:
        monkeypatch.setenv(knob, bad)
        rc = doctor.main(["--no-device", "--json"])
        out = json.loads(capsys.readouterr().out)
        assert rc == 1 and "unknown value" in out["checks"]["knobs"][knob], knob
        monkeypatch.delenv(knob)

    # valid values pass
    monkeypatch.setenv("SAI_MESH_EXTRACTOR", "mt")
    monkeypatch.setenv("SAI_LIVE_WARM", "0")
    rc = doctor.main(["--no-device", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0


def test_serve_fast_profile_flags(tmp_path, monkeypatch):
    """--segment-stride / --frame-chunk reach the manager (the documented
    'fast' profile invocation, docs/OPERATIONS.md): stride lands in the
    config (echoed into config.yml) and frame_chunk on the manager."""
    from spatially_aware_ai_tpu.cli import serve as serve_cli

    d = tmp_path / "scans" / "demo" / "v00"
    os.makedirs(d)
    with open(d / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 6, "width": 64, "height": 48}, f)

    captured = {}
    import spatially_aware_ai_tpu.server as server_pkg

    monkeypatch.setattr(server_pkg, "serve",
                        lambda m, host, port: captured.update(m=m))
    # pre-register the env var with monkeypatch so the flag's os.environ
    # write is rolled back after the test
    monkeypatch.setenv("SAI_SEG_STRIDE", "")
    serve_cli.main([
        "--scan-dir", str(tmp_path / "scans"), "--scan-name", "demo",
        "--dataset", "synthetic", "--output-dir", str(tmp_path / "out"),
        "--voxel-size", "0.08", "--clip-patch-size", "32",
        "--clip-patch-stride", "16", "--tiny-models", "--no-warm-query",
        "--segment-stride", "2", "--frame-chunk", "6",
    ])
    m = captured["m"]
    assert m.frame_chunk == 6
    assert m.config["segment_stride"] == 2
