"""End-to-end rehearsal of the real-data eval CLIs on generated fixtures
(VERDICT r1 next-step #6): ScanNet-format GT dirs (.aggregation.json,
.segs.json, _vh_clean_2.ply) + prediction dirs, and a multi-scene Hypersim
reconstruction dir, run through evals.scannet.main / evals.hypersim.main so
the glob/scene-matching paths are exercised before real data arrives.
"""
import json
import os

import numpy as np
import pytest

from spatially_aware_ai_tpu.evals import hypersim as hyp
from spatially_aware_ai_tpu.evals import scannet as sn
from spatially_aware_ai_tpu.meshing.ply import write_ply
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine


@pytest.fixture(scope="module")
def engine():
    return ClipEngine.tiny()


def _make_scannet_scene(gt_root, pred_root, scene, engine, rng):
    """One ScanNet-format scene: GT mesh of two planar patches labeled
    chair/table, prediction mesh = GT verts + noise, features aligned with
    the text embedding of the true class (so top-1 is deterministic)."""
    gt_dir = gt_root / scene
    pred_dir = pred_root / scene
    os.makedirs(gt_dir)
    os.makedirs(pred_dir)

    n_per = 40
    # patch A at z=0 (chair), patch B at z=5 (table)
    va = np.concatenate(
        [rng.uniform(0, 1, (n_per, 2)), np.zeros((n_per, 1))], axis=1
    )
    vb = np.concatenate(
        [rng.uniform(0, 1, (n_per, 2)), np.full((n_per, 1), 5.0)], axis=1
    )
    verts = np.concatenate([va, vb]).astype(np.float32)
    faces = np.array([[0, 1, 2], [n_per, n_per + 1, n_per + 2]], np.int32)
    write_ply(str(gt_dir / f"{scene}_vh_clean_2.ply"), verts, faces)

    # segments: vertex i -> segment i//n_per (0=chair, 1=table)
    seg_indices = [int(i // n_per) for i in range(2 * n_per)]
    with open(gt_dir / f"{scene}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_indices}, f)
    with open(gt_dir / f"{scene}.aggregation.json", "w") as f:
        json.dump(
            {
                "segGroups": [
                    {"label": "chair", "segments": [0]},
                    {"label": "table", "segments": [1]},
                ]
            },
            f,
        )

    # predictions: same verts (slightly perturbed), features = exact text
    # embedding of the true class -> top-1 transfer must be perfect
    labels, prompts, _ = sn.get_label_set("20")
    text = np.asarray(engine.text_inference(prompts))
    chair_i = labels.index("chair")
    table_i = labels.index("table")
    feats = np.concatenate(
        [
            np.tile(text[chair_i], (n_per, 1)),
            np.tile(text[table_i], (n_per, 1)),
        ]
    ).astype(np.float32)
    pred_verts = verts + rng.normal(0, 1e-3, verts.shape).astype(np.float32)
    write_ply(str(pred_dir / "mesh_rgb.ply"), pred_verts, faces)
    np.save(pred_dir / "vertex_clip_feats.npy", feats)


def test_scannet_eval_main_on_fixtures(tmp_path, engine):
    rng = np.random.default_rng(0)
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    os.makedirs(gt_root)
    os.makedirs(pred_root)
    for scene in ["scene0000_00", "scene0001_00"]:
        _make_scannet_scene(gt_root, pred_root, scene, engine, rng)
    # a prediction without GT must be skipped with a warning, not crash
    # (reference raises StopIteration here)
    os.makedirs(pred_root / "scene0002_00")

    stats = sn.main([str(pred_root), str(gt_root)], clip_engine=engine)

    assert stats["skipped_scenes"] == ["scene0002_00"]
    # features were the exact class text embeddings -> perfect top-1
    assert stats["macc_top1"] == pytest.approx(1.0)
    assert stats["macc_top5"] == pytest.approx(1.0)
    assert stats["miou"] == pytest.approx(1.0)
    # artifacts with the reference's names
    assert (pred_root / "scene_cmats.json").exists()
    assert (pred_root / "global_cmat.npy").exists()
    for scene in ["scene0000_00", "scene0001_00"]:
        for name in ["gt.ply", "transferred.ply", "correct.ply",
                     "transferred_vertex_labels.npy",
                     "gt_vertex_labels.npy"]:
            assert (pred_root / scene / name).exists(), name
    cmats = json.loads((pred_root / "scene_cmats.json").read_text())
    assert set(cmats) == {"scene0000_00", "scene0001_00"}


def test_scannet_eval_main_no_predictions_errors(tmp_path, engine):
    os.makedirs(tmp_path / "pred")
    os.makedirs(tmp_path / "gt")
    with pytest.raises(SystemExit, match="no prediction dirs"):
        sn.main([str(tmp_path / "pred"), str(tmp_path / "gt")],
                clip_engine=engine)


def test_hypersim_eval_main_on_fixtures(tmp_path, engine):
    recon = tmp_path / "recon"
    # two scenes x two probes; scene_b's reconstruction is missing ->
    # skipped with a warning
    csv_path = tmp_path / "labels.csv"
    csv_path.write_text(
        "scene_name,frame,label,x,y\n"
        "ai_001_001,0,a red chair,1,2\n"
        "ai_001_001,3,a wooden table,4,5\n"
        "ai_002_002,0,a sofa,1,1\n"
    )
    text = np.asarray(
        engine.text_inference(["a picture of a red chair"])
    )
    feats = np.concatenate(
        [np.tile(text, (10, 1)),
         np.random.default_rng(0).normal(
             size=(10, engine.feature_dim)).astype(np.float32)]
    )
    os.makedirs(recon / "ai_001_001")
    np.save(recon / "ai_001_001" / "vertex_clip_feats.npy", feats)

    out = tmp_path / "out.json"
    stats = hyp.main(
        [str(recon), "--labels-csv", str(csv_path), "--out", str(out)],
        clip_engine=engine,
    )
    assert stats["scenes_evaluated"] == 1
    assert len(stats["thresholds"]) == 101
    assert len(stats["precision"]) == 101
    assert out.exists()
    saved = json.loads(out.read_text())
    assert saved["recall"] == stats["recall"]
    # at threshold 0 every probe fires -> recall 1 over evaluated scenes
    assert stats["recall"][0] == pytest.approx(1.0)


def test_hypersim_eval_empty_dir_raises(tmp_path, engine):
    os.makedirs(tmp_path / "empty")
    with pytest.raises(FileNotFoundError, match="vertex_clip_feats"):
        hyp.eval_hypersim(str(tmp_path / "empty"), engine)
