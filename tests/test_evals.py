"""Eval-metric ports tested on constructed scenes where the right answer is
known exactly: vertex features are set to the text embeddings of their GT
class prompts, so a correct eval chain scores ~perfectly."""
import json
import os

import numpy as np
import pytest

from spatially_aware_ai_tpu.evals import scannet as se
from spatially_aware_ai_tpu.evals import hypersim as he
from spatially_aware_ai_tpu.evals.scannet_labels import (
    labels20,
    prompts20,
    labels200,
    prompts200,
)
from spatially_aware_ai_tpu.meshing.ply import write_ply
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine

RNG = np.random.default_rng(17)


def test_label_sets():
    assert len(labels20) == 20 and len(prompts20) == 20
    assert prompts20[5] == "a picture of a sofa"
    assert len(labels200) == 200
    assert prompts200[5] == "sofa"


@pytest.fixture(scope="module")
def engine():
    return ClipEngine.tiny()


def test_confusion_matrix():
    gt = np.array([0, 0, 1, 1, 2, -1])
    pred = np.array([0, 1, 1, 1, 0, 2])
    cm = se.confusion_matrix(gt, pred, 3)
    expect = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 0]])
    np.testing.assert_array_equal(cm, expect)


def test_scannet_eval_perfect_prediction(tmp_path, engine):
    scan_name = "scene0000_00"
    gt_dir = tmp_path / "gt" / scan_name
    pred_dir = tmp_path / "pred" / scan_name
    os.makedirs(gt_dir)
    os.makedirs(pred_dir)

    # 60 vertices in 3 segments -> classes wall(0), chair(4), bed(3)
    n_per = 20
    used_classes = [0, 4, 3]
    verts = []
    seg_indices = []
    for s, cls in enumerate(used_classes):
        base = np.array([s * 10.0, 0, 0])
        verts.append(base + RNG.normal(scale=0.2, size=(n_per, 3)))
        seg_indices += [s] * n_per
    verts = np.concatenate(verts).astype(np.float32)
    faces = np.array([[0, 1, 2]])

    write_ply(str(gt_dir / f"{scan_name}_vh_clean_2.ply"), verts, faces)
    with open(gt_dir / f"{scan_name}.aggregation.json", "w") as f:
        json.dump(
            {
                "segGroups": [
                    {"segments": [0], "label": "wall"},
                    {"segments": [1], "label": "chair"},
                    {"segments": [2], "label": "bed"},
                ]
            },
            f,
        )
    with open(gt_dir / f"{scan_name}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_indices}, f)

    # prediction mesh: same vertices (slightly jittered), features = the
    # class prompt's own text embedding -> argmax must hit the class
    text = engine.text_inference(prompts20)  # [20, C]
    feats = np.concatenate(
        [np.tile(text[cls][None], (n_per, 1)) for cls in used_classes]
    ).astype(np.float32)
    pred_verts = verts + RNG.normal(scale=0.01, size=verts.shape).astype(
        np.float32
    )
    write_ply(str(pred_dir / "mesh_rgb.ply"), pred_verts, faces)
    np.save(pred_dir / "vertex_clip_feats.npy", feats)

    cmat, nc1, nc5, nt = se.eval_scene(
        str(pred_dir), str(gt_dir), "20", engine
    )
    stats = se.summarize(cmat, nc1, nc5, nt)
    # classes present must be perfectly segmented
    for cls in used_classes:
        assert cmat[cls, cls] == n_per
    assert stats["macc_top1"] == pytest.approx(1.0)
    assert stats["macc_top5"] == pytest.approx(1.0)
    iou = np.asarray(stats["iou_per_class"])
    assert np.nanmin(iou[used_classes]) == pytest.approx(1.0)
    # debug artifacts written
    assert (pred_dir / "transferred.ply").exists()
    assert (pred_dir / "gt.ply").exists()


def test_hypersim_eval(tmp_path, engine):
    rows = he.load_labels()
    scenes = sorted({r["scene_name"] for r in rows})[:3]
    for scan in scenes:
        own = [r["label"] for r in rows if r["scene_name"] == scan]
        text = engine.text_inference([f"a picture of {t}" for t in own])
        feats = np.tile(text, (5, 1)).astype(np.float32)
        os.makedirs(tmp_path / scan)
        np.save(tmp_path / scan / "vertex_clip_feats.npy", feats)

    stats = he.eval_hypersim(str(tmp_path), engine)
    prec = np.asarray(stats["precision"])
    rec = np.asarray(stats["recall"])
    assert len(prec) == 101
    # at threshold 0 everything predicted present: recall 1, precision low
    assert rec[0] == pytest.approx(1.0)
    # own-scene labels have relevance ~1 (feats == target embedding), other
    # labels lower -> mid thresholds keep recall high
    assert rec[60] > 0.9
    assert prec[60] >= prec[0]


def test_synthetic_label_quality():
    """End-to-end fused-label quality vs GT voxelization must stay high
    (hermetic stand-in for the ScanNet mIoU benchmark)."""
    from spatially_aware_ai_tpu.evals.synthetic import eval_synthetic_labels

    stats = eval_synthetic_labels(num_frames=12, width=96, height=72,
                                  voxel_size=0.06)
    assert stats["observed_voxels"] > 1000
    assert stats["miou"] > 0.8, stats
    assert stats["accuracy"] > 0.9, stats


def test_synthetic_object_discovery_quality():
    """Instance-discovery quality on the hermetic scene: every GT box must
    be found by the production flood-fill layer with the right class and
    solid voxel overlap, and the scene must not shatter into spurious
    fragments."""
    from spatially_aware_ai_tpu.evals.synthetic import eval_synthetic_labels

    stats = eval_synthetic_labels(num_frames=12, width=96, height=72,
                                  voxel_size=0.06)
    obj = stats["objects"]
    assert obj["objects_detected"] == obj["objects_total"] == 4, obj
    assert obj["mean_matched_iou"] > 0.5, obj
    assert obj["spurious_objects"] <= 1, obj


def test_synthetic_label_quality_boundary_shift():
    """Quality gate under the REALISTIC segmenter error mode (VERDICT r3
    next #10): 2-px boundary-shifted masks — the kMaX failure shape the
    label-vote ablation showed behaves opposite to speckle noise. Measured
    r4 baseline at this operating point: mIoU 0.879 / acc 0.936 (clean:
    0.933 / 0.980); the gate gives ~5 pts of slack so it trips on fusion-
    semantics regressions, not run noise."""
    from spatially_aware_ai_tpu.evals.synthetic import eval_synthetic_labels

    stats = eval_synthetic_labels(num_frames=12, width=96, height=72,
                                  voxel_size=0.06, seg_shift_px=2)
    assert stats["miou"] > 0.83, stats
    assert stats["accuracy"] > 0.89, stats
    obj = stats["objects"]
    assert obj["objects_detected"] == obj["objects_total"] == 4, obj
