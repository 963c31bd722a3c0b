"""ScanNet open-vocabulary segmentation benchmark.

Exact port of the reference's metric math (eval_scannet_segmentation.py):
- per-vertex labels: softmax(100 * normalized-feats @ text^T), argsort desc
  (top-k labels per vertex); feature norms clamped to >= 0.1 (:546-561)
- GT from <scan>.aggregation.json + _vh_clean_2.0.010000.segs.json (:493-543)
- prediction transferred to GT vertices by nearest neighbor (KDTree) (:585-587)
- per-class top-1/top-5 accuracy counts + confusion matrix; global mIoU and
  mean top-1/top-5 accuracy over classes (:722-736)

The relevance computation runs on device (one matmul); everything else is
host numpy/scipy.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Tuple

import numpy as np
import scipy.spatial

import jax.numpy as jnp

from ..meshing.ply import read_ply, write_ply
from . import scannet_labels as L


def get_label_set(classes: str):
    if classes == "20":
        return L.labels20, L.prompts20, L.colors20
    if classes == "200":
        return L.labels200, L.prompts200, L.colors200
    raise NotImplementedError(classes)


def get_gt_labels(gt_dir: str, classes: str = "20") -> np.ndarray:
    scan_name = os.path.basename(gt_dir)
    aggfile = os.path.join(gt_dir, f"{scan_name}.aggregation.json")
    segfile = os.path.join(
        gt_dir, f"{scan_name}_vh_clean_2.0.010000.segs.json"
    )
    with open(aggfile) as f:
        agg = json.load(f)
    with open(segfile) as f:
        segs = json.load(f)

    labels, _, _ = get_label_set(classes)
    class_to_idx = {c: i for i, c in enumerate(labels)}

    seg_to_label = {}
    for group in agg["segGroups"]:
        for seg_idx in group["segments"]:
            seg_to_label[seg_idx] = group["label"]

    seg_indices = np.asarray(segs["segIndices"])
    vertex_labels = np.full(len(seg_indices), -1, np.int32)
    for vert_idx, seg_idx in enumerate(seg_indices):
        category = seg_to_label.get(seg_idx)
        if category is not None and category in class_to_idx:
            vertex_labels[vert_idx] = class_to_idx[category]
    return vertex_labels


def segment(clip_engine, vertex_feat_file: str, prompts) -> np.ndarray:
    """Per-vertex ranked label indices [V, L] (best first)."""
    feats = np.load(vertex_feat_file).astype(np.float32)
    norm = np.linalg.norm(feats, axis=-1, keepdims=True)
    feats = feats / np.maximum(norm, 0.1)
    if np.isnan(feats).any():
        raise ValueError("found nans in vertex features")
    text = clip_engine.text_inference(prompts)
    dotprod = jnp.asarray(feats) @ jnp.asarray(text).T
    relevance = jnp.asarray(100.0 * dotprod)
    order = jnp.argsort(relevance, axis=-1, descending=True)
    return np.asarray(order)


def confusion_matrix(gt, pred, n: int) -> np.ndarray:
    mask = (gt >= 0) & (gt < n)
    idx = gt[mask] * n + pred[mask]
    return np.bincount(idx, minlength=n * n).reshape(n, n)


def eval_scene(pred_dir: str, gt_dir: str, classes: str, clip_engine,
               write_debug_meshes: bool = True):
    labels, prompts, colors = get_label_set(classes)

    vertex_feat_file = os.path.join(pred_dir, "vertex_clip_feats.npy")
    pred_verts, _, _ = read_ply(os.path.join(pred_dir, "mesh_rgb.ply"))
    gt_meshfile = os.path.join(
        gt_dir, f"{os.path.basename(gt_dir)}_vh_clean_2.ply"
    )
    gt_verts, gt_faces, _ = read_ply(gt_meshfile)

    pred_vertex_labels = segment(clip_engine, vertex_feat_file, prompts)
    gt_vertex_labels = get_gt_labels(gt_dir, classes=classes)

    kdt = scipy.spatial.KDTree(pred_verts)
    _, inds = kdt.query(gt_verts)
    transferred = pred_vertex_labels[inds]  # [Vgt, L]

    correct_top1 = gt_vertex_labels == transferred[:, 0]
    correct_top5 = np.any(
        gt_vertex_labels[:, None] == transferred[:, :5], axis=-1
    )

    ncorrect_top1, ncorrect_top5, ntotal = [], [], []
    for i in range(len(labels)):
        m = gt_vertex_labels == i
        ncorrect_top1.append(int(correct_top1[m].sum()))
        ncorrect_top5.append(int(correct_top5[m].sum()))
        ntotal.append(int(m.sum()))

    np.save(
        os.path.join(pred_dir, "transferred_vertex_labels.npy"), transferred
    )
    np.save(os.path.join(pred_dir, "gt_vertex_labels.npy"), gt_vertex_labels)

    if write_debug_meshes:
        valid = gt_vertex_labels > -1
        gt_colors = np.zeros((len(gt_vertex_labels), 3), np.float32)
        gt_colors[valid] = colors[gt_vertex_labels[valid]]
        trans_colors = colors[transferred[:, 0]].copy()
        trans_colors[~valid] = 0
        write_ply(os.path.join(pred_dir, "gt.ply"), gt_verts, gt_faces,
                  gt_colors)
        write_ply(
            os.path.join(pred_dir, "transferred.ply"), gt_verts, gt_faces,
            trans_colors,
        )
        correct_colors = np.zeros((len(gt_vertex_labels), 3), np.float32)
        correct_colors[valid & correct_top1] = [0, 1, 0]
        correct_colors[valid & ~correct_top1] = [1, 0, 0]
        write_ply(
            os.path.join(pred_dir, "correct.ply"), gt_verts, gt_faces,
            correct_colors,
        )

    cmat = confusion_matrix(
        gt_vertex_labels, transferred[:, 0], len(labels)
    )
    return cmat, ncorrect_top1, ncorrect_top5, ntotal


def summarize(global_cmat, ncorrect_top1, ncorrect_top5, ntotal):
    tp = np.diagonal(global_cmat).astype(np.float64)
    fn = global_cmat.sum(axis=-1) - tp
    fp = global_cmat.sum(axis=0) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / (tp + fp + fn)
        acc1 = np.asarray(ncorrect_top1) / np.asarray(ntotal)
        acc5 = np.asarray(ncorrect_top5) / np.asarray(ntotal)
    return {
        "miou": float(np.nanmean(iou)),
        "macc_top1": float(np.nanmean(acc1)),
        "macc_top5": float(np.nanmean(acc5)),
        "iou_per_class": iou.tolist(),
    }


def main(argv=None, clip_engine=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("pred_dir")
    parser.add_argument("gt_dir")
    parser.add_argument("--scan-name")
    parser.add_argument("--classes", "-c", default="20",
                        choices=["20", "200"])
    args = parser.parse_args(argv)

    pred_dirs = [
        d
        for d in sorted(glob.glob(os.path.join(args.pred_dir, "scene*")))
        if os.path.isdir(d)
    ]
    gt_dirs = sorted(glob.glob(os.path.join(args.gt_dir, "scene*")))
    if args.scan_name:
        pred_dirs = [
            d for d in pred_dirs if os.path.basename(d) == args.scan_name
        ]
    if not pred_dirs:
        raise SystemExit(
            f"no prediction dirs matching scene* under {args.pred_dir}"
            + (f" with scan name {args.scan_name}" if args.scan_name else "")
        )

    if clip_engine is None:
        from ..models.clip.engine import ClipEngine

        ckpt = os.environ.get("SAI_CLIP_CHECKPOINT")
        if not ckpt:
            print(
                "warning: SAI_CLIP_CHECKPOINT unset -> random-weight CLIP; "
                "scores are meaningless without converted weights"
            )
        clip_engine = (
            ClipEngine.from_checkpoint(ckpt) if ckpt else ClipEngine.random()
        )

    global_cmat = 0
    scene_cmats = {}
    nc1 = nc5 = nt = 0
    skipped = []
    for pred_dir in pred_dirs:
        scene_name = os.path.basename(pred_dir)
        matches = [d for d in gt_dirs if scene_name in d]
        if not matches:
            # reference crashes here with StopIteration
            # (eval_scannet_segmentation.py:712's gt-dir lookup); we skip
            # with a warning and keep evaluating the rest
            print(f"warning: no GT dir for {scene_name} under {args.gt_dir};"
                  " skipping")
            skipped.append(scene_name)
            continue
        cmat, c1, c5, t = eval_scene(pred_dir, matches[0], args.classes,
                                     clip_engine)
        scene_cmats[scene_name] = cmat.tolist()
        global_cmat = global_cmat + cmat
        nc1 = nc1 + np.array(c1)
        nc5 = nc5 + np.array(c5)
        nt = nt + np.array(t)

    if not scene_cmats:
        raise SystemExit(
            f"no scene had both predictions and GT (skipped: {skipped})"
        )
    stats = summarize(global_cmat, nc1, nc5, nt)
    stats["skipped_scenes"] = skipped
    print(round(100 * stats["miou"], 1))
    print(round(100 * stats["macc_top1"], 1))
    print(round(100 * stats["macc_top5"], 1))
    with open(os.path.join(args.pred_dir, "scene_cmats.json"), "w") as f:
        json.dump(scene_cmats, f)
    np.save(os.path.join(args.pred_dir, "global_cmat.npy"),
            np.asarray(global_cmat))
    return stats


if __name__ == "__main__":
    main()
