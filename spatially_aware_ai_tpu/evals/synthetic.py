"""Hermetic quality benchmark: fused label quality vs ground truth.

The reference's quality metrics (ScanNet mIoU, Hypersim precision/recall)
need real datasets and pretrained weights. This eval measures the same kind
of number hermetically: fuse a synthetic scan with the ground-truth color
segmenter, voxelize the scene's true geometry, and score the fused per-voxel
class grid against it (mIoU over observed near-surface voxels + per-class
IoU). It validates the whole label path — panoptic masks -> nearest
sampling -> histogram fusion -> argmax — with an objective score.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..data.synthetic import ColorSegmenter, SyntheticScene, SyntheticSceneDataset
from ..pipeline import FusionConfig, fuse_scan
from ..scene.colors import NULL_CLASS_ID


def voxelize_gt(scene: SyntheticScene, origin, nvox, voxel_size: float,
                shell_m: float):
    """Per-voxel GT class id: the class of the box whose surface is within
    shell_m of the voxel center (nearest surface wins); -1 elsewhere."""
    nvox = tuple(int(v) for v in np.asarray(nvox).reshape(3))
    idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in nvox], indexing="ij"), axis=-1
    ).astype(np.float32)
    centers = idx.reshape(-1, 3) * voxel_size + np.asarray(origin, np.float32)

    best = np.full(len(centers), np.inf, np.float32)
    cls = np.full(len(centers), -1, np.int32)
    for box in scene.boxes:
        c = (box.lo + box.hi) / 2
        half = (box.hi - box.lo) / 2
        q = np.abs(centers - c) - half
        outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
        inside = np.minimum(q.max(axis=-1), 0)
        sdf = np.abs(outside + inside)
        closer = sdf < best
        best = np.where(closer, sdf, best)
        cls = np.where(closer & (sdf <= shell_m), box.class_id, cls)
    return cls.reshape(nvox)


def eval_synthetic_labels(
    num_frames: int = 16,
    width: int = 128,
    height: int = 96,
    voxel_size: float = 0.05,
    clip_engine=None,
    seed: int = 0,
    label_vote_mode: str = "uniform",
    integrator=None,
) -> Dict:
    scene = SyntheticScene.demo_room()
    ds = SyntheticSceneDataset(
        scene=scene, num_frames=num_frames, width=width, height=height,
        seed=seed,
    )
    if clip_engine is None:
        from ..models.clip.engine import ClipEngine

        clip_engine = ClipEngine.tiny()
    seg = ColorSegmenter(scene)
    cfg = FusionConfig(
        voxel_size=voxel_size, trunc_vox=2.0,
        clip_patch_size=width // 2, clip_patch_stride=width // 4,
        frame_chunk=8, with_labels=True,
        label_vote_mode=label_vote_mode, integrator=integrator,
    )
    result = fuse_scan(ds, clip_engine, cfg, segmenter=seg.run_on_image)

    nvox = result.nvox
    pred = result.values["class_id"].reshape(nvox)
    weight = result.values["weight"].reshape(nvox)
    gt = voxelize_gt(scene, result.origin, nvox, voxel_size,
                     shell_m=cfg.trunc_m)

    # score observed voxels whose GT is a real surface class
    mask = (weight > 0) & (gt >= 0)
    classes = sorted({int(b.class_id) for b in scene.boxes})
    ious = {}
    accs = {}
    for c in classes:
        tp = int(((pred == c) & (gt == c) & mask).sum())
        fp = int(((pred == c) & (gt != c) & mask).sum())
        fn = int(((pred != c) & (gt == c) & mask).sum())
        ious[c] = tp / max(tp + fp + fn, 1)
        accs[c] = tp / max(tp + fn, 1)
    acc = float(((pred == gt) & mask).sum() / max(mask.sum(), 1))

    # mesh geometric quality: distance of extracted vertices to the true
    # surface (union of box SDFs)
    mesh = result.extract_mesh()
    verts = mesh["verts_world"]
    sdf = np.full(len(verts), np.inf, np.float32)
    for box in scene.boxes:
        c = (box.lo + box.hi) / 2
        half = (box.hi - box.lo) / 2
        q = np.abs(verts - c) - half
        outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
        inside = np.minimum(q.max(axis=-1), 0)
        sdf = np.minimum(sdf, np.abs(outside + inside))

    return {
        "miou": float(np.mean(list(ious.values()))),
        "accuracy": acc,
        "iou_per_class": ious,
        "recall_per_class": accs,
        "observed_voxels": int(mask.sum()),
        "nvox": list(nvox),
        "mesh_vertices": int(len(verts)),
        "surface_rms_m": float(np.sqrt((sdf**2).mean())),
        "surface_p95_m": float(np.quantile(sdf, 0.95)),
        "voxel_size_m": voxel_size,
        "label_vote_mode": label_vote_mode,
    }


def main(argv=None):
    import argparse
    import json

    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--voxel-size", type=float, default=0.05)
    parser.add_argument("--label-votes", default="uniform",
                        choices=["uniform", "near_surface"])
    parser.add_argument("--integrator", default=None)
    args = parser.parse_args(argv)
    stats = eval_synthetic_labels(
        args.frames, args.width, args.height, args.voxel_size,
        label_vote_mode=args.label_votes, integrator=args.integrator,
    )
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
