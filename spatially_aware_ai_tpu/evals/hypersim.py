"""Hypersim object-presence detection benchmark.

Exact port of the reference's metric math (hypersim_eval.py:33-99): for each
of 30 human-labeled (scene, text) probes, relevance of every mesh vertex =
softmax(100 * feats @ [4 background prompts + target]^T)[..., -1]; the scene
"contains" the object at threshold t when max relevance > t; precision /
recall accumulated over 101 thresholds in [0, 1]. Feature norms clamped to
>= 0.1 like the reference (:51).
"""
from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

DEFAULT_LABELS_CSV = os.path.join(
    os.path.dirname(__file__), "hypersim_labels.csv"
)

BACKGROUND_PROMPTS = [
    "a picture of an object",
    "a picture of things",
    "a picture of stuff",
    "a picture of texture",
]


def load_labels(csv_path: Optional[str] = None):
    with open(csv_path or DEFAULT_LABELS_CSV, newline="") as f:
        return list(csv.DictReader(f))


def eval_hypersim(
    reconstruction_dir: str,
    clip_engine,
    labels_csv: Optional[str] = None,
    num_thresholds: int = 101,
):
    """reconstruction_dir: contains <scene_name>/vertex_clip_feats.npy per
    scene. Returns dict with per-threshold precision/recall arrays."""
    rows = load_labels(labels_csv)
    label_names = [r["label"] for r in rows]

    bg = clip_engine.text_inference(BACKGROUND_PROMPTS)
    targets = clip_engine.text_inference(
        [f"a picture of {name}" for name in label_names]
    )

    thresholds = np.linspace(0, 1, num_thresholds)
    tp = np.zeros(num_thresholds)
    fp = np.zeros(num_thresholds)
    fn = np.zeros(num_thresholds)

    scene_names = sorted({r["scene_name"] for r in rows})
    n_evaluated = 0
    for scan_name in scene_names:
        feat_file = os.path.join(
            reconstruction_dir, scan_name, "vertex_clip_feats.npy"
        )
        if not os.path.exists(feat_file):
            print(f"warning: no reconstruction for {scan_name}; skipping")
            continue
        n_evaluated += 1
        feats = np.load(feat_file).astype(np.float32)
        norm = np.linalg.norm(feats, axis=-1, keepdims=True)
        feats = feats / np.maximum(norm, 0.1)

        presence = np.array(
            [r["scene_name"] == scan_name for r in rows]
        )

        import jax

        preds = []
        for i in range(len(rows)):
            text = np.concatenate([bg, targets[i : i + 1]], axis=0)
            dot = jnp.asarray(feats) @ jnp.asarray(text).T
            relevance = np.asarray(
                jax.nn.softmax(100.0 * dot, axis=-1)[..., -1]
            )
            preds.append(relevance.max() > thresholds)
        preds = np.stack(preds)

        tp += (preds & presence[:, None]).sum(axis=0)
        fp += (preds & ~presence[:, None]).sum(axis=0)
        fn += (~preds & presence[:, None]).sum(axis=0)

    if n_evaluated == 0:
        raise FileNotFoundError(
            f"no scene under {reconstruction_dir} has vertex_clip_feats.npy "
            f"(expected any of {scene_names})"
        )
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
    return {
        "thresholds": thresholds.tolist(),
        "scenes_evaluated": n_evaluated,
        "precision": precision.tolist(),
        "recall": recall.tolist(),
        "tp": tp.tolist(),
        "fp": fp.tolist(),
        "fn": fn.tolist(),
    }


def main(argv=None, clip_engine=None):
    import argparse
    import json

    parser = argparse.ArgumentParser()
    parser.add_argument("reconstruction_dir")
    parser.add_argument("--labels-csv", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

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
    engine = clip_engine
    stats = eval_hypersim(args.reconstruction_dir, engine, args.labels_csv)
    out = args.out or os.path.join(
        args.reconstruction_dir, "hypersim_eval.json"
    )
    with open(out, "w") as f:
        json.dump(stats, f)
    print(json.dumps({k: stats[k][:5] for k in ("precision", "recall")}))
    return stats


if __name__ == "__main__":
    main()
