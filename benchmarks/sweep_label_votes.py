"""Label-vote weighting sweep (r2 VERDICT next #9): uniform vs
near_surface across voxel sizes, seeds, and segmenter-noise levels, on the
hermetic synthetic eval.

The reference fuses labels with uniform votes
(clip_seem_fusion.py:820-822); this framework's opt-in `near_surface`
mode weights each vote by surface proximity. A perfect segmenter
understates the benefit — the mode's mechanism is suppressing votes that
a frame casts onto voxels FAR from the surface it actually saw, which is
exactly where a real segmenter's boundary errors land — so the sweep
injects NoisySegmenter boundary shifts and pixel flips.

Prints one JSON line per cell plus a final summary line with the
uniform->near_surface mIoU delta per noise level. CPU-friendly (tiny CLIP
tower); runs anywhere.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from spatially_aware_ai_tpu.evals.synthetic import eval_synthetic_labels

    voxel_sizes = [float(v) for v in os.environ.get(
        "SAI_SWEEP_VOXELS", "0.05,0.03").split(",")]
    seeds = [int(s) for s in os.environ.get(
        "SAI_SWEEP_SEEDS", "0,1,2").split(",")]
    noise_levels = [
        {"name": "clean", "seg_shift_px": 0, "seg_flip_prob": 0.0},
        {"name": "shift1", "seg_shift_px": 1, "seg_flip_prob": 0.0},
        {"name": "shift2", "seg_shift_px": 2, "seg_flip_prob": 0.0},
        {"name": "flip10", "seg_shift_px": 0, "seg_flip_prob": 0.10},
        {"name": "shift2+flip10", "seg_shift_px": 2,
         "seg_flip_prob": 0.10},
    ]

    deltas = {}
    for noise in noise_levels:
        per_mode = {"uniform": [], "near_surface": []}
        for vs in voxel_sizes:
            for seed in seeds:
                for mode in ("uniform", "near_surface"):
                    stats = eval_synthetic_labels(
                        voxel_size=vs, seed=seed, label_vote_mode=mode,
                        seg_shift_px=noise["seg_shift_px"],
                        seg_flip_prob=noise["seg_flip_prob"],
                    )
                    per_mode[mode].append(stats["miou"])
                    print(json.dumps({
                        "noise": noise["name"], "voxel": vs, "seed": seed,
                        "mode": mode, "miou": round(stats["miou"], 4),
                        "acc": round(stats["accuracy"], 4),
                        "objects_detected": stats["objects"][
                            "objects_detected"],
                        "spurious": stats["objects"]["spurious_objects"],
                    }), flush=True)
        pairs = np.array(per_mode["near_surface"]) - np.array(
            per_mode["uniform"])
        deltas[noise["name"]] = {
            "mean_miou_uniform": round(
                float(np.mean(per_mode["uniform"])), 4),
            "mean_miou_near_surface": round(
                float(np.mean(per_mode["near_surface"])), 4),
            "mean_delta_pts": round(float(np.mean(pairs)) * 100, 2),
            "min_delta_pts": round(float(np.min(pairs)) * 100, 2),
            "max_delta_pts": round(float(np.max(pairs)) * 100, 2),
            "wins": int((pairs > 0).sum()),
            "losses": int((pairs < 0).sum()),
            "cells": len(pairs),
        }
    print(json.dumps({"summary": deltas}, indent=None))


if __name__ == "__main__":
    main()
