"""Offline text-query CLI — query_mesh.py parity: load a fused scan's
vertex_clip_feats.npy + mesh, and for each target object write (a) a
softmax-relevance turbo heatmap PLY ("clipfusion_<obj>.ply") and (b) a
CLIP-Surgery 2-sigma-thresholded heatmap PLY ("clipSurgery_<obj>.ply")
(reference query_mesh.py:35-83).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

DEFAULT_TARGETS = [
    "floor", "computer screen", "keyboard", "rug", "sharp corners"
]


def main(argv=None):
    from ..meshing.ply import read_ply, write_ply
    from ..models.clip.engine import ClipEngine
    from ..query import (
        CONTROL_OBJECTS,
        run_query,
        clip_feature_surgery,
        surgery_relevance_2sigma,
        turbo_colormap,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("pred_dir")
    parser.add_argument("--targets", nargs="*", default=DEFAULT_TARGETS)
    parser.add_argument("--clip-checkpoint",
                        default=os.environ.get("SAI_CLIP_CHECKPOINT"))
    parser.add_argument("--tiny-clip", action="store_true")
    args = parser.parse_args(argv)

    feats = np.load(os.path.join(args.pred_dir, "vertex_clip_feats.npy"))
    feats = feats.astype(np.float32)
    feats /= np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)

    engine = (
        ClipEngine.tiny()
        if args.tiny_clip
        else (
            ClipEngine.from_checkpoint(args.clip_checkpoint)
            if args.clip_checkpoint
            else ClipEngine.random()
        )
    )

    verts, faces, _ = read_ply(os.path.join(args.pred_dir, "mesh_rgb.ply"))

    # --- softmax relevance path (query_mesh.py:35-47) ---
    for obj in args.targets:
        labels = ["an object", "things", "stuff", "texture", obj]
        labels = [f"a picture of {label}" for label in labels]
        text = engine.text_inference(labels)
        relevance = np.asarray(
            run_query(jnp.asarray(feats), jnp.asarray(text))
        )[:, -1]
        relevance = np.clip((relevance - 0.5) * 2, 0, 1)
        out = os.path.join(
            args.pred_dir, "clipfusion_" + obj.replace(" ", "_") + ".ply"
        )
        write_ply(out, verts, faces, turbo_colormap(relevance))
        print(f"saved {out}")

    # --- CLIP-Surgery path (query_mesh.py:49-83) ---
    text_features = engine.encode_text_with_prompt_ensemble(
        CONTROL_OBJECTS, prompt_templates=["there is a {} in the scene."]
    )
    similarity = np.asarray(
        clip_feature_surgery(jnp.asarray(feats[None]),
                             jnp.asarray(text_features))
    )
    smin = similarity.min(axis=1, keepdims=True)
    smax = similarity.max(axis=1, keepdims=True)
    similarity = (similarity - smin) / (smax - smin + 1e-12)

    for n, label in enumerate(CONTROL_OBJECTS):
        if label not in args.targets:
            continue
        relevance = surgery_relevance_2sigma(similarity[0, :, n])
        out = os.path.join(
            args.pred_dir, "clipSurgery_" + label.replace(" ", "_") + ".ply"
        )
        write_ply(out, verts, faces, turbo_colormap(relevance))
        print(f"saved {out}")


if __name__ == "__main__":
    main()
