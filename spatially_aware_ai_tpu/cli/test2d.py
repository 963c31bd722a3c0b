"""2D sanity-check CLI — test2d.py parity: render per-patch CLIP relevance
heatmaps for a query over a scan's frames and write contact-sheet JPGs
(reference test2d.py:85-122). Validates the tiled-CLIP feature extractor in
isolation, by eye.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp


def main(argv=None):
    import cv2

    from ..data import make_dataset
    from ..models.clip.engine import ClipEngine
    from ..query import run_query, turbo_colormap

    parser = argparse.ArgumentParser()
    parser.add_argument("scan_dir")
    parser.add_argument("query")
    parser.add_argument("--dataset", default="scannet")
    parser.add_argument("--out-dir", default="test2d_out")
    parser.add_argument("--patch-size", type=int, default=160)
    parser.add_argument("--patch-stride", type=int, default=80)
    parser.add_argument("--max-frames", type=int, default=24)
    parser.add_argument("--clip-checkpoint",
                        default=os.environ.get("SAI_CLIP_CHECKPOINT"))
    parser.add_argument("--tiny-clip", action="store_true")
    args = parser.parse_args(argv)

    engine = (
        ClipEngine.tiny()
        if args.tiny_clip
        else (
            ClipEngine.from_checkpoint(args.clip_checkpoint)
            if args.clip_checkpoint
            else ClipEngine.random()
        )
    )
    dataset = make_dataset(args.dataset, args.scan_dir)
    labels = ["an object", "things", "stuff", "texture", args.query]
    labels = [f"a picture of {label}" for label in labels]
    text = engine.text_inference(labels)

    os.makedirs(args.out_dir, exist_ok=True)
    n = min(len(dataset), args.max_frames)
    for i in range(n):
        frame = dataset[i]
        feat_img = np.asarray(
            engine.img_inference_tiled(
                frame.rgb, args.patch_size, args.patch_stride
            )
        )
        ny, nx, C = feat_img.shape
        feats = feat_img.reshape(-1, C).copy()  # np view of a jax buffer
        feats /= np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
        rel = np.asarray(
            run_query(jnp.asarray(feats), jnp.asarray(text))
        )[:, -1].reshape(ny, nx)

        heat = turbo_colormap(
            (rel - rel.min()) / (rel.max() - rel.min() + 1e-12)
        )
        H, W = frame.rgb.shape[:2]
        heat_full = cv2.resize(heat, (W, H), interpolation=cv2.INTER_LINEAR)
        blended = 0.5 * frame.rgb + 0.5 * heat_full
        sheet = np.concatenate([frame.rgb, blended], axis=1)
        out = os.path.join(args.out_dir, f"frame_{i:04d}.jpg")
        cv2.imwrite(
            out, cv2.cvtColor((sheet * 255).astype(np.uint8),
                              cv2.COLOR_RGB2BGR)
        )
        print(f"saved {out}")


if __name__ == "__main__":
    main()
