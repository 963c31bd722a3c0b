"""Server CLI — app_unity.py equivalent: build the InSituManager (auto-
reconstructing v00 when unprocessed) and serve the Unity API on port 3291.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..manager import InSituManager
    from ..server import serve

    parser = argparse.ArgumentParser()
    parser.add_argument("--scan-dir", default="scenes/iphone_3dscanner")
    parser.add_argument("--scan-name", default="demo_scene")
    parser.add_argument("--dataset", default="iphone")
    parser.add_argument("--output-dir", default="unity_output")
    parser.add_argument("--voxel-size", type=float, default=0.04)
    parser.add_argument("--trunc-vox", type=float, default=3)
    parser.add_argument("--clip-patch-size", type=int, default=256)
    parser.add_argument("--clip-patch-stride", type=int, default=128)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=3291)
    parser.add_argument("--tiny-models", action="store_true",
                        help="small random models (smoke testing)")
    args = parser.parse_args(argv)

    kwargs = {}
    if args.tiny_models:
        from ..data.synthetic import ColorSegmenter, SyntheticScene
        from ..models.clip.engine import ClipEngine

        kwargs["clip_engine"] = ClipEngine.tiny()
        kwargs["seg_model"] = ColorSegmenter(SyntheticScene.demo_room())

    manager = InSituManager(
        scan_dir=args.scan_dir,
        scan_name=args.scan_name,
        dataset=args.dataset,
        output_dir=args.output_dir,
        voxel_size=args.voxel_size,
        trunc_vox=args.trunc_vox,
        clip_patch_size=args.clip_patch_size,
        clip_patch_stride=args.clip_patch_stride,
        curr_ver=0,
        **kwargs,
    )
    serve(manager, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
