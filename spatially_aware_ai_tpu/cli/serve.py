"""Server CLI — app_unity.py equivalent: build the InSituManager (auto-
reconstructing v00 when unprocessed) and serve the Unity API on port 3291.
"""
from __future__ import annotations

import argparse
import os


def warm_query_programs(manager) -> str:
    """Prime the text-query compiled programs at boot so the FIRST client
    query is steady-state (~0.1-0.7 s) instead of paying ~2 s of serialized
    compile-cache loads. With a scene installed this runs a real query end
    to end ("full"). Without one, clip_text_query returns None BEFORE any
    device work, so warm the text tower (the dominant per-process cache
    load) directly ("text_tower_only"); the first real query then only pays
    the scene-shaped surgery matmul."""
    if manager.clip_text_query("warmup") is not None:
        # also primes the object-ranking program (same bank shape as a
        # real first query: scene classes + one novel phrase)
        manager.object_text_query("warmup", top_k=1)
        return "full"
    manager.clip_model.encode_text_with_prompt_ensemble(
        ["warmup"], prompt_templates=["a photo of {}"]
    )
    return "text_tower_only"


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
    parser.add_argument("--frame-chunk", type=int, default=8,
                        help="frames fused per device dispatch")
    parser.add_argument("--segment-stride", type=int, default=0,
                        help="segment every k-th frame only (0 = the "
                             "SAI_SEG_STRIDE env / default 1). The 'fast' "
                             "profile is --segment-stride 2 "
                             "--frame-chunk 16 (docs/OPERATIONS.md): "
                             "1.5-1.6x device throughput for ~-1 pt mIoU "
                             "on scans >= 96 frames")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=3291)
    parser.add_argument("--tiny-models", action="store_true",
                        help="small random models (smoke testing)")
    parser.add_argument("--segmenter", default=None,
                        choices=["kmax", "heuristic", "geometric"],
                        help="panoptic segmenter: kmax (default; "
                             "SAI_KMAX_CHECKPOINT or random weights), or "
                             "the weight-free fallbacks — heuristic "
                             "(color clustering) / geometric (depth-aware "
                             "plane claims + color clustering; the better "
                             "fallback whenever frames carry depth — "
                             "docs/OPERATIONS.md §6). Overrides the "
                             "--tiny-models synthetic segmenter")
    parser.add_argument("--multi-scene", action="store_true",
                        help="serve EVERY scene under --scan-dir from this "
                             "one process (lazy per-scene managers, shared "
                             "model towers); --scan-name becomes the "
                             "default scene for requests without a `scene` "
                             "field, and GET /scenes lists the rest")
    parser.add_argument("--max-loaded-scenes", type=int, default=0,
                        help="with --multi-scene: bound device memory by "
                             "evicting the least-recently-used idle scene "
                             "before loading another (each loaded scene "
                             "pins ~1 GB of voxel features at the default "
                             "operating point); 0 = unlimited")
    parser.add_argument("--no-warm-query", action="store_true",
                        help="skip the boot-time query warmup (first "
                             "/text_query then pays the one-time "
                             "compile-cache loads, ~2 s on TPU)")
    args = parser.parse_args(argv)

    kwargs = {}
    if args.tiny_models:
        from ..data.synthetic import ColorSegmenter, SyntheticScene
        from ..models.clip.engine import ClipEngine

        engine = ClipEngine.tiny()
        kwargs["clip_engine"] = engine
        kwargs["seg_model"] = ColorSegmenter(SyntheticScene.demo_room())

        # a tiny in-situ model per scene (the model is stateful per
        # scene: weights, labels, artifact paths — so multi-scene mode
        # gets a factory the registry calls per built manager)
        from ..manager.paths import dotdict, get_path
        from ..models.dgcnn import InSituLearning

        def _tiny_insitu(scene_name):
            paths = get_path(
                dotdict({"scan_dir": args.scan_dir,
                         "scan_name": scene_name,
                         "output_dir": args.output_dir}),
                0,
            )
            return InSituLearning(
                emb_dims=64, k_neighbors=8, num_points=30, batch_size=32,
                epochs=120, lr=0.003, feature_dim=engine.feature_dim,
                model_path=paths.insitu_model_path,
                label_path=paths.insitu_labels,
            )

        if args.multi_scene:
            kwargs["insitu_factory"] = _tiny_insitu
        else:
            kwargs["insitu_model"] = _tiny_insitu(args.scan_name)

    if args.segmenter == "heuristic":
        from ..models.kmax import HeuristicSegmenter

        kwargs["seg_model"] = HeuristicSegmenter()
    elif args.segmenter == "geometric":
        from ..models.kmax import GeometricSegmenter

        kwargs["seg_model"] = GeometricSegmenter()
    elif args.segmenter == "kmax":
        kwargs.pop("seg_model", None)  # manager default (checkpoint/random)

    if args.segment_stride > 0:
        # the manager reads SAI_SEG_STRIDE at construction (echoed into
        # every version's config.yml); the flag is sugar over the env so
        # single- and multi-scene managers pick it up identically
        os.environ["SAI_SEG_STRIDE"] = str(args.segment_stride)
    shared = dict(
        dataset=args.dataset,
        voxel_size=args.voxel_size,
        trunc_vox=args.trunc_vox,
        clip_patch_size=args.clip_patch_size,
        clip_patch_stride=args.clip_patch_stride,
        frame_chunk=args.frame_chunk,
        **kwargs,
    )
    if args.multi_scene:
        from ..manager.registry import SceneRegistry

        registry = SceneRegistry(
            scan_dir=args.scan_dir,
            output_dir=args.output_dir,
            default_scene=args.scan_name,
            manager_kwargs={**shared, "curr_ver": 0},
            max_loaded=args.max_loaded_scenes,
        )
        print(f"multi-scene registry: {registry.scene_names()} "
              f"(default {args.scan_name})")
        manager = registry.get()  # boot the default scene eagerly
    else:
        registry = None
        manager = InSituManager(
            scan_dir=args.scan_dir,
            scan_name=args.scan_name,
            output_dir=args.output_dir,
            curr_ver=0,
            **shared,
        )
    if not args.no_warm_query:
        try:
            import time as _time

            t0 = _time.perf_counter()
            mode = warm_query_programs(manager)
            print(
                f"query warmup ({mode}): "
                f"{_time.perf_counter() - t0:.1f}s"
            )
        except Exception as e:  # degraded boot should still serve
            print(f"query warmup skipped: {e}")
    serve(registry if registry is not None else manager,
          host=args.host, port=args.port)


if __name__ == "__main__":
    main()
