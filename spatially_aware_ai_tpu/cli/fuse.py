"""Batch fusion CLI — the `python clipfusion.py <scan_dir> <output_dir>`
equivalent (reference clipfusion.py:1182-1250): dataset autodetected from the
path, per-dataset patch/stride/trunc defaults, CLIP-only fusion (no panoptic
labels), writes mesh_rgb.ply + vertex_clip_feats.npy + config.yml per scan.

Usage:
  python -m spatially_aware_ai_tpu.cli.fuse SCAN_DIR OUTPUT_DIR
      [--dataset NAME] [--voxel-size 0.04] [--clip-patch-size N]
      [--clip-patch-stride N] [--scan-name NAME] [--views-limit N]
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

# defaults per dataset (reference clipfusion.py:1196-1218 + server values for
# iphone, app_unity.py:19-23)
DATASET_DEFAULTS = {
    "scannet": dict(clip_patch_size=160, clip_patch_stride=80, trunc_vox=3),
    "hypersim": dict(clip_patch_size=256, clip_patch_stride=128, trunc_vox=2),
    "lerf": dict(clip_patch_size=64, clip_patch_stride=32, trunc_vox=3),
    "iphone": dict(clip_patch_size=256, clip_patch_stride=128, trunc_vox=3),
    "synthetic": dict(clip_patch_size=40, clip_patch_stride=20, trunc_vox=2),
}


def detect_dataset(path: str) -> str:
    for name in ("scannet", "hypersim", "lerf", "iphone", "synthetic"):
        if name in path:
            return name
    raise SystemExit("could not identify dataset from path; pass --dataset")


def run_one(scan_dir: str, output_dir: str, config: dict, engine,
            frame_chunk: int, views_limit: int,
            incremental_meshes: bool = False):
    import yaml

    from ..data import make_dataset
    from ..meshing.ply import write_ply
    from ..pipeline import FusionConfig, fuse_scan

    scan_name = os.path.basename(os.path.normpath(scan_dir))
    outdir = os.path.join(output_dir, scan_name)
    os.makedirs(outdir, exist_ok=True)
    from ..utils.atomic import atomic_path

    with atomic_path(os.path.join(outdir, "config.yml")) as tmp, \
            open(tmp, "w") as f:
        yaml.safe_dump(config, f)

    dataset = make_dataset(config["dataset"], scan_dir, views_limit)
    fusion_cfg = FusionConfig(
        voxel_size=config["voxel_size"],
        trunc_vox=config["trunc_vox"],
        clip_patch_size=config["clip_patch_size"],
        clip_patch_stride=config["clip_patch_stride"],
        frame_chunk=frame_chunk,
        with_labels=False,
        rgb_mode="nearest",  # ClipFusion's (batch CLI) rgb sampling mode
        integrator=config.get("integrator"),
    )
    on_chunk = None
    if incremental_meshes:
        from ..grid.voxel_grid import finalize_grid
        from ..meshing.extract import extract_mesh
        import numpy as _np

        mesh_dir = os.path.join(outdir, "meshes")
        os.makedirs(mesh_dir, exist_ok=True)

        def on_chunk(grid, frame_idx):
            n = int(_np.prod(grid.nvox))
            vals = {
                k: _np.asarray(v)[:n] for k, v in finalize_grid(grid).items()
            }
            m = extract_mesh(vals, grid.nvox, _np.asarray(grid.origin),
                             grid.voxel_size)
            write_ply(
                os.path.join(mesh_dir, f"{frame_idx:04d}.ply"),
                m["verts_world"], m["faces"], m["colors"],
            )

    result = fuse_scan(dataset, engine, fusion_cfg,
                       progress=lambda s: print(f"  {s}"),
                       on_chunk=on_chunk)
    mesh = result.extract_mesh()
    write_ply(
        os.path.join(outdir, "mesh_rgb.ply"),
        mesh["verts_world"], mesh["faces"], mesh["colors"],
    )
    from ..utils.atomic import atomic_save_npy

    atomic_save_npy(os.path.join(outdir, "vertex_clip_feats.npy"),
                    mesh["clip_feats"])
    print(
        f"{scan_name}: {len(mesh['verts_world'])} verts, "
        f"nvox={result.nvox}, timings={json.dumps(result.timings)}"
    )
    return outdir


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("scan_dir")
    parser.add_argument("output_dir")
    parser.add_argument("--dataset")
    parser.add_argument("--notes")
    parser.add_argument("--clip-model", default="ViT-B-32-quickgelu")
    parser.add_argument("--clip-pretraining", default="laion400m_e32")
    parser.add_argument("--clip-checkpoint",
                        default=os.environ.get("SAI_CLIP_CHECKPOINT"))
    parser.add_argument("--voxel-size", type=float, default=0.04)
    parser.add_argument("--scan-name")
    parser.add_argument("--clip-patch-size", type=int)
    parser.add_argument("--clip-patch-stride", type=int)
    parser.add_argument("--frame-chunk", type=int, default=8)
    parser.add_argument("--views-limit", type=int, default=0)
    parser.add_argument("--tiny-clip", action="store_true",
                        help="small random CLIP (tests / smoke runs)")
    parser.add_argument("--incremental-meshes", action="store_true",
                        help="dump a mesh PLY after every chunk")
    parser.add_argument("--integrator",
                        choices=["scan", "einsum", "pallas", "sparse"],
                        help="grid integrator override (default: auto — "
                             "sparse on TPU, scan elsewhere)")
    parser.add_argument("--profile-dir",
                        help="write a jax.profiler device trace here")
    args = parser.parse_args(argv)

    dataset_name = args.dataset or detect_dataset(args.scan_dir)
    defaults = DATASET_DEFAULTS[dataset_name]
    patch_size = args.clip_patch_size or defaults["clip_patch_size"]
    patch_stride = args.clip_patch_stride or defaults["clip_patch_stride"]

    from ..models.clip.engine import ClipEngine

    if args.tiny_clip:
        engine = ClipEngine.tiny()
    elif args.clip_checkpoint:
        engine = ClipEngine.from_checkpoint(args.clip_checkpoint)
    else:
        print("warning: no CLIP checkpoint; using random weights")
        engine = ClipEngine.random()

    scan_dirs = sorted(
        d for d in glob.glob(os.path.join(args.scan_dir, "*"))
        if os.path.isdir(d)
    ) or [args.scan_dir]
    if args.scan_name:
        scan_dirs = [
            d for d in scan_dirs if os.path.basename(d) == args.scan_name
        ]
        if not scan_dirs:
            raise SystemExit(f"couldn't find a scan called {args.scan_name}")

    config = {
        "clip_model": args.clip_model,
        "clip_pretraining": args.clip_pretraining,
        "clip_patch_size": patch_size,
        "clip_patch_stride": patch_stride,
        "trunc_vox": defaults["trunc_vox"],
        "voxel_size": args.voxel_size,
        "dataset": dataset_name,
        "integrator": args.integrator,
    }
    if args.notes:
        config["notes"] = args.notes
    print(f"dataset: {dataset_name}, {len(scan_dirs)} scan(s)")

    import contextlib

    from ..utils.profiling import trace_to

    ctx = trace_to(args.profile_dir) if args.profile_dir else (
        contextlib.nullcontext()
    )
    with ctx:
        for scan_dir in scan_dirs:
            run_one(scan_dir, args.output_dir, config, engine,
                    args.frame_chunk, args.views_limit,
                    incremental_meshes=args.incremental_meshes)


if __name__ == "__main__":
    main()
