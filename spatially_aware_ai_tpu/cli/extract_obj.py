"""Per-object mesh extraction CLI — extract_obj_mesh.py parity: split a fused
scene mesh into one PLY per object id from vertex_obj_idx.npy
(reference extract_obj_mesh.py:39-58).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from ..meshing.extract import extract_meshes_by_object
    from ..meshing.ply import read_ply, write_ply

    parser = argparse.ArgumentParser()
    parser.add_argument("input_dir", help="scene version dir (vNN)")
    parser.add_argument("--out-dir", default=None)
    args = parser.parse_args(argv)

    out_dir = args.out_dir or os.path.join(
        args.input_dir, "object_meshes_vis"
    )
    os.makedirs(out_dir, exist_ok=True)

    obj_idx = np.load(os.path.join(args.input_dir, "vertex_obj_idx.npy"))
    verts, faces, colors = read_ply(
        os.path.join(args.input_dir, "mesh_rgb.ply")
    )
    if colors is None:
        colors = np.zeros((len(verts), 3), np.float32)

    unique_objects = np.unique(obj_idx)
    print(f"unique object ids: {unique_objects}")
    per_obj = extract_meshes_by_object(  # grouped: one mesh sort, not
        verts, faces, colors[:, :3], obj_idx,  # a full scan per object
        [int(i) for i in unique_objects],
    )
    for obj_id in unique_objects:
        ov, of, oc = per_obj[int(obj_id)]
        if len(of) == 0:
            continue
        out = os.path.join(out_dir, f"object_{obj_id}_mesh.ply")
        write_ply(out, ov, of, oc)
        print(f"saved {out} ({len(ov)} verts)")


if __name__ == "__main__":
    main()
