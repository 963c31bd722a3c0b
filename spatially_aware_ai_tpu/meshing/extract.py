"""Mesh extraction from a finalized FusionGrid + vertex attribute sampling.

Behavioral contract from the reference (clipfusion.py:723-763,
clip_seem_fusion.py:824-888):
- tsdf is NaN where the feature weight is 0, marching cubes at level 0,
  geometry touching NaN voxels dropped, vertices compacted
- vertex rgb + clip features sampled trilinearly at vertex locations;
  object index + segmentation colors sampled nearest
- verts_world = verts * voxel_size + origin
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.sampling import trilinear_sample
from .marching import marching_tetrahedra
from .ply import read_ply


def run_marching_tetrahedra(vol, level: float = 0.0):
    """Dispatch: native C++ extractor when available, vectorized numpy
    otherwise (identical geometry either way)."""
    try:
        from ..native import marching_tetrahedra_native

        out = marching_tetrahedra_native(vol, level)
        if out is not None:
            return out
    except Exception:
        pass
    return marching_tetrahedra(vol, level)


def extract_mesh(
    grid_values: Dict[str, np.ndarray],
    nvox,
    origin,
    voxel_size: float,
    voxel_obj_idx: Optional[np.ndarray] = None,
    segmentation_color: Optional[np.ndarray] = None,
):
    """grid_values: output of grid.finalize_grid (flat [N, ...] arrays).

    Returns a dict with verts_world [V, 3], faces [F, 3], colors [V, 3],
    clip_feats [V, C], and (when inputs given) obj_idx [V], seg_colors [V, 3].
    """
    nvox = tuple(int(v) for v in np.asarray(nvox).reshape(3))
    tsdf = np.asarray(grid_values["tsdf"], np.float32).reshape(nvox).copy()
    weight = np.asarray(grid_values["weight"]).reshape(nvox)
    tsdf[weight == 0] = np.nan

    verts, faces = run_marching_tetrahedra(tsdf, level=0.0)

    coords = jnp.asarray(verts)  # voxel-index space
    rgb_vol = jnp.asarray(grid_values["rgb"], jnp.float32).reshape(*nvox, 3)
    feat_vol = jnp.asarray(grid_values["feat"], jnp.float32).reshape(
        *nvox, -1
    )
    colors = np.clip(np.asarray(trilinear_sample(rgb_vol, coords)), 0.0, 1.0)
    clip_feats = np.asarray(trilinear_sample(feat_vol, coords))

    out = {
        "verts_world": verts * voxel_size + np.asarray(origin, np.float32),
        "verts_voxel": verts,
        "faces": faces,
        "colors": colors,
        "clip_feats": clip_feats,
    }
    if voxel_obj_idx is not None:
        obj_vol = jnp.asarray(voxel_obj_idx, jnp.float32).reshape(*nvox, 1)
        out["obj_idx"] = (
            np.asarray(trilinear_sample(obj_vol, coords, mode="nearest"))[:, 0]
            .astype(np.int32)
        )
    if segmentation_color is not None:
        seg_vol = jnp.asarray(segmentation_color, jnp.float32).reshape(*nvox, 3)
        out["seg_colors"] = np.clip(
            np.asarray(trilinear_sample(seg_vol, coords, mode="nearest")), 0.0, 1.0
        )
    return out


def extract_mesh_by_object(vertices, faces, colors, vertex_obj_idx, obj_idx):
    """Vertex-subset + face-filter + reindex for one object id
    (reference handy_utils.py:585-611, vectorized reindex)."""
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    colors = np.asarray(colors)
    vertex_obj_idx = np.asarray(vertex_obj_idx)

    keep_mask = vertex_obj_idx == obj_idx
    object_indices = np.nonzero(keep_mask)[0]
    object_vertices = vertices[object_indices]
    object_colors = colors[object_indices]

    face_keep = keep_mask[faces].all(axis=1)
    object_faces = faces[face_keep]

    reindex = np.cumsum(keep_mask) - 1
    object_faces = reindex[object_faces]
    return object_vertices, object_faces, object_colors


def mesh_to_json(mesh_path: str) -> dict:
    """PLY -> {vertices, faces, colors} JSON-serializable dict
    (reference handy_utils.py:224-241)."""
    verts, faces, colors = read_ply(mesh_path)
    return {
        "vertices": verts.tolist(),
        "faces": faces.tolist(),
        "colors": (colors[:, :3] if colors is not None else
                   np.zeros((len(verts), 3), np.float32)).tolist(),
    }
