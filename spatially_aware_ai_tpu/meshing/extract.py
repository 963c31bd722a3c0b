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

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sampling import trilinear_sample_flat
from .marching import marching_tetrahedra
from .ply import read_ply

# Vertex counts and grid dims vary per scan; on the TPU sandbox every new
# eager-op shape costs a serialized remote compile, so vertex sampling runs
# through ONE jitted flat-buffer program keyed on bucketed sizes only.
VERT_BUCKET = 16384
FLAT_BUCKET = 65536

_sample_flat_jit = jax.jit(
    trilinear_sample_flat, static_argnames=("mode",)
)


def _bucket_flat(arr):
    """Pad a flat [n, C] array up to a FLAT_BUCKET multiple. Host arrays pad
    host-side (no device compile); device arrays are assumed to already be
    bucket-padded by the fusion pipeline (create_grid pad_to)."""
    if isinstance(arr, np.ndarray):
        n = arr.shape[0]
        nb = -(-n // FLAT_BUCKET) * FLAT_BUCKET
        if nb != n:
            arr = np.pad(arr, ((0, nb - n),) + ((0, 0),) * (arr.ndim - 1))
        return jnp.asarray(arr)
    return arr


def _sample_verts(flat, nvox, coords_padded, mode, n_real):
    out = _sample_flat_jit(
        _bucket_flat(flat), jnp.asarray(nvox, jnp.int32), coords_padded, mode
    )
    return np.asarray(out)[:n_real]


def warm_vertex_samplers(flat_rows_device: int, flat_rows_host: int,
                         feat_dim: int):
    """Compile (or load from the persistent cache) every vertex-sampler
    executable extract_mesh will need for a grid of the given padded sizes,
    ahead of the first real extraction.

    On this TPU sandbox each new-shape program costs a serialized
    remote-compile(-cache-load) of seconds; a live session knows its grid
    shape from the FIRST integrated chunk but only runs extract_mesh at
    live_end — warming here moves those loads off the end() latency path
    and overlaps them with the user's scanning time (r2 VERDICT next #7).

    flat_rows_device: padded rows of the device-resident feature buffer
    (the grid's pad_to size); flat_rows_host: FLAT_BUCKET-padded rows of
    the host-side rgb/obj/seg arrays (ceil(prod(nvox)/FLAT_BUCKET) *
    FLAT_BUCKET). Warms the first VERT_BUCKET coordinate bucket; larger
    scenes pay one more compile for their bigger vertex bucket."""
    import jax.numpy as jnp

    coords = jnp.full((VERT_BUCKET, 3), -10.0, jnp.float32)
    nvox = jnp.asarray([2, 2, 2], jnp.int32)
    outs = []
    for n, C, mode in [
        (flat_rows_device, feat_dim, "bilinear"),  # clip feats (device)
        (flat_rows_host, 3, "bilinear"),           # rgb
        (flat_rows_host, 1, "nearest"),            # obj idx
        (flat_rows_host, 3, "nearest"),            # seg colors
    ]:
        outs.append(
            _sample_flat_jit(jnp.zeros((n, C), jnp.float32), nvox, coords,
                             mode)
        )
    # force completion (scalar readbacks; block_until_ready is unreliable
    # over this tunnel per CLAUDE.md)
    for o in outs:
        float(o[0, 0])


def extract_surface(vol, level: float = 0.0, method: Optional[str] = None):
    """Isosurface extraction dispatch.

    method: "mc" (classic table-based marching cubes, the default — same
    algorithm family as the reference's skimage call, clipfusion.py:727,
    and ~3x fewer triangles than tetrahedra for the same grid, measured in
    benchmarks/bench_mesh.py) or "mt" (marching tetrahedra). Overridable
    via SAI_MESH_EXTRACTOR. Each method prefers its native C++ extractor
    and falls back to the vectorized numpy implementation (identical
    geometry either way)."""
    import os

    method = method or os.environ.get("SAI_MESH_EXTRACTOR", "mc")
    if method not in ("mc", "mt"):
        raise ValueError(f"unknown mesh extractor {method!r}")
    try:
        from ..native import marching_cubes_native, marching_tetrahedra_native

        native_fn = (marching_cubes_native if method == "mc"
                     else marching_tetrahedra_native)
        out = native_fn(vol, level)
        if out is not None:
            return out
    except Exception:
        pass
    if method == "mc":
        from .marching import marching_cubes

        return marching_cubes(vol, level)
    return marching_tetrahedra(vol, level)


def run_marching_tetrahedra(vol, level: float = 0.0):
    """Back-compat alias for the pre-MC dispatch: forces method="mt"."""
    return extract_surface(vol, level, method="mt")


def extract_mesh(
    grid_values: Dict[str, np.ndarray],
    nvox,
    origin,
    voxel_size: float,
    voxel_obj_idx: Optional[np.ndarray] = None,
    segmentation_color: Optional[np.ndarray] = None,
    feats_on_device: bool = False,
):
    """grid_values: output of grid.finalize_grid (flat [N, ...] arrays).

    Returns a dict with verts_world [V, 3], faces [F, 3], colors [V, 3],
    clip_feats [V, C], and (when inputs given) obj_idx [V], seg_colors [V, 3].

    feats_on_device=True keeps "clip_feats" as the DEVICE array, bucket-
    padded to [Vb >= V, C] (rows past V are zeros): the [V, 512] feature
    block is by far the largest vertex attribute (~100+ MB at 50K verts) and
    the scan->queryable path consumes it on device (query matmuls), so
    reading it back here only to re-upload would put two large transfers on
    the critical path. Persistence slices np.asarray(...)[:V] on the async
    writer thread.
    """
    nvox = tuple(int(v) for v in np.asarray(nvox).reshape(3))
    tsdf = np.asarray(grid_values["tsdf"], np.float32).reshape(nvox).copy()
    weight = np.asarray(grid_values["weight"]).reshape(nvox)
    tsdf[weight == 0] = np.nan

    verts, faces = extract_surface(tsdf, level=0.0)

    # pad vertex coords to a bucket, host-side, with -1 (out-of-bounds ->
    # zeros, sliced away); all samplers then share bucket-stable jits
    n_real = len(verts)
    vb = max(VERT_BUCKET, -(-n_real // VERT_BUCKET) * VERT_BUCKET)
    coords_p = np.full((vb, 3), -10.0, np.float32)
    coords_p[:n_real] = verts
    coords_p = jnp.asarray(coords_p)

    def to_flat(arr, C):
        """Host arrays -> [n, C] float32 numpy (padded later host-side);
        device arrays pass through (already flat + bucket-padded)."""
        if isinstance(arr, np.ndarray):
            return np.asarray(arr, np.float32).reshape(-1, C)
        return arr.reshape(-1, C) if arr.ndim != 2 else arr

    colors = np.clip(
        _sample_verts(to_flat(grid_values["rgb"], 3), nvox, coords_p,
                      "bilinear", n_real),
        0.0, 1.0,
    )
    feat = grid_values["feat"]
    feat_dim = feat.shape[-1] if feat.ndim > 1 else 1
    if feats_on_device:
        clip_feats = _sample_flat_jit(
            _bucket_flat(to_flat(feat, feat_dim)),
            jnp.asarray(nvox, jnp.int32), coords_p, "bilinear",
        )  # [vb, C] device; padded rows sample at -10 -> zeros
    else:
        clip_feats = _sample_verts(
            to_flat(feat, feat_dim), nvox, coords_p, "bilinear", n_real
        )

    out = {
        "verts_world": verts * voxel_size + np.asarray(origin, np.float32),
        "verts_voxel": verts,
        "faces": faces,
        "colors": colors,
        "clip_feats": clip_feats,
    }
    if voxel_obj_idx is not None:
        obj_flat = np.asarray(voxel_obj_idx, np.float32).reshape(-1, 1)
        out["obj_idx"] = _sample_verts(
            obj_flat, nvox, coords_p, "nearest", n_real
        )[:, 0].astype(np.int32)
    if segmentation_color is not None:
        seg_flat = np.asarray(segmentation_color, np.float32).reshape(-1, 3)
        out["seg_colors"] = np.clip(
            _sample_verts(seg_flat, nvox, coords_p, "nearest", n_real),
            0.0, 1.0,
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


def extract_meshes_by_object(vertices, faces, colors, vertex_obj_idx,
                             obj_ids):
    """Grouped extract_mesh_by_object for MANY ids in one pass.

    Identical per-object outputs (same vertex order, same face reindexing
    — reindex-by-rank-among-same-id equals the per-call cumsum because
    the stable sort preserves original vertex order), but O(V log V + F +
    outputs) total instead of O(len(obj_ids) * (V + F)): the per-object
    loop was ~0.8 s of the ~2.2 s post-scan host phase at 200 objects /
    195K faces. Returns {obj_id: (verts, faces, colors)} for every
    requested id (empty arrays when the id owns nothing)."""
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    colors = np.asarray(colors)
    vox = np.asarray(vertex_obj_idx)

    # rank of each vertex among vertices of ITS id, in original order
    sort_idx = np.argsort(vox, kind="stable")
    sorted_vox = vox[sort_idx]
    group_start = np.searchsorted(sorted_vox, sorted_vox, side="left")
    ranks = np.empty(len(vox), np.int64)
    ranks[sort_idx] = np.arange(len(vox)) - group_start

    # a face belongs to id X iff all three vertices do; group the valid
    # faces by id once (stable sort keeps each object's original face
    # order, like the per-call boolean filter)
    f0 = vox[faces[:, 0]]
    same = (vox[faces[:, 1]] == f0) & (vox[faces[:, 2]] == f0)
    vfaces = faces[same]
    vf0 = f0[same]
    forder = np.argsort(vf0, kind="stable")
    vf_sorted = vf0[forder]
    vfaces = vfaces[forder]

    out = {}
    for oid in obj_ids:
        lo = np.searchsorted(sorted_vox, oid, side="left")
        hi = np.searchsorted(sorted_vox, oid, side="right")
        # stable argsort keeps equal keys in original order -> already
        # the per-call vertex order
        vsel = sort_idx[lo:hi]
        flo = np.searchsorted(vf_sorted, oid, side="left")
        fhi = np.searchsorted(vf_sorted, oid, side="right")
        out[oid] = (vertices[vsel], ranks[vfaces[flo:fhi]], colors[vsel])
    return out


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
