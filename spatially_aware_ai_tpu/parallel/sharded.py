"""Multi-chip fusion: voxel-sharded integration + frame-parallel inference.

Two composable mechanisms:

1. `integrate_frames_sharded` — explicit shard_map: every device owns a
   contiguous shard of the flat voxel buffers and integrates ALL frames into
   its shard. Sum-form accumulators make this embarrassingly parallel: there
   are ZERO collectives in the fusion hot loop (the reference's sequential
   read-modify-write could not be distributed at all, SURVEY.md §2.2).

2. `make_sharded_fusion_step` — one jitted GSPMD program: CLIP patch
   encoding with the frame batch sharded over devices, feature images
   all-gathered by XLA (they are tiny), then voxel-sharded integration.
   This is the "pick a mesh, annotate shardings, let XLA insert collectives"
   pattern.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..grid.fusion import integrate_frames_impl
from ..grid.voxel_grid import FrameBatch, FusionGrid
from .mesh import AXIS, grid_sharding


def shard_grid(mesh, grid: FusionGrid, axis: str = AXIS) -> FusionGrid:
    """Place a FusionGrid with voxel leaves sharded over the mesh. The flat
    buffer length must be divisible by the axis size (use
    create_grid(pad_to=n_devices))."""
    return jax.device_put(grid, grid_sharding(mesh, grid, axis))


def _grid_specs(grid: FusionGrid, axis: str):
    def leaf_spec(x):
        if x.ndim >= 1 and x.shape[0] > 3:
            return P(axis, *([None] * (x.ndim - 1)))
        return P()

    return jax.tree.map(leaf_spec, grid)


def _replicated_specs(tree):
    return jax.tree.map(lambda x: P(), tree)


def make_sharded_integrate(
    mesh, grid: FusionGrid, frames: FrameBatch, rgb_mode: str = "bilinear",
    axis: str = AXIS, integrator: str = "scan", pallas_tile: int = 512,
    pallas_interpret: bool = False, label_vote_mode: str = "uniform",
    capacity: int = 0, brick_size: int = 128, brick_capacity: int = 0,
    with_count: bool = False,
):
    """Build ONE jitted shard_map fusion step (grid, frames) -> grid for the
    given example structures. Build it once per scan and call it per chunk —
    `integrate_frames_sharded` constructs (and re-jits) the program on every
    call, which is fine for tests but pays a trace per chunk in a pipeline
    loop.

    integrator "sparse"/"brick" runs the compaction PER SHARD (each device
    compacts its own voxel slice via voxel_start; slot budgets `capacity` /
    `brick_capacity` are per-shard static sizes, 0 = the integrators'
    defaults scaled to the shard). with_count=True (sparse/brick only)
    additionally returns the PER-SHARD counts as [n_dev] arrays —
    (grid, vox_counts) for sparse, (grid, brick_counts, vox_counts) for
    brick — the feedback for adaptive budget sizing (observe the max)."""
    n_dev = mesh.shape[axis]
    n_local = grid.tsdf_sum.shape[0] // n_dev
    if grid.tsdf_sum.shape[0] % n_dev != 0:
        raise ValueError(
            f"grid size {grid.tsdf_sum.shape[0]} not divisible by mesh axis "
            f"{n_dev}; create the grid with pad_to={n_dev}"
        )
    if with_count and integrator not in ("sparse", "brick"):
        raise ValueError(f"with_count unsupported for {integrator!r}")

    def body(g, f):
        start = jax.lax.axis_index(axis) * n_local
        if integrator == "sparse":
            from ..grid.fusion import integrate_frames_sparse_impl

            out = integrate_frames_sparse_impl(
                g, f, rgb_mode=rgb_mode, capacity=capacity,
                label_vote_mode=label_vote_mode, voxel_start=start,
                with_count=with_count,
            )
            if with_count:
                g, cnt = out
                return g, cnt.reshape(1)
            return out
        if integrator == "brick":
            from ..grid.brick import integrate_frames_brick_impl

            out = integrate_frames_brick_impl(
                g, f, rgb_mode=rgb_mode, brick_size=brick_size,
                brick_capacity=brick_capacity, capacity=capacity,
                label_vote_mode=label_vote_mode, voxel_start=start,
                with_count=with_count,
            )
            if with_count:
                g, nb, cnt = out
                return g, nb.reshape(1), cnt.reshape(1)
            return out
        if integrator in ("pallas", "einsum"):
            from ..grid.fusion import integrate_frames_hybrid_impl

            return integrate_frames_hybrid_impl(
                g, f, rgb_mode=rgb_mode, voxel_start=start,
                tile=pallas_tile, interpret=pallas_interpret,
                splat=integrator, label_vote_mode=label_vote_mode,
            )
        return integrate_frames_impl(
            g, f, rgb_mode=rgb_mode, voxel_start=start,
            label_vote_mode=label_vote_mode,
        )

    out_specs = _grid_specs(grid, axis)
    if with_count:
        n_counts = 2 if integrator == "brick" else 1
        out_specs = (out_specs, *([P(axis)] * n_counts))

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(_grid_specs(grid, axis), _replicated_specs(frames)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def integrate_frames_sharded(
    mesh, grid: FusionGrid, frames: FrameBatch, rgb_mode: str = "bilinear",
    axis: str = AXIS, integrator: str = "scan", pallas_tile: int = 512,
    pallas_interpret: bool = False, use_pallas: bool = False,
    label_vote_mode: str = "uniform",
) -> FusionGrid:
    """shard_map fusion: grid voxel-sharded, frames replicated, no comms.

    integrator: "scan" (reference-exact oracle), "einsum" (chunk-batched
    splat, the production fast path — each shard splats its local voxel
    slice), or "pallas" (fused kernel; local shard size must be a multiple
    of pallas_tile). `use_pallas=True` is a deprecated alias for
    integrator="pallas"."""
    if use_pallas:
        integrator = "pallas"
    fn = make_sharded_integrate(
        mesh, grid, frames, rgb_mode=rgb_mode, axis=axis,
        integrator=integrator, pallas_tile=pallas_tile,
        pallas_interpret=pallas_interpret, label_vote_mode=label_vote_mode,
    )
    return fn(grid, frames)


def make_sharded_fusion_step(
    mesh,
    encode_image_fn: Callable,
    patch_size: int,
    patch_stride: int,
    rgb_mode: str = "bilinear",
    axis: str = AXIS,
):
    """Build one jitted GSPMD step: (params, grid, frames) -> grid.

    frames.rgb etc. sharded over the frame axis; grid sharded over voxels;
    CLIP tiled inference runs data-parallel; XLA inserts the feature-image
    all-gather between the stages.
    """
    from ..models.clip.tiling import (
        OPENAI_CLIP_MEAN,
        OPENAI_CLIP_STD,
        get_patches,
    )

    def step(params, grid, frames: FrameBatch):
        rgb = jax.lax.with_sharding_constraint(
            frames.rgb, NamedSharding(mesh, P(axis, None, None, None))
        )
        normed = (rgb - jnp.asarray(OPENAI_CLIP_MEAN)) / jnp.asarray(
            OPENAI_CLIP_STD
        )
        patches = jax.vmap(
            lambda im: get_patches(im, patch_size, patch_stride)
        )(normed)  # [F, ny, nx, ps, ps, 3]
        F_, ny, nx = patches.shape[:3]
        flat = patches.reshape(F_ * ny * nx, patch_size, patch_size, 3)
        flat = jax.image.resize(
            flat, (flat.shape[0], 224, 224, 3), method="bilinear",
            antialias=False,
        )
        feats = encode_image_fn(params, flat)
        feat_imgs = feats.reshape(F_, ny, nx, -1)

        frames = frames.replace(feat_img=feat_imgs)
        grid = jax.lax.with_sharding_constraint(
            grid, grid_sharding(mesh, grid, axis)
        )
        from ..grid.fusion import integrate_frames_hybrid_impl

        # einsum chunk-batched splat: pure XLA, GSPMD partitions the
        # [N, F*P] x [F*P, C] contraction along the voxel sharding
        return integrate_frames_hybrid_impl(
            grid, frames, rgb_mode=rgb_mode, splat="einsum"
        )

    return jax.jit(step, donate_argnums=(1,))
