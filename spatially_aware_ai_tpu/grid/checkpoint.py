"""Mid-scan checkpoint/resume for the fusion grid.

The reference only has artifact-level resume: a scan version is all-or-
nothing and a crash mid-fusion loses everything (SURVEY.md §5.4). Sum-form
accumulators make mid-scan snapshots trivial and exact: the grid pytree plus
the index of the next frame chunk fully determine the rest of the run, in
any frame order.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from .voxel_grid import FusionGrid


def save_grid(path: str, grid: FusionGrid, frames_done: int = 0):
    arrays = {
        "tsdf_sum": grid.tsdf_sum,
        "tsdf_w": grid.tsdf_w,
        "rgb_sum": grid.rgb_sum,
        "feat_sum": grid.feat_sum,
        "w": grid.w,
        "origin": grid.origin,
    }
    if grid.label_hist is not None:
        arrays["label_hist"] = grid.label_hist
    arrays = {k: np.asarray(jax.device_get(v)) for k, v in arrays.items()}
    arrays["nvox"] = np.asarray(jax.device_get(grid.nvox), np.int64)
    arrays["meta"] = np.asarray(
        [grid.voxel_size, grid.trunc, float(frames_done)], np.float64
    )
    from ..utils.atomic import atomic_savez

    atomic_savez(path, compressed=True, **arrays)


def load_grid(path: str) -> Tuple[FusionGrid, int]:
    """Returns (grid, frames_done)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        nvox = tuple(int(v) for v in z["nvox"])
        voxel_size, trunc, frames_done = z["meta"]
        grid = FusionGrid(
            tsdf_sum=jnp.asarray(z["tsdf_sum"]),
            tsdf_w=jnp.asarray(z["tsdf_w"]),
            rgb_sum=jnp.asarray(z["rgb_sum"]),
            feat_sum=jnp.asarray(z["feat_sum"]),
            w=jnp.asarray(z["w"]),
            label_hist=(
                jnp.asarray(z["label_hist"]) if "label_hist" in z else None
            ),
            origin=jnp.asarray(z["origin"]),
            nvox=jnp.asarray(nvox, jnp.int32),
            voxel_size=float(voxel_size),
            trunc=float(trunc),
        )
    return grid, int(frames_done)
