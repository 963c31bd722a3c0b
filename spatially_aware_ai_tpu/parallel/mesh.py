"""Device-mesh helpers.

The workload's natural parallel axes (SURVEY.md §2.2):
- frames / patches are embarrassingly data-parallel for CLIP + kMaX inference
- the voxel grid shards over its flat voxel axis for fusion

Both map onto a single 1D mesh axis "d" over the chips of one host
(v5e-8 ICI): inference input is frame-sharded, the grid is voxel-sharded,
and XLA GSPMD inserts the (tiny) all-gather of patch-feature images between
the stages. No tensor/pipeline parallelism is needed — both towers fit
comfortably in one chip's HBM.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXIS = "d"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def grid_sharding(mesh: Mesh, grid, axis: str = AXIS):
    """Shardings pytree for a FusionGrid: flat voxel axis sharded, origin
    replicated."""

    def leaf_spec(x):
        if x.ndim >= 1 and x.shape[0] > 3:  # voxel-axis leaves
            return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_spec, grid)


def frame_sharding(mesh: Mesh, frames, axis: str = AXIS):
    """Shardings pytree for a FrameBatch: leading frame axis sharded."""

    def leaf_spec(x):
        return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))

    return jax.tree.map(leaf_spec, frames)
