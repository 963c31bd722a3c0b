from .voxel_grid import FusionGrid, FrameBatch, create_grid, finalize_grid
from .fusion import (
    integrate_frames,
    integrate_frames_einsum,
    integrate_frames_pallas,
    voxel_world_coords,
)
from .brick import integrate_frames_brick
from .checkpoint import save_grid, load_grid
