from .voxel_grid import FusionGrid, FrameBatch, finalize_grid
from .fusion import integrate_frames, voxel_world_coords
