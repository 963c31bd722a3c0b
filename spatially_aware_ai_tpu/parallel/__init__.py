from .mesh import make_mesh, grid_sharding, frame_sharding
from .sharded import (
    integrate_frames_sharded,
    make_sharded_fusion_step,
    shard_grid,
)
