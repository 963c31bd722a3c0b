from .geometry import (
    get_pix_vecs,
    project_points,
    world_to_cam,
    cam_to_world,
    flip_ruB_to_rdf,
    hypersim_M_to_K,
    scale_intrinsics,
)
from .sampling import (
    grid_sample_2d,
    grid_sample_3d,
    sample_image_at_uv,
    trilinear_sample,
)
from .bounds import backproject_sparse_cloud, percentile_bounds, compute_grid_dims
