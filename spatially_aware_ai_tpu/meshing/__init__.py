from .marching import marching_cubes, marching_tetrahedra
from .ply import write_ply, read_ply
from .extract import (
    extract_mesh,
    extract_mesh_by_object,
    extract_surface,
    mesh_to_json,
)
