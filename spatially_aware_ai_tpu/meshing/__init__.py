from .marching import marching_tetrahedra
from .ply import write_ply, read_ply
from .extract import extract_mesh, extract_mesh_by_object, mesh_to_json
