"""Mesh-extraction benchmark: vectorized numpy marching tetrahedra vs the
native C++ extractor, at the reference's two measured grid scales
(voxel_grid_compare.md: 0.04 m -> (57,56,55), 0.02 m -> (127,104,116)).

Prints one JSON line per configuration.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from spatially_aware_ai_tpu import native
from spatially_aware_ai_tpu.meshing.marching import marching_tetrahedra


def sphere(shape, radius_frac=0.4):
    c = (np.array(shape) - 1) / 2.0
    idx = np.stack(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), axis=-1
    ).astype(np.float32)
    r = min(shape) * radius_frac
    return np.linalg.norm(idx - c, axis=-1) - r


def main():
    for shape in [(57, 56, 55), (127, 104, 116)]:
        vol = sphere(shape).astype(np.float32)
        # mask a shell as unobserved like a real scan
        vol[vol > min(shape) * 0.45] = np.nan

        t0 = time.perf_counter()
        v_np, f_np = marching_tetrahedra(vol)
        t_numpy = time.perf_counter() - t0

        t_native = None
        if native.native_available():
            t0 = time.perf_counter()
            out = native.marching_tetrahedra_native(vol)
            t_native = time.perf_counter() - t0
            assert out is not None and len(out[0]) == len(v_np)

        print(
            json.dumps(
                {
                    "metric": "mesh_extraction",
                    "grid": list(shape),
                    "verts": int(len(v_np)),
                    "faces": int(len(f_np)),
                    "numpy_s": round(t_numpy, 4),
                    "native_s": round(t_native, 4) if t_native else None,
                    "speedup": round(t_numpy / t_native, 1) if t_native else None,
                }
            )
        )


if __name__ == "__main__":
    main()
