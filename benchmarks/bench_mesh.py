"""Mesh-extraction benchmark: marching cubes vs marching tetrahedra, numpy
vs native C++, at the reference's two measured grid scales
(voxel_grid_compare.md: 0.04 m -> (57,56,55), 0.02 m -> (127,104,116)).

The MC-vs-MT A/B (VERDICT r2 weak #4) reports vert/face counts, surface
RMS error against the analytic sphere, wall time, and — because mesh size
feeds straight into the Unity JSON payload and the vertex-bucketed query
program — the estimated mesh_to_json payload bytes.

Prints one JSON line per (grid, method).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from spatially_aware_ai_tpu import native
from spatially_aware_ai_tpu.meshing.marching import (
    marching_cubes,
    marching_tetrahedra,
)


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
        c = (np.array(shape) - 1) / 2.0
        true_r = min(shape) * 0.4

        for method, np_fn, nat_fn in [
            ("mc", marching_cubes, native.marching_cubes_native),
            ("mt", marching_tetrahedra, native.marching_tetrahedra_native),
        ]:
            t0 = time.perf_counter()
            v_np, f_np = np_fn(vol)
            t_numpy = time.perf_counter() - t0

            t_native = None
            if native.native_available():
                t0 = time.perf_counter()
                out = nat_fn(vol)
                t_native = time.perf_counter() - t0
                assert out is not None and len(out[0]) == len(v_np)

            r = np.linalg.norm(v_np - c, axis=-1)
            rms = float(np.sqrt(np.mean((r - true_r) ** 2)))
            # mesh_to_json: ~3 floats/vert + 3 ints/face + 3 colors/vert,
            # ~8 chars per number over HTTP
            payload_mb = (len(v_np) * 6 + len(f_np) * 3) * 8 / 1e6
            print(
                json.dumps(
                    {
                        "metric": "mesh_extraction",
                        "method": method,
                        "grid": list(shape),
                        "verts": int(len(v_np)),
                        "faces": int(len(f_np)),
                        "surface_rms_vox": round(rms, 4),
                        "json_payload_mb_est": round(payload_mb, 2),
                        "numpy_s": round(t_numpy, 4),
                        "native_s": round(t_native, 4) if t_native else None,
                        "speedup": (
                            round(t_numpy / t_native, 1) if t_native else None
                        ),
                    }
                )
            )


if __name__ == "__main__":
    main()
