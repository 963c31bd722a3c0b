"""Gather-cost microbench: is a mip-classified TSDF pass worth building?

The sparse integrator's phase 1 (grid/fusion.py:integrate_frames_sparse_impl)
does ONE dense packed depth+label gather per frame at N voxel indices — the
dominant integrate cost at fine grids (ROADMAP "brick-sparse free-space").
A mip-classified pass would replace it with (a) a gather from a tiny
depth min/max mip (classify voxels FREE / BEHIND / NEAR) + (b) a full-res
gather at only the NEAR subset. This bench measures whether (a) is actually
cheaper per index on this TPU, and what the projection matmul costs.

Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    H, W = 768, 1024
    MH, MW = H // 16, W // 16  # 48x64 = 3072-entry mip

    img = jnp.asarray(rng.normal(size=(H, W, 2)).astype(np.float32))
    mip = jnp.asarray(rng.normal(size=(MH, MW, 2)).astype(np.float32))

    def sync(x):
        return float(jnp.ravel(x)[0])

    @jax.jit
    def gather_full(idx):
        flat = img.reshape(-1, 2)
        return jnp.take(flat, idx, axis=0).sum(axis=0)

    @jax.jit
    def gather_mip(idx):
        flat = mip.reshape(-1, 2)
        return jnp.take(flat, idx, axis=0).sum(axis=0)

    @jax.jit
    def gather_mip_onehot(idx):
        # one-hot matmul formulation: [N, 3072] @ [3072, 2] on the MXU
        flat = mip.reshape(-1, 2)
        oh = jax.nn.one_hot(idx, MH * MW, dtype=jnp.bfloat16)
        return (oh @ flat.astype(jnp.bfloat16)).astype(jnp.float32).sum(axis=0)

    @jax.jit
    def project(xyz, pose, K):
        R = pose[:3, :3]
        t = pose[:3, 3]
        cam = (xyz - t) @ R
        uvz = cam @ K.T
        uv = uvz[:, :2] / jnp.maximum(uvz[:, 2:3], 1e-6)
        return uv.sum(axis=0) + uvz[:, 2].sum()

    reps = 20
    for N in [524_288, 1_572_864]:
        idx_full = jnp.asarray(
            rng.integers(0, H * W, size=N).astype(np.int32))
        idx_mip = jnp.asarray(
            rng.integers(0, MH * MW, size=N).astype(np.int32))
        # spatially-coherent indices (sorted) — does locality matter?
        idx_sorted = jnp.asarray(
            np.sort(rng.integers(0, H * W, size=N).astype(np.int32)))
        xyz = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
        pose = jnp.eye(4, dtype=jnp.float32)
        Kmat = jnp.asarray(
            np.array([[600, 0, 512], [0, 600, 384], [0, 0, 1]], np.float32))

        for name, fn, arg in [
            ("gather_full_random", gather_full, idx_full),
            ("gather_full_sorted", gather_full, idx_sorted),
            ("gather_mip", gather_mip, idx_mip),
            ("gather_mip_onehot", gather_mip_onehot, idx_mip),
            ("project_matmul", project, None),
        ]:
            if arg is None:
                sync(fn(xyz, pose, Kmat))
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(xyz, pose, Kmat)
                sync(out)
            else:
                sync(fn(arg))
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(arg)
                sync(out)
            ms = (time.perf_counter() - t0) / reps * 1e3
            print(json.dumps({"bench": name, "N": N,
                              "ms": round(ms, 3)}))


if __name__ == "__main__":
    main()
