"""A/B probe: tile-DMA brick sampling (grid/pallas_tiledma.py) vs the XLA
gather floor, at the bench operating point (VERDICT r3 next #6).

Workload: the default full-bench geometry — 1024x768 depth+label images
(C=2), a 57x56x55 voxel grid in 8^3 bricks (392 bricks, 200K voxels), F=8
frames from the synthetic scene's camera orbit. Both paths sample the SAME
(voxel, frame) projections nearest-neighbor:

  A. XLA gather: sample_image_at_uv over the flat voxel set, per frame
     (exactly the production integrators' depth+label pass).
  B. tile_sample_nearest: per (brick, frame) DMA of an aligned image tile
     + one-hot row matmul (MXU) + one-hot column select (VPU).

Prints one JSON line per variant with ms/chunk and the tile-coverage
fraction (bricks whose footprint exceeded the static tile fall back to the
gather in production; their cost belongs to path A at the measured ratio).

Run on the TPU:  python benchmarks/probe_tiledma.py
  SAI_PROBE_TILE=128x256 / 256x256 / 64x128 ... sweeps the tile shape.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.core.sampling import sample_image_at_uv
    from spatially_aware_ai_tpu.data import SyntheticSceneDataset
    from spatially_aware_ai_tpu.grid.pallas_tiledma import (
        brick_tile_bboxes,
        brick_voxel_uv,
        in_image_mask,
        tile_sample_nearest,
    )

    REPS = max(1, int(os.environ.get("SAI_PROBE_REPS", "5") or 5))
    tile = os.environ.get("SAI_PROBE_TILE", "256x256")
    TH, TW = (int(v) for v in tile.split("x"))
    F = 8
    W, H = 1024, 768
    BRICK = 8
    nvox = (57, 56, 55)
    voxel = 0.04
    origin = np.array([-1.2, -0.7, -1.2], np.float32)

    ds = SyntheticSceneDataset(num_frames=F, width=W // 4, height=H // 4)
    depths = np.stack(
        [np.kron(ds[i].depth, np.ones((4, 4), np.float32)) for i in range(F)]
    )
    labels = np.stack(
        [np.kron(ds.render_labels(i), np.ones((4, 4), np.int32))
         for i in range(F)]
    ).astype(np.float32)
    poses, Ks = [], []
    for i in range(F):
        poses.append(ds[i].pose)
        K = ds[i].K.copy()
        K[0] *= 4
        K[1] *= 4
        Ks.append(K)

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    # brick-major voxel projections, shared with the parity test
    uv, z = brick_voxel_uv(nvox, origin, voxel, poses, Ks, brick=BRICK)
    NB, V = uv.shape[0], BRICK**3
    N = NB * V
    in_img = in_image_mask(uv, z, H, W)

    img = jnp.asarray(np.stack([depths, labels], 1))  # [F, 2, H, W]
    packed = jnp.asarray(
        np.stack([depths, labels], -1)
    )  # [F, H, W, 2] for the gather path
    uv_flat = jnp.asarray(uv.transpose(1, 0, 2, 3).reshape(F, N, 2))

    print(json.dumps({
        "device": str(jax.devices()[0]), "reps": REPS, "tile": [TH, TW],
        "bricks": NB, "voxels": N, "frames": F,
    }), flush=True)

    # --- A: the XLA gather (production depth+label pass) ---
    @jax.jit
    def gather_all(packed, uv_flat):
        def per_frame(c, f):
            s = sample_image_at_uv(packed[f], uv_flat[f], mode="nearest")
            return c + s.sum(), None
        return jax.lax.scan(
            per_frame, jnp.float32(0), jnp.arange(F)
        )[0]

    sync(gather_all(packed, uv_flat))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = gather_all(packed, uv_flat)
    sync(out)
    gather_ms = (time.perf_counter() - t0) / REPS * 1e3
    print(json.dumps({
        "variant": "xla_gather", "ms_per_chunk": round(gather_ms, 2),
        "ns_per_index": round(gather_ms * 1e6 / (N * F), 2),
    }), flush=True)

    # --- B: tile-DMA kernel ---
    bbox, fits = brick_tile_bboxes(
        jnp.asarray(uv), jnp.asarray(in_img), TH, TW, H, W
    )
    coverage = float(np.asarray(fits).mean())
    uv_cf = jnp.asarray(np.ascontiguousarray(uv.transpose(0, 1, 3, 2)))

    interp = jax.default_backend() != "tpu"  # CPU smoke runs use interpret

    @jax.jit
    def tiledma_all(img, uv_cf, bbox):
        samples, _ = tile_sample_nearest(
            img, uv_cf, bbox, tile_h=TH, tile_w=TW, interpret=interp
        )
        return samples.sum()

    sync(tiledma_all(img, uv_cf, bbox))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = tiledma_all(img, uv_cf, bbox)
    sync(out)
    tiledma_ms = (time.perf_counter() - t0) / REPS * 1e3
    print(json.dumps({
        "variant": "tile_dma", "ms_per_chunk": round(tiledma_ms, 2),
        "brick_tile_coverage": round(coverage, 4),
        "speedup_vs_gather": round(gather_ms / tiledma_ms, 2),
        "note": "production blend = coverage*tiledma + (1-coverage)*gather",
    }), flush=True)


if __name__ == "__main__":
    main()
