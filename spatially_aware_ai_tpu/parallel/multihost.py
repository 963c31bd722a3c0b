"""Multi-host (DCN) fusion harness.

The single-host story (`parallel/sharded.py`) runs the voxel-sharded fusion
step over the chips of one host via shard_map — zero collectives in the hot
loop because the grid accumulators are sums. Scaling past one host only
changes WHERE the mesh devices live: a `jax.distributed` process group
builds one global mesh spanning every host's chips, the same shard_map
program runs unmodified, and the only cross-host traffic is whatever
reduction the caller asks for afterwards (here: grid checksums, psum'd over
DCN). The sharding code has no host-count assumptions (ROADMAP "multi-host
scaling"); this module proves it end-to-end on CPU.

Run one worker per "host" (the test launches two subprocesses, each given
4 virtual CPU devices, forming a global 8-device mesh):

    python -m spatially_aware_ai_tpu.parallel.multihost \
        --coordinator 127.0.0.1:9911 --num-processes 2 --process-id 0 \
        --out /tmp/mh0.json

Each worker builds identical deterministic synthetic frames, creates the
GLOBAL sharded grid via `jax.make_array_from_callback` (every process
provides only its addressable shards), runs `integrate_frames_sharded`
over the global mesh, and writes per-accumulator checksums. The launcher
compares them against a single-process oracle — bitwise-comparable math,
so tolerances are tight.

On real TPU pods the same code runs with `jax.distributed.initialize()`
(no args — the TPU runtime provides topology) and the mesh axes laid out
so fusion shards ride ICI while only checkpoint/eval reductions cross DCN.
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def _synthetic_inputs(feature_dim: int = 8):
    """Deterministic tiny scene: every process computes the SAME arrays."""
    rng = np.random.default_rng(7)
    F, H, W = 4, 24, 32
    ny = nx = 3
    depth = rng.uniform(0.5, 2.5, size=(F, H, W)).astype(np.float32)
    rgb = rng.uniform(size=(F, H, W, 3)).astype(np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    pose[:, 0, 3] = rng.uniform(-0.1, 0.1, size=F)
    K = np.tile(
        np.array(
            [[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32
        ),
        (F, 1, 1),
    )
    feat_img = rng.normal(size=(F, ny, nx, feature_dim)).astype(np.float32)
    labels = rng.integers(0, 5, size=(F, H, W)).astype(np.int32)
    return depth, rgb, pose, K, feat_img, labels


def build_batch(jnp, FrameBatch, feature_dim: int = 8):
    depth, rgb, pose, K, feat_img, labels = _synthetic_inputs(feature_dim)
    return FrameBatch(
        depth=jnp.asarray(depth),
        rgb=jnp.asarray(rgb),
        pose=jnp.asarray(pose),
        K=jnp.asarray(K),
        feat_img=jnp.asarray(feat_img),
        labels=jnp.asarray(labels),
        frame_valid=jnp.ones((depth.shape[0],), bool),
    )


GRID_KW = dict(
    origin=(-2.0, -2.0, 0.0),
    voxel_size=0.25,
    nvox=(16, 16, 8),
    trunc=0.5,
    feature_dim=8,
    with_labels=True,
    num_classes=8,
)


def checksums(grid) -> dict:
    """nansum-based: zero-weight voxels legitimately carry NaN in the
    rgb/feat accumulators (masked at finalize); the NaN COUNT is part of
    the checksum so masking differences can't hide."""
    import jax.numpy as jnp

    out = {}
    for name in ("tsdf_sum", "tsdf_w", "rgb_sum", "feat_sum", "w",
                 "label_hist"):
        v = getattr(grid, name)
        if v is None:
            continue
        v = v.astype(jnp.float32)
        out[name] = float(jnp.nansum(v))
        out[name + "_abs"] = float(jnp.nansum(jnp.abs(v)))
        out[name + "_nans"] = float(jnp.sum(jnp.isnan(v)))
    return out


def oracle_checksums() -> dict:
    """Single-process reference on the default (non-distributed) runtime —
    same einsum integrator as the workers (the scan integrator differs in
    which zero-weight voxels carry NaN, which the _nans checksum keys
    would flag as a false mismatch)."""
    import jax
    import jax.numpy as jnp

    from ..grid.fusion import integrate_frames_hybrid_impl
    from ..grid.voxel_grid import FrameBatch, create_grid

    grid = create_grid(pad_to=8, **GRID_KW)
    batch = build_batch(jnp, FrameBatch)
    fused = jax.jit(
        lambda g, f: integrate_frames_hybrid_impl(g, f, splat="einsum")
    )(grid, batch)
    return checksums(fused)


def _make_global(mesh, tree, specs):
    """Turn a pytree of host numpy/jnp arrays (identical on every process)
    into GLOBAL jax.Arrays with the given PartitionSpecs."""
    import jax
    from jax.sharding import NamedSharding

    def leaf(x, spec):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(leaf, tree, specs)


def run_worker(coordinator: str, num_processes: int, process_id: int,
               out_path: str):
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from ..grid.voxel_grid import FrameBatch, create_grid
    from .sharded import AXIS, _grid_specs, _replicated_specs, \
        integrate_frames_sharded

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), (AXIS,))

    grid = create_grid(pad_to=n_dev, **GRID_KW)
    batch = build_batch(jnp, FrameBatch)
    grid = _make_global(mesh, grid, _grid_specs(grid, AXIS))
    batch = _make_global(mesh, batch, _replicated_specs(batch))

    fused = integrate_frames_sharded(mesh, grid, batch, integrator="einsum")
    sums = checksums(fused)  # jnp.sum over sharded leaves => DCN psum
    sums["n_devices"] = n_dev
    sums["n_local_devices"] = len(jax.local_devices())
    sums["process_id"] = process_id
    with open(out_path + ".tmp", "w") as f:
        json.dump(sums, f)
    import os

    os.replace(out_path + ".tmp", out_path)
    jax.distributed.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    run_worker(args.coordinator, args.num_processes, args.process_id,
               args.out)


if __name__ == "__main__":
    main()
