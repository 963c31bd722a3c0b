"""End-to-end scan fusion pipeline: frames -> bounds -> CLIP/panoptic
inference -> grid integration -> finalized voxel values (+ mesh on demand).

This is the TPU-native replacement for the reference's two fusion drivers
(`run_clipfusion` in clipfusion.py:1042-1179 and
`InSituManager.run_clipfusion` in clip_seem_fusion.py:247-437): frames are
processed in fixed-size chunks through one compiled integration executable,
model inference is batched, and the last partial chunk is masked instead of
recompiling.
"""
from __future__ import annotations

import dataclasses
import math
import os
import time
import warnings
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.bounds import (
    backproject_sparse_cloud,
    compute_grid_dims,
    percentile_bounds,
)
from .grid.fusion import (
    integrate_frames,
    integrate_frames_einsum,
    integrate_frames_pallas,
)
from .grid.voxel_grid import FrameBatch, FusionGrid, create_grid, finalize_grid
from .meshing.extract import extract_mesh
from .scene.colors import NULL_CLASS_ID, NUM_CLASSES_WITH_SPARE


# adaptive sparse-capacity controller constants (see fuse_scan): initial
# auto capacity and the bucket granularity growth rounds to (each bucket is
# one compiled executable, persistent-cached)
_SPARSE_CAP_START = 65536
_SPARSE_CAP_ROUND = 65536


class AdaptiveCap:
    """Chunk-over-chunk slot-budget controller shared by fuse_scan and the
    live session (manager/live.py). Observed counts are read two chunks
    behind — already computed on device, so the host readback never stalls
    the async dispatch pipeline. When a count crosses 75% of the budget,
    grow to 2x the count rounded up to `round_to` (each distinct budget is
    one compiled executable, persistent-cached), capped at `limit`.
    Undershooting is always exact (the integrators fall back in-jit), so
    growth lag is safe."""

    def __init__(self, start: int, round_to: int, limit: int):
        self.value = int(start)
        self.round_to = int(round_to)
        self.limit = int(limit)
        self._pending: list = []

    def observe(self, count):
        """Queue a (device scalar) count; returns the host count when a
        growth decision was just made, else None."""
        self._pending.append(count)
        if len(self._pending) > 2:
            c = int(np.asarray(self._pending.pop(0)))
            if c > self.value - self.value // 4:
                self.value = min(
                    -(-(2 * c) // self.round_to) * self.round_to,
                    self.limit,
                )
                return c
        return None

    @classmethod
    def for_sparse(cls, n_buf: int, config) -> "AdaptiveCap":
        """Near-surface voxel slot budget (fuse_scan AND live sessions use
        this one policy)."""
        return cls(
            config.sparse_capacity or min(
                max(1024, n_buf // 4), _SPARSE_CAP_START
            ),
            _SPARSE_CAP_ROUND, n_buf,
        )

    @classmethod
    def for_brick(cls, n_buf: int, config) -> "AdaptiveCap":
        """Active-brick slot budget, in brick units."""
        nb_total = -(-n_buf // config.brick_size)
        return cls(
            config.brick_capacity or min(
                max(64, nb_total // 4),
                max(64, _SPARSE_CAP_START // config.brick_size),
            ),
            max(64, _SPARSE_CAP_ROUND // config.brick_size), nb_total,
        )


def sharded_grid_bucket(bucket: int, n_devices: int, integrator: str,
                        pallas_tile: int) -> int:
    """Flat-buffer rounding multiple for a voxel-sharded grid: the buffer
    must split evenly over the mesh AND each per-device shard must keep the
    pallas tile alignment when the in-shard integrator is pallas. One
    helper shared by fuse_scan and the live session — lcm'ing n_dev and
    the tile separately does NOT guarantee per-shard alignment (e.g.
    bucket 1, 8 devices, tile 512 can yield 8640-row shards)."""
    return math.lcm(
        bucket,
        n_devices * (pallas_tile if integrator == "pallas" else 1),
    )


@dataclasses.dataclass
class FusionConfig:
    voxel_size: float = 0.04
    trunc_vox: float = 3.0
    clip_patch_size: int = 256
    clip_patch_stride: int = 128
    max_depth: float = 4.0
    frame_chunk: int = 8
    rgb_mode: str = "bilinear"  # ClipFusion used nearest; ClipSeemFusion bilinear
    with_labels: bool = False
    num_classes: int = NUM_CLASSES_WITH_SPARE
    # integrator: None = auto ("einsum" chunk-batched splat on TPU, "scan"
    # elsewhere); explicit: "scan" | "einsum" | "pallas" | "sparse" | "brick"
    # ("sparse" restricts rgb/feature/label work to near-surface voxels,
    # exact with dense fallback, see grid/fusion.py; "brick" additionally
    # frustum-culls the dense geometry/TSDF pass at brick granularity,
    # exact with in-jit fallbacks, see grid/brick.py)
    integrator: Optional[str] = None
    pallas_tile: int = 512
    # sparse integrator active-set slots: 0 = adaptive (start at
    # min(N//4, 64Ki), grow from observed per-chunk union counts); explicit
    # value = fixed. Overflow is exact either way (in-jit dense fallback).
    # The brick integrator uses this for its phase-2 voxel slots too.
    sparse_capacity: int = 0
    # brick integrator: flat-index brick granularity (tighter bricks cull
    # more; scatter stays contiguous per brick) and active-brick slots
    # (0 = adaptive from observed per-chunk frustum-brick counts)
    brick_size: int = 128
    brick_capacity: int = 0
    # multi-chip: voxel-shard the grid over all local devices and run the
    # shard_map fusion step (parallel/sharded.py — zero collectives in the
    # hot loop; every chip integrates all frames into its own voxel shard).
    # Opt-in: single-chip benches and CPU tests keep the unsharded paths.
    # Every integrator runs inside the shard (sparse/brick compact their
    # own voxel slice via voxel_start; slot budgets are static per shard —
    # set sparse_capacity/brick_capacity explicitly to tune, the adaptive
    # controller is single-device-only).
    shard_voxels: bool = False
    # round the flat voxel buffer up to this multiple so scans with similar
    # bounds reuse one compiled executable (grid dims are traced data, only
    # the buffer SIZE is baked into the compile). None = auto: 65536 on TPU
    # (compiles are expensive there), exact size elsewhere.
    grid_size_bucket: Optional[int] = None
    # mid-scan checkpoint/resume (grid/checkpoint.py); 0 disables
    checkpoint_path: Optional[str] = None
    checkpoint_every_chunks: int = 8
    # depth-scaled CLIP patches: constant physical footprint per patch
    # (reference's scale_patches_by_depth, clipfusion.py:631-639)
    scale_patches_by_depth: bool = False
    patch_footprint_m: float = 0.5
    # instance-aware label fusion: when the segmenter exposes per-frame
    # panoptic segment ids (run_on_batch_panoptic), null out dilated
    # same-class instance-boundary pixels before fusing labels, so touching
    # same-class objects are separated by a null seam in the 3D grid and the
    # flood fill splits them (the reference left this as a TODO,
    # handy_utils.py:135)
    split_instances: bool = True
    instance_boundary_dilate: int = 2
    # label-vote weighting: "uniform" (reference parity,
    # clip_seem_fusion.py:820-822 — one vote per valid observation) or
    # "near_surface" (opt-in: votes weighted 1..LABEL_VOTE_QUANT (=16) by
    # surface proximity;
    # suppresses shell-edge misvotes at occlusion boundaries — see
    # grid/fusion.py:label_vote_weights for the measured effect)
    label_vote_mode: str = "uniform"
    # segmentation stride (opt-in deployment knob, beyond parity — the
    # reference segments every frame, handy_utils.py:29-161): run the
    # panoptic segmenter on every k-th frame only; skipped frames still
    # contribute TSDF/RGB/CLIP features but cast ZERO label votes (their
    # label images are filled with -1, which one_hot drops — not null=133,
    # which would be a real vote for the null class). kMaX is ~85% of the
    # full pipeline's device compute, so stride k cuts that term ~k x; the
    # multi-frame vote averaging absorbs most of the quality cost (measure
    # with evals/synthetic.py before deploying). Must divide frame_chunk so
    # every chunk segments the same frame slots (stable executables).
    segment_stride: int = 1
    # quantized host->device transfer: rgb as uint8 (real scan data is 8-bit
    # at the source), depth as uint16 millimeters (the iPhone sensor's
    # native format; 1 mm resolution vs 40 mm voxels). 4x/2x less transfer —
    # the dominant per-chunk cost over a slow host<->device link.
    quantize_transfer: bool = True
    # device-side depth upsample: loaders whose depth is a native low-res
    # uint16 sensor frame enlarged by an integer cubic factor (iPhone:
    # 256x192 -> 4x, reference clipfusion.py:356-360) upload the NATIVE
    # frames and the pipeline runs the identical cubic enlarge on device
    # (core/upsample.py; <=1 mm vs the host cv2 path and strictly more
    # precise than the u16-mm re-quantization it replaces). Cuts depth
    # upload bytes 16x (~37% of the whole chunk at the iPhone operating
    # point) and removes the host cv2 pass from the 1-vCPU prefetch thread.
    device_depth_upsample: bool = True
    # rgb upload encoding: "u8" (default, reference-parity values) or
    # "yuv420" (opt-in: full-range BT.601 4:2:0 — half the rgb bytes over
    # the host->device link, decoded on device; lossy only in chroma
    # resolution + YUV rounding, which the 4:2:0 JPEG sources already
    # discarded upstream — see core/yuv.py for the measured fidelity)
    rgb_transfer: str = "u8"

    def __post_init__(self):
        # fail misconfiguration loudly: an unrecognized integrator would
        # otherwise fall through every dispatch elif into the dense scan
        # path, which looks like a perf regression rather than a typo
        valid = (None, "scan", "einsum", "pallas", "sparse", "brick")
        if self.integrator not in valid:
            raise ValueError(
                f"unknown integrator {self.integrator!r}; expected one of "
                f"{[v for v in valid if v]} (None = auto)"
            )
        if self.label_vote_mode not in ("uniform", "near_surface"):
            raise ValueError(
                f"unknown label_vote_mode {self.label_vote_mode!r}"
            )
        if self.rgb_transfer not in ("u8", "yuv420"):
            raise ValueError(
                f"unknown rgb_transfer {self.rgb_transfer!r} (u8|yuv420)"
            )
        # validate at CONFIG time, not per chunk: a live session would
        # otherwise swallow the per-chunk ValueError as "integration
        # deferred" and retry forever, wedging the stream until end()
        if self.segment_stride < 1:
            raise ValueError(
                f"segment_stride must be >= 1, got {self.segment_stride}"
            )
        if self.frame_chunk % self.segment_stride != 0:
            raise ValueError(
                f"segment_stride={self.segment_stride} must divide "
                f"frame_chunk={self.frame_chunk} (each chunk segments the "
                "same slots so executables stay bucket-stable)"
            )

    @property
    def trunc_m(self) -> float:
        return self.trunc_vox * self.voxel_size


@dataclasses.dataclass
class FusionResult:
    grid: FusionGrid
    values: Dict[str, np.ndarray]  # finalized numpy grid values
    nvox: tuple
    origin: np.ndarray
    config: FusionConfig
    timings: Dict[str, float]

    @property
    def feat_grid(self):
        """CLIP feature grid [*nvox, C] (device array): values["feat"] is
        kept bucket-padded for jit shape stability; this slices to the
        logical grid."""
        n = int(np.prod(self.nvox))
        return self.values["feat"][:n].reshape(*self.nvox, -1)

    def extract_mesh(self, voxel_obj_idx=None, segmentation_color=None,
                     feats_on_device: bool = False):
        return extract_mesh(
            self.values,
            self.nvox,
            self.origin,
            self.config.voxel_size,
            voxel_obj_idx=voxel_obj_idx,
            segmentation_color=segmentation_color,
            feats_on_device=feats_on_device,
        )


def null_instance_boundaries(
    cat: np.ndarray, seg: np.ndarray, null_id: int = NULL_CLASS_ID,
    dilate: int = 2,
) -> np.ndarray:
    """Null out pixels on SAME-CLASS instance-instance boundaries.

    cat/seg: [F, H, W] per-frame class ids / panoptic segment ids (0 =
    unassigned). Where two different segments of the same class touch, the
    (dilated) seam is set to null so the fused 3D label grid carries a gap
    between the instances. Class-class boundaries are left alone (3D
    connected components already separate those), and object-background
    edges are untouched (nulling them would erode every object)."""
    cat = np.asarray(cat)
    seg = np.asarray(seg)
    boundary = np.zeros(seg.shape, bool)

    def mark(a, b):
        seam = (
            (seg[a] != seg[b]) & (seg[a] > 0) & (seg[b] > 0)
            & (cat[a] == cat[b])
        )
        boundary[a] |= seam
        boundary[b] |= seam

    F = (slice(None),)
    mark(F + (slice(None), slice(1, None)),
         F + (slice(None), slice(None, -1)))
    mark(F + (slice(1, None), slice(None)),
         F + (slice(None, -1), slice(None)))

    if dilate > 0 and boundary.any():
        from scipy import ndimage

        structure = np.zeros((1, 3, 3), bool)
        structure[0] = True  # dilate within each frame only
        boundary = ndimage.binary_dilation(
            boundary, structure=structure, iterations=dilate
        )
    return np.where(boundary, null_id, cat).astype(np.int32)


def quantized_chunk_to_device(rgb_host, depth_host, depth_upsample: int = 1,
                              rgb_i420_height: int = 0):
    """Upload one frame chunk in quantized form (uint8 rgb / uint16-mm
    depth, converting only when the loader didn't already provide native
    precision) and return device f32 (rgb [0,1], depth meters). Shared by
    fuse_scan and the live streaming session.

    depth_upsample > 1 means depth_host is the loader's NATIVE low-res
    uint16 frame stack (e.g. iPhone 256x192) and the cubic enlarge runs on
    device after the (16x smaller) upload — see core/upsample.py.

    rgb_i420_height > 0 means rgb_host is a packed 4:2:0 chunk
    [F, H + H/2, W] (core/yuv.py) decoded on device after the (2x smaller)
    upload."""
    if rgb_i420_height > 0:
        from .core.yuv import i420_to_rgb_device

        rgb_dev = i420_to_rgb_device(rgb_host, rgb_i420_height)
    else:
        if rgb_host.dtype == np.uint8:  # native pass-through
            rgb_u8 = rgb_host
        else:
            rgb_u8 = np.clip(
                np.rint(rgb_host * 255.0), 0, 255
            ).astype(np.uint8)
        rgb_dev = jnp.asarray(rgb_u8).astype(jnp.float32) / 255.0
    if depth_upsample > 1:
        if depth_host.dtype != np.uint16:
            raise ValueError(
                "depth_upsample requires native uint16-mm depth, got "
                f"{depth_host.dtype}"
            )
        from .core.upsample import upsample_depth_u16_device

        return rgb_dev, upsample_depth_u16_device(depth_host, depth_upsample)
    if depth_host.dtype == np.uint16:  # native mm pass-through
        depth_u16 = depth_host
    else:
        depth_u16 = np.clip(
            np.rint(np.nan_to_num(depth_host) * 1000.0), 0, 65535
        ).astype(np.uint16)
    depth_dev = jnp.asarray(depth_u16).astype(jnp.float32) / 1000.0
    return rgb_dev, depth_dev


def _segment_batch(seg_obj, segmenter_fn, rgb_chunk, n_real: int,
                   config: FusionConfig, geometry=None):
    """One rgb batch -> labels, by capability priority: geometry-aware
    per-frame (segmenters with `needs_geometry`, e.g. GeometricSegmenter,
    get the frame's depth/K/pose) > device-fused (labels never leave the
    device) > batch panoptic + host seam nulling > plain batch >
    per-frame with null padding."""
    if (
        geometry is not None
        and seg_obj is not None
        and getattr(seg_obj, "needs_geometry", False)
    ):
        depth, K, pose = geometry
        rgb_host = np.asarray(rgb_chunk)
        depth = np.asarray(depth)
        if depth.dtype == np.uint16:
            depth = depth.astype(np.float32) / 1000.0
        H, W = rgb_host.shape[1:3]
        if depth.shape[1:] != (H, W):
            # native-depth transfers carry quarter-res depth; a nearest
            # enlarge is plenty for plane-normal estimation (K matches
            # the full-res rgb per the iPhone contract, core/upsample.py)
            fy, fx = H // depth.shape[1], W // depth.shape[2]
            if fy * depth.shape[1] != H or fx * depth.shape[2] != W:
                raise ValueError(
                    f"geometry-aware segmenter needs depth at an integer "
                    f"fraction of the rgb size, got {depth.shape[1:]} vs "
                    f"{(H, W)}")
            depth = depth.repeat(fy, axis=1).repeat(fx, axis=2)
        K = np.asarray(K)
        pose = np.asarray(pose)
        out = [
            seg_obj.segment(rgb_host[i], depth[i], K[i], pose[i])
            for i in range(n_real)
        ]
        null = np.full((H, W), NULL_CLASS_ID, np.int32)
        out += [null] * (len(rgb_host) - n_real)
        return np.stack(out).astype(np.int32)
    if (
        config.split_instances
        and seg_obj is not None
        and hasattr(seg_obj, "run_on_batch_fused_labels")
    ):
        return seg_obj.run_on_batch_fused_labels(
            rgb_chunk, dilate=config.instance_boundary_dilate,
            as_numpy=False,
        )
    if (
        config.split_instances
        and seg_obj is not None
        and hasattr(seg_obj, "run_on_batch_panoptic")
    ):
        cat, seg = seg_obj.run_on_batch_panoptic(rgb_chunk)
        return null_instance_boundaries(
            cat, seg, dilate=config.instance_boundary_dilate
        )
    if seg_obj is not None and hasattr(seg_obj, "run_on_batch"):
        return seg_obj.run_on_batch(rgb_chunk).astype(np.int32)
    rgb_host = np.asarray(rgb_chunk)
    out = [segmenter_fn(rgb_host[i]) for i in range(n_real)]
    null = np.full(rgb_host.shape[1:3], NULL_CLASS_ID, np.int32)
    out += [null] * (len(rgb_host) - n_real)
    return np.stack(out).astype(np.int32)


def labels_for_chunk(seg_obj, segmenter_fn, rgb_chunk, n_real: int,
                     config: FusionConfig, geometry=None):
    """Panoptic labels for one rgb chunk (see _segment_batch for the
    capability priority). Shared by fuse_scan and the live streaming
    session so the two ingestion paths cannot diverge. Returns device or
    host labels, or None when config.with_labels is off.

    geometry: optional (depth [B,h,w], K [B,3,3], pose [B,4,4]) host
    arrays for segmenters flagged `needs_geometry` (depth may be uint16
    mm and/or at an integer fraction of the rgb resolution).

    config.segment_stride > 1 segments only chunk slots 0, k, 2k, ... and
    fills the skipped frames' label images with -1: every label-vote path
    accumulates via jax.nn.one_hot, whose out-of-range rows are all-zero,
    so skipped frames cast no votes at all (null=133 would instead vote
    FOR the null class and dilute the argmax). The stride must divide
    frame_chunk so each chunk segments the same slots (same sub-batch
    shape -> one executable; and slot i of chunk c is global frame
    c*frame_chunk + i, so global coverage is exactly every k-th frame)."""
    if not config.with_labels:
        return None
    stride = int(config.segment_stride)  # >=1: validated in __post_init__
    if stride == 1:
        return _segment_batch(seg_obj, segmenter_fn, rgb_chunk, n_real,
                              config, geometry=geometry)
    B = len(rgb_chunk)
    if B % stride != 0:
        raise ValueError(
            f"segment_stride={stride} must divide the chunk size {B}"
        )
    sel = np.arange(0, B, stride)
    sub = _segment_batch(
        seg_obj, segmenter_fn, rgb_chunk[sel],
        # real frames among the selected slots (chunk tails are padded)
        int((sel < n_real).sum()),
        config,
        geometry=(None if geometry is None
                  else tuple(np.asarray(g)[sel] for g in geometry)),
    )
    if isinstance(sub, jax.Array):  # device path: scatter on device
        full = jnp.full(
            (B,) + tuple(sub.shape[1:]), -1, dtype=sub.dtype
        )
        return full.at[jnp.asarray(sel)].set(sub)
    full = np.full((B,) + tuple(sub.shape[1:]), -1, dtype=np.int32)
    full[sel] = sub
    return full


def compute_scene_bounds(dataset, config: FusionConfig, chunk: int = 32):
    """Pass 1: sparse backprojection of every frame -> percentile bounds
    (reference clipfusion.py:1063, 1100-1106).

    Datasets exposing bounds_samples (all FrameDataset subclasses) stream
    one frame at a time and never stack whole-scan RGB/depth; loaders with
    separately-stored depth skip RGB decode entirely (data/base.py)."""
    n = len(dataset)
    if n == 0:
        raise ValueError("dataset has no frames")
    if hasattr(dataset, "bounds_samples"):
        from .core.bounds import backproject_sparse_samples

        depth, uu, vv, poses, Ks = dataset.bounds_samples()
        xyz = backproject_sparse_samples(
            depth, uu, vv, poses, Ks, max_depth=config.max_depth
        )
    else:  # minimal ad-hoc datasets (len + stacked only)
        clouds = []
        for start in range(0, n, chunk):
            idx = range(start, min(n, start + chunk))
            stack = dataset.stacked(idx)
            clouds.append(
                backproject_sparse_cloud(
                    stack["depth"], stack["pose"], stack["K"],
                    max_depth=config.max_depth,
                )
            )
        xyz = np.concatenate(clouds, axis=0)
    minbound, maxbound = percentile_bounds(xyz, config.trunc_m)
    nvox = compute_grid_dims(minbound, maxbound, config.voxel_size)
    return minbound, maxbound, nvox


def fuse_scan(
    dataset,
    clip_engine,
    config: Optional[FusionConfig] = None,
    segmenter: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    progress: Optional[Callable[[str], None]] = None,
    on_chunk: Optional[Callable[[FusionGrid, int], None]] = None,
    on_dispatch: Optional[Callable[[int, int], None]] = None,
    on_chunk_every: int = 1,
) -> FusionResult:
    """Run the full fusion over a FrameDataset.

    segmenter: rgb [H, W, 3] in [0,1] -> per-pixel class-id mask [H, W] i32
    (null = 133). Required when config.with_labels.
    on_chunk: called with (grid, last_frame_index) after each
    on_chunk_every-th integrated chunk — e.g. for incremental mesh previews
    (the reference's write_incremental_meshes, clipfusion.py:1122-1166).
    Forces a device sync at each call, so throttle via on_chunk_every when
    the pipeline should stay async.
    on_dispatch: called with (frames_dispatched, frames_total) after each
    chunk is ENQUEUED on the device (no sync forced, unlike on_chunk) —
    cheap live progress for background reprocess jobs.
    """
    config = config or FusionConfig()
    if config.with_labels and segmenter is None:
        raise ValueError("with_labels=True requires a segmenter")
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    say = progress or (lambda s: None)
    timings: Dict[str, float] = {}

    t0 = time.perf_counter()
    minbound, maxbound, nvox = compute_scene_bounds(dataset, config)
    timings["bounds_s"] = time.perf_counter() - t0
    say(f"bounds: nvox={tuple(nvox)}")

    import jax

    integrator = config.integrator
    if integrator is None:
        integrator = "sparse" if jax.default_backend() == "tpu" else "scan"

    # multi-chip voxel sharding (opt-in): the shard_map step hosts EVERY
    # integrator — sparse/brick compact per shard via voxel_start, with
    # static per-shard slot budgets (config.sparse_capacity /
    # brick_capacity; 0 = the integrators' shard-scaled defaults — the
    # adaptive controller stays single-device-only)
    mesh_obj = None
    shard_integrator = None
    if config.shard_voxels and len(jax.devices()) > 1:
        from .parallel.mesh import make_mesh

        mesh_obj = make_mesh()
        shard_integrator = integrator
        say(f"voxel-sharded fusion over {len(jax.devices())} devices "
            f"({shard_integrator} in-shard)")

    bucket = config.grid_size_bucket
    if bucket is None:
        bucket = 65536 if jax.default_backend() == "tpu" else 1
    if integrator == "pallas":
        bucket = max(bucket, config.pallas_tile)
        if bucket % config.pallas_tile != 0:
            raise ValueError(
                f"grid_size_bucket {bucket} must be a multiple of "
                f"pallas_tile {config.pallas_tile}"
            )
    if mesh_obj is not None:
        bucket = sharded_grid_bucket(
            bucket, mesh_obj.devices.size, shard_integrator,
            config.pallas_tile,
        )

    grid = create_grid(
        minbound,
        config.voxel_size,
        nvox,
        config.trunc_m,
        feature_dim=clip_engine.feature_dim,
        with_labels=config.with_labels,
        num_classes=config.num_classes,
        pad_to=bucket,
        min_padding=1 if integrator in ("sparse", "brick") else 0,
    )
    if mesh_obj is not None:
        from .parallel.sharded import shard_grid

        grid = shard_grid(mesh_obj, grid)
    shard_step = None  # built lazily at the first chunk (needs the batch)

    n = len(dataset)
    F = config.frame_chunk
    t_inference = 0.0
    t_integrate = 0.0

    # adaptive slot budgets: phase-2 cost in the sparse/brick integrators
    # scales with the CAPACITY (static slot count), not the actual active
    # union, so start small and grow from observed per-chunk counts
    # (AdaptiveCap). Under sharding the budgets are PER SHARD: sized from
    # the shard length and grown from the max per-shard count; a growth
    # drops the built step so the next chunk re-jits with the new statics.
    sparse_cap = None
    brick_cap = None
    n_cap = grid.tsdf_sum.shape[0]
    if mesh_obj is not None:
        n_cap //= mesh_obj.devices.size
    if integrator in ("sparse", "brick"):
        sparse_cap = AdaptiveCap.for_sparse(n_cap, config)
    if integrator == "brick":
        brick_cap = AdaptiveCap.for_brick(n_cap, config)

    start_frame = 0
    if config.checkpoint_path and os.path.exists(config.checkpoint_path):
        from .grid.checkpoint import load_grid

        try:
            ck_grid, frames_done = load_grid(config.checkpoint_path)
            if (
                ck_grid.nvox_tuple == grid.nvox_tuple
                and ck_grid.tsdf_sum.shape == grid.tsdf_sum.shape
                and frames_done % F == 0
            ):
                grid = ck_grid
                if mesh_obj is not None:
                    grid = shard_grid(mesh_obj, grid)
                start_frame = frames_done
                say(f"resumed from checkpoint at frame {start_frame}")
        except Exception as e:  # corrupt checkpoint: start over
            say(f"checkpoint load failed ({e}); starting fresh")

    # host-side prefetch: decode/stack chunk i+1 while the device works on
    # chunk i (replaces the reference's DataLoader worker processes,
    # clipfusion.py:1064,1120)
    from concurrent.futures import ThreadPoolExecutor

    chunk_starts = list(range(start_frame, n, F))
    prefetcher = ThreadPoolExecutor(max_workers=1)

    # quantized transfers read the loader's native-precision form when it
    # has one (uint8 rgb / uint16 mm depth pass-through, data/base.py) —
    # the generic fallback converts on the prefetch thread
    use_u8 = config.quantize_transfer and hasattr(dataset, "stacked_u8")
    # native-depth capability: upload the sensor-resolution uint16 frames
    # and cubic-enlarge on device. The depth-scaled patch tiler reads host
    # depth per frame, so it keeps the host-upsampled path.
    native_depth = bool(
        use_u8
        and config.device_depth_upsample
        and not config.scale_patches_by_depth
        and getattr(dataset, "native_depth_scale", 0) > 1
    )
    # opt-in 4:2:0 rgb transfer (core/yuv.py): encode on the prefetch
    # thread, decode on device as part of the upload
    yuv420 = config.rgb_transfer == "yuv420" and config.quantize_transfer

    def load_chunk(start):
        idx = list(range(start, min(n, start + F)))
        if native_depth:
            stack = dataset.stacked_u8(idx, native_depth=True)
        elif use_u8:
            stack = dataset.stacked_u8(idx)
        else:
            stack = dataset.stacked(idx)
        if yuv420:
            from .core.yuv import i420_compatible, rgb_u8_to_i420

            rgb = stack["rgb"]
            if not i420_compatible(rgb.shape[1], rgb.shape[2]):
                # a crash here would surface from the prefetch thread as an
                # opaque reshape error; degrade to the u8 transfer instead
                warnings.warn(
                    f"rgb_transfer=yuv420 needs H % 4 == 0 and W % 2 == 0, "
                    f"got {rgb.shape[1:3]}; falling back to u8 transfer",
                    stacklevel=2,
                )
                return idx, stack
            if rgb.dtype != np.uint8:
                rgb = np.clip(np.rint(rgb * 255.0), 0, 255).astype(np.uint8)
            stack = dict(stack)
            stack["rgb_height"] = rgb.shape[1]
            stack["rgb"] = rgb_u8_to_i420(rgb)
        return idx, stack

    pending = prefetcher.submit(load_chunk, chunk_starts[0]) if chunk_starts else None

    chunk_counter = 0
    for ci, start in enumerate(chunk_starts):
        idx, stack = pending.result()
        if ci + 1 < len(chunk_starts):
            pending = prefetcher.submit(load_chunk, chunk_starts[ci + 1])
        n_real = len(idx)
        pad = F - n_real

        def pad_tail(x):
            if pad == 0:
                return x
            return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)

        rgb_chunk = pad_tail(stack["rgb"])  # padded BEFORE inference so the
        # encode batch shape is constant across chunks (no recompiles)
        # one host->device upload per chunk: CLIP encode, the segmenter, and
        # the integration batch all read this same device buffer (RGB is
        # ~100 MB/chunk at the iPhone operating point; the tunnel made
        # triple uploads a measurable cost)
        depth_host = pad_tail(stack["depth"])
        if config.quantize_transfer:
            rgb_chunk, depth_dev = quantized_chunk_to_device(
                rgb_chunk, depth_host,
                depth_upsample=stack.get("depth_upsample", 1),
                rgb_i420_height=stack.get("rgb_height", 0),
            )
        else:
            rgb_chunk = jnp.asarray(rgb_chunk)
            depth_dev = jnp.asarray(depth_host)

        # multi-chip: frame-shard the RGB chunk so the CLIP/kMaX inference
        # jits auto-partition data-parallel over the mesh (GSPMD propagates
        # the input sharding through the whole forward); the shard_map
        # integrate step then gathers the (replicated-spec) frame batch
        # itself. Without this, a sharded run would still bottleneck the
        # model forwards on one chip.
        if mesh_obj is not None and F % mesh_obj.devices.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rgb_chunk = jax.device_put(
                rgb_chunk,
                NamedSharding(mesh_obj, P("d", None, None, None)),
            )

        # NOTE: feature images stay on device (no host round trip); chunks
        # are dispatched asynchronously and only synced at finalize time
        t1 = time.perf_counter()
        if config.scale_patches_by_depth:
            depth_chunk = pad_tail(stack["depth"])
            if depth_chunk.dtype == np.uint16:
                depth_chunk = depth_chunk.astype(np.float32) / 1000.0
            K_chunk = pad_tail(stack["K"])
            feat_imgs = jnp.stack(
                [
                    clip_engine.img_inference_tiled_depthscaled(
                        rgb_chunk[i], depth_chunk[i], K_chunk[i],
                        config.clip_patch_stride,
                        footprint_m=config.patch_footprint_m,
                    )
                    for i in range(F)
                ]
            )
        elif hasattr(clip_engine, "img_inference_tiled_batch"):
            feat_imgs = clip_engine.img_inference_tiled_batch(
                rgb_chunk,
                patch_size=config.clip_patch_size,
                patch_stride=config.clip_patch_stride,
            )
        else:
            feat_imgs = jnp.stack(
                [
                    clip_engine.img_inference_tiled(
                        rgb_chunk[i],
                        patch_size=config.clip_patch_size,
                        patch_stride=config.clip_patch_stride,
                    )
                    for i in range(F)
                ]
            )
        seg_obj = getattr(segmenter, "__self__", None)
        labels = labels_for_chunk(
            seg_obj, segmenter, rgb_chunk, n_real, config,
            geometry=(
                (depth_host, pad_tail(stack["K"]), pad_tail(stack["pose"]))
                if getattr(seg_obj, "needs_geometry", False) else None
            ),
        )
        t_inference += time.perf_counter() - t1

        batch = FrameBatch(
            depth=depth_dev,
            rgb=jnp.asarray(rgb_chunk),
            pose=jnp.asarray(pad_tail(stack["pose"])),
            K=jnp.asarray(pad_tail(stack["K"])),
            feat_img=feat_imgs,
            labels=jnp.asarray(labels) if labels is not None else None,
            frame_valid=jnp.asarray(
                np.array([True] * n_real + [False] * pad)
            ),
        )
        t1 = time.perf_counter()
        # compiled Pallas targets TPU; off-TPU (CPU test meshes, dryruns)
        # the kernel runs in interpret mode
        pallas_interp = jax.default_backend() != "tpu"
        if mesh_obj is not None:
            compact = shard_integrator in ("sparse", "brick")
            if shard_step is None:
                from .parallel.sharded import make_sharded_integrate

                shard_step = make_sharded_integrate(
                    mesh_obj, grid, batch, rgb_mode=config.rgb_mode,
                    integrator=shard_integrator,
                    pallas_tile=config.pallas_tile,
                    pallas_interpret=pallas_interp,
                    label_vote_mode=config.label_vote_mode,
                    capacity=sparse_cap.value if compact else 0,
                    brick_size=config.brick_size,
                    brick_capacity=(
                        brick_cap.value if brick_cap is not None else 0
                    ),
                    with_count=compact,
                )
            if compact and shard_integrator == "brick":
                grid, nbc, cnt = shard_step(grid, batch)
            elif compact:
                grid, cnt = shard_step(grid, batch)
                nbc = None
            else:
                grid = shard_step(grid, batch)
            if compact:
                grew = False
                if config.sparse_capacity == 0:
                    c = sparse_cap.observe(jnp.max(cnt))
                    if c is not None:
                        say(f"per-shard sparse capacity -> "
                            f"{sparse_cap.value} (max union {c})")
                        grew = True
                if nbc is not None and config.brick_capacity == 0:
                    c = brick_cap.observe(jnp.max(nbc))
                    if c is not None:
                        say(f"per-shard brick capacity -> "
                            f"{brick_cap.value} (max frustum bricks {c})")
                        grew = True
                if grew:
                    shard_step = None  # re-jit with the grown statics
        elif integrator == "pallas":
            grid = integrate_frames_pallas(
                grid, batch, rgb_mode=config.rgb_mode,
                tile=config.pallas_tile, interpret=pallas_interp,
                label_vote_mode=config.label_vote_mode,
            )
        elif integrator == "einsum":
            grid = integrate_frames_einsum(
                grid, batch, rgb_mode=config.rgb_mode,
                label_vote_mode=config.label_vote_mode,
            )
        elif integrator == "sparse":
            from .grid.fusion import integrate_frames_sparse

            grid, cnt = integrate_frames_sparse(
                grid, batch, rgb_mode=config.rgb_mode,
                capacity=sparse_cap.value, with_count=True,
                label_vote_mode=config.label_vote_mode,
            )
            if config.sparse_capacity == 0:
                c = sparse_cap.observe(cnt)
                if c is not None:
                    say(f"sparse capacity -> {sparse_cap.value} "
                        f"(union {c})")
        elif integrator == "brick":
            from .grid.brick import integrate_frames_brick

            grid, nbc, cnt = integrate_frames_brick(
                grid, batch, rgb_mode=config.rgb_mode,
                brick_size=config.brick_size,
                brick_capacity=brick_cap.value,
                capacity=sparse_cap.value, with_count=True,
                label_vote_mode=config.label_vote_mode,
            )
            if config.brick_capacity == 0:
                c = brick_cap.observe(nbc)
                if c is not None:
                    say(f"brick capacity -> {brick_cap.value} "
                        f"(frustum bricks {c})")
            if config.sparse_capacity == 0:
                c = sparse_cap.observe(cnt)
                if c is not None:
                    say(f"sparse capacity -> {sparse_cap.value} "
                        f"(union {c})")
        else:
            grid = integrate_frames(
                grid, batch, rgb_mode=config.rgb_mode,
                label_vote_mode=config.label_vote_mode,
            )
        # only force completion when someone needs to observe the grid now;
        # otherwise chunks pipeline asynchronously on device. The LAST chunk
        # always fires on_chunk (scans shorter than on_chunk_every chunks
        # would otherwise never produce a preview; finalize syncs right
        # after anyway so the extra sync is ~free)
        chunk_due = on_chunk is not None and (
            (chunk_counter + 1) % max(1, on_chunk_every) == 0
            or ci == len(chunk_starts) - 1
        )
        needs_sync = chunk_due or (
            config.checkpoint_path
            and config.checkpoint_every_chunks > 0
            and (chunk_counter + 1) % config.checkpoint_every_chunks == 0
        )
        if needs_sync:
            grid.tsdf_sum.block_until_ready()
        t_integrate += time.perf_counter() - t1
        say(f"integrated frames {idx[0]}..{idx[-1]}")
        if on_dispatch is not None:
            on_dispatch(min(start + F, n), n)
        if chunk_due:
            on_chunk(grid, idx[-1])

        chunk_counter += 1
        if (
            config.checkpoint_path
            and config.checkpoint_every_chunks > 0
            and chunk_counter % config.checkpoint_every_chunks == 0
        ):
            from .grid.checkpoint import save_grid

            save_grid(config.checkpoint_path, grid, frames_done=start + F)

    timings["inference_s"] = t_inference
    timings["integrate_s"] = t_integrate
    if sparse_cap is not None:
        timings["sparse_capacity"] = sparse_cap.value
    if brick_cap is not None:
        timings["brick_capacity"] = brick_cap.value

    prefetcher.shutdown(wait=False)

    if config.checkpoint_path and os.path.exists(config.checkpoint_path):
        os.remove(config.checkpoint_path)  # scan completed

    t1 = time.perf_counter()
    n_logical = int(np.prod(nvox))
    values = {}
    for k, v in finalize_grid(grid).items():
        if k == "feat":
            # the CLIP feature grid is by far the largest buffer (~1 GB at
            # 0.5M voxels x 512): keep it ON DEVICE and UNSLICED (the
            # bucket-padded length keeps downstream vertex-sampling jits
            # shape-stable across scans). Mesh sampling reads it directly;
            # consumers needing the logical grid slice to
            # values["feat"][:prod(nvox)]; np.save works via __array__.
            values[k] = v
        else:
            values[k] = np.asarray(v)[:n_logical]
    timings["finalize_s"] = time.perf_counter() - t1

    return FusionResult(
        grid=grid,
        values=values,
        nvox=tuple(int(v) for v in nvox),
        origin=np.asarray(minbound, np.float32),
        config=config,
        timings=timings,
    )
