"""Live streaming scan ingestion — a product capability beyond the
reference, enabled by the TPU-first fusion design.

The reference can only reconstruct a COMPLETED scan directory
(clip_seem_fusion.py:247-437 iterates a dataset front to back). Because
this framework's grid accumulators are order-independent weighted SUMS
(grid/voxel_grid.py), frames can be integrated the moment they arrive:
an AR client streams frames over HTTP while scanning, watches a coarse
preview mesh grow, and the scene becomes queryable right after the last
frame — no scan-then-wait round trip.

Flow (manager.live_begin / live_push / live_preview / live_end):

1. begin: allocates a session (config snapshot, no grid yet).
2. push: frames buffer until `frame_chunk` are pending, then one chunk
   runs CLIP tiled encode + panoptic labels + integration, dispatched
   asynchronously on the device (same per-chunk program as fuse_scan).
   The grid is created lazily at the first full chunk: bounds come from
   the sparse 7x7 backprojection of the frames seen so far, padded by
   `margin_m` on every side so the scene can grow beyond the first
   chunk's view. Out-of-bounds samples are tracked per push — the
   response carries `clipped_fraction` so clients know when the margin
   was too small (the persisted frames allow an exact offline rebuild).
3. preview: coarse geometry-only mesh of the current grid (same
   _preview_finalize path the async-reprocess preview uses).
4. end: the partial tail chunk integrates with masked padding frames,
   the grid finalizes into a FusionResult, the frames are persisted as
   a new scan VERSION (data/live.py live_frames.npz — reprocess_scan
   and the batch CLI can rebuild it like any disk scan), and the
   standard post-processing (flood fill, meshes, in-situ re-id) +
   atomic install make it the served version.
"""
from __future__ import annotations

import threading
import time
import warnings
from typing import Optional

import numpy as np

from ..core.bounds import (
    backproject_sparse_samples,
    compute_grid_dims,
    percentile_bounds,
    subsample_grid,
)
from ..grid.voxel_grid import FrameBatch, create_grid, finalize_grid
from ..pipeline import FusionConfig, FusionResult


class LiveScanSession:
    def __init__(
        self,
        clip_engine,
        seg_model,
        config: FusionConfig,
        margin_m: float = 1.0,
        staging_dir: Optional[str] = None,
    ):
        import jax

        self.clip = clip_engine
        self.seg = seg_model
        self.cfg = config
        self.margin_m = float(margin_m)
        self.lock = threading.Lock()
        self.started_at = time.time()

        self.on_tpu = jax.default_backend() == "tpu"
        self.bucket = 65536 if self.on_tpu else 1

        # multi-chip voxel sharding (FusionConfig.shard_voxels): same
        # shard_map step as fuse_scan — every chip integrates the stream
        # into its own voxel shard, zero collectives per chunk
        self._mesh = None
        self._shard_step = None
        if config.shard_voxels and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh

            self._mesh = make_mesh()

        self.pending: list = []  # per-frame dicts awaiting a full chunk
        self.frames_seen = 0
        self.frames_integrated = 0
        self.integrate_warning = None
        self.resuming = False  # set by manager.live_resume during replay
        self.grid = None
        self.nvox = None
        self.origin = None
        self.maxbound = None
        self.ended = False

        # accumulated sparse bounds/clip samples
        self._uu = None
        self._vv = None
        self._depth_samples: list = []
        self._poses: list = []
        self._Ks: list = []
        self.clipped_samples = 0
        self.total_samples = 0

        # quantized copies of every pushed frame. With a staging_dir, each
        # push writes its frames to disk as an atomic part file (crash
        # durability: a dead server loses at most the in-flight request,
        # and manager.live_recover() rebuilds from the parts) and only the
        # first frame's shape is kept in RAM; without one, frames
        # accumulate in memory and live_end persists them in one shot.
        self.staging_dir = staging_dir
        self._staged_parts = 0
        self._rgb_u8: list = []
        self._depth_u16: list = []
        self._frame_hw: Optional[tuple] = None
        # 1 = depth pushed at rgb resolution; s > 1 = native low-res depth
        # enlarged s-fold on device (core/upsample.py)
        self._depth_scale = 1

        self.timings = {"inference_s": 0.0, "integrate_s": 0.0,
                        "bounds_s": 0.0}

        # adaptive sparse/brick slot budgets (pipeline.AdaptiveCap, built
        # lazily in _integrate_compact), carried across the stream's chunks
        self._sparse_cap = None
        self._brick_cap = None

        # end()-path executable pre-warm (finalize + preview + vertex
        # samplers), kicked once the grid shape is known (first chunk) so
        # the serialized remote compile/cache loads overlap the user's
        # scanning time instead of sitting on live_end latency
        # (SAI_LIVE_WARM=0 disables)
        import os

        self._warm_enabled = os.environ.get("SAI_LIVE_WARM", "1") == "1"
        self._warm_thread = None
        self.warm_state = "off" if not self._warm_enabled else "pending"

    # -- push ---------------------------------------------------------------

    def push(self, rgb, depth, pose, K, _stage: bool = True,
             rgb_i420_height: int = 0) -> dict:
        """Add frames. rgb [F, H, W, 3] uint8 or float [0,1]; depth
        [F, H, W] uint16 mm or float meters — OR the sensor's native
        low-res frame [F, H/s, W/s] for an integer s (e.g. the iPhone's
        256x192 vs 1024x768 rgb): the cubic 4x enlarge then runs on device
        (core/upsample.py) and the client ships 16x fewer depth bytes.
        K is always for the RGB resolution. pose [F, 4, 4]; K [F, 3, 3].
        Single frames may omit the leading axis. Returns progress + the
        running clipped_fraction. _stage=False replays already-staged
        frames (manager.live_resume) without re-writing them.

        rgb_i420_height=H marks rgb as PACKED i420 planes [F, H + H//2, W]
        u8 in rgb_u8_to_i420's convention (cv2 ANALOG-scaled BT.601
        full-range, core/yuv.py — what cli.client --i420 produces; NOT
        video-range/JFIF camera YUV, whose wrong inverse costs ~10 dB
        PSNR — transcode camera planes to this convention client-side).
        In a rgb_transfer="yuv420" session the planes stay packed
        end-to-end: staged verbatim, uploaded verbatim, decoded on DEVICE
        (core/yuv.py:i420_to_rgb_device) — no host decode on the push path
        and no second chroma rounding. Any other session decodes to u8 at
        this boundary (same result as a u8 push)."""
        from ..core.upsample import infer_native_depth_scale

        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        pose = np.asarray(pose, np.float32)
        K = np.asarray(K, np.float32)
        i420 = int(rgb_i420_height) > 0
        if rgb.ndim == (2 if i420 else 3):
            rgb, depth, pose, K = rgb[None], depth[None], pose[None], K[None]
        if i420:
            from ..core.yuv import i420_compatible, i420_to_rgb_u8

            H, W = int(rgb_i420_height), int(rgb.shape[-1])
            if (rgb.ndim != 3 or rgb.dtype != np.uint8
                    or not i420_compatible(H, W)
                    or rgb.shape[1] != H + H // 2):
                raise ValueError(
                    f"rgb_i420 expects packed u8 planes [F, H + H//2, W] "
                    f"with H % 4 == 0 and W % 2 == 0; got {rgb.shape} "
                    f"({rgb.dtype}) for H={rgb_i420_height}"
                )
            if self.cfg.rgb_transfer != "yuv420":
                # u8-transfer session: the device path wants u8 — decode
                # once at this boundary; yuv420 sessions keep the planes
                rgb = i420_to_rgb_u8(rgb)
                i420 = False
        else:
            if rgb.dtype != np.uint8:
                rgb = np.clip(
                    np.rint(rgb * 255.0), 0, 255
                ).astype(np.uint8)
            if rgb.ndim != 4 or rgb.shape[-1] != 3:
                raise ValueError(
                    f"rgb {rgb.shape} / depth {depth.shape} mismatch"
                )
            H, W = rgb.shape[1], rgb.shape[2]
        if depth.dtype != np.uint16:
            depth = np.clip(
                np.rint(np.nan_to_num(depth) * 1000.0), 0, 65535
            ).astype(np.uint16)

        if depth.ndim != 3:
            raise ValueError(
                f"rgb {rgb.shape} / depth {depth.shape} mismatch"
            )
        depth_scale = infer_native_depth_scale(
            (H, W), depth.shape[1:3]
        )  # raises on non-integer ratios
        if pose.shape[-2:] != (4, 4) or K.shape[-2:] != (3, 3):
            raise ValueError(
                f"pose {pose.shape} / K {K.shape}: expected [F,4,4]/[F,3,3]"
            )
        if not (len(rgb) == len(depth) == len(pose) == len(K)):
            raise ValueError("frame-count mismatch across rgb/depth/pose/K")
        with self.lock:
            if self.ended:
                raise ValueError("live session already ended")
            t0 = time.perf_counter()
            if self._frame_hw is not None and (
                self._frame_hw != (H, W) or self._depth_scale != depth_scale
            ):
                raise ValueError(
                    f"frame resolution changed mid-stream: "
                    f"{self._frame_hw}/s={self._depth_scale} -> "
                    f"{(H, W)}/s={depth_scale}"
                )
            self._frame_hw = (H, W)
            self._depth_scale = depth_scale
            if self._uu is None:
                self._uu, self._vv = subsample_grid(W, H)
            if self.staging_dir is not None and _stage:
                # durable BEFORE any bookkeeping: a crash after this point
                # can always recover the frames
                from ..data.live import save_staging_part

                save_staging_part(
                    self.staging_dir, self._staged_parts, rgb, depth,
                    pose, K, rgb_i420_height=H if i420 else 0,
                )
                self._staged_parts += 1
            for f in range(len(rgb)):
                if depth_scale > 1:
                    # sparse evaluation of the device upsample at the 49
                    # bounds points — no full-frame enlarge on this host
                    from ..core.upsample import sample_upsampled_u16

                    d_m = sample_upsampled_u16(
                        depth[f], self._uu, self._vv, depth_scale
                    )
                else:
                    d_m = (
                        depth[f, self._vv, self._uu].astype(np.float32) / 1e3
                    )
                self._depth_samples.append(d_m)
                self._poses.append(pose[f])
                self._Ks.append(K[f])
                self._track_clipping(d_m, pose[f], K[f])
                if self.staging_dir is None:
                    # persistence copy for live_end's save_live_frames.
                    # i420 frames keep their PLANES ([H+H//2, W], ndim 2 —
                    # distinguishable from HWC u8) and decode once at end
                    self._rgb_u8.append(rgb[f])
                    self._depth_u16.append(depth[f])
                self.pending.append(
                    {("rgb_i420" if i420 else "rgb"): rgb[f],
                     "depth": depth[f], "pose": pose[f], "K": K[f]}
                )
                self.frames_seen += 1
            self.timings["bounds_s"] += time.perf_counter() - t0

            # integrate full chunks; a chunk is popped only AFTER it
            # integrates. A transient integration failure (e.g. no valid
            # depth yet for the grid bounds) DEFERS integration instead of
            # failing the push: the frames were accepted and stay pending,
            # later pushes retry, and end() surfaces a persistent error.
            self.integrate_warning = None
            while len(self.pending) >= self.cfg.frame_chunk:
                chunk = self.pending[: self.cfg.frame_chunk]
                try:
                    self._integrate(chunk, n_real=len(chunk))
                except ValueError as e:
                    self.integrate_warning = (
                        f"integration deferred: {e}"
                    )
                    break
                self.pending = self.pending[self.cfg.frame_chunk:]
            return self.status()

    def status(self) -> dict:
        out = {
            "state": "ended" if self.ended else "live",
            "frames_seen": self.frames_seen,
            "frames_integrated": self.frames_integrated,
            "frames_pending": len(self.pending),
            "grid_allocated": self.grid is not None,
            "nvox": None if self.nvox is None else [int(v) for v in
                                                    self.nvox],
            "clipped_fraction": round(
                self.clipped_samples / max(1, self.total_samples), 4
            ),
            "elapsed_s": round(time.time() - self.started_at, 3),
            "warm": self.warm_state,
        }
        if getattr(self, "integrate_warning", None):
            out["warning"] = self.integrate_warning
        return out

    def _track_clipping(self, d_m, pose, K):
        """Fraction of valid sparse samples falling outside the live grid —
        the client's signal that the margin was too small."""
        if self.origin is None:
            return
        xyz = backproject_sparse_samples(
            d_m[None], self._uu, self._vv, pose[None], K[None],
            max_depth=self.cfg.max_depth,
        )
        if not len(xyz):
            return
        out = (
            (xyz < self.origin[None, :]) | (xyz > self.maxbound[None, :])
        ).any(axis=1)
        self.clipped_samples += int(out.sum())
        self.total_samples += len(xyz)

    # -- grid + integration --------------------------------------------------

    def _integrator(self) -> str:
        """Effective integrator for this stream. Default stays einsum on
        TPU (not fuse_scan's sparse: a short stream has no scan length to
        amortize adaptive capacity growth against, and einsum is within ~5%
        at the default operating point); FusionConfig.integrator /
        SAI_INTEGRATOR overrides — live grids carry the 1 m empty margin,
        where the brick/sparse compaction pays off on long streams."""
        if self.cfg.integrator:
            return self.cfg.integrator
        return "einsum" if self.on_tpu else "scan"

    def _shard_integrator(self) -> str:
        """In-shard integrator when voxel sharding is on: the shard_map
        step hosts every integrator (sparse/brick compact per shard via
        voxel_start with static shard-scaled budgets — the AdaptiveCap
        controller stays single-device-only, same rule as fuse_scan)."""
        return self._integrator()

    def _ensure_grid(self):
        if self.grid is not None:
            return
        cfg = self.cfg
        xyz = backproject_sparse_samples(
            np.stack(self._depth_samples), self._uu, self._vv,
            np.stack(self._poses), np.stack(self._Ks),
            max_depth=cfg.max_depth,
        )
        minb, maxb = percentile_bounds(xyz, cfg.trunc_m)
        minb = minb - self.margin_m
        maxb = maxb + self.margin_m
        self.nvox = compute_grid_dims(minb, maxb, cfg.voxel_size)
        self.origin = np.asarray(minb, np.float32)
        self.maxbound = np.asarray(maxb, np.float32)
        import math

        integ = (
            self._shard_integrator() if self._mesh is not None
            else self._integrator()
        )
        if self._mesh is not None:
            from ..pipeline import sharded_grid_bucket

            pad_to = sharded_grid_bucket(
                self.bucket, self._mesh.devices.size, integ, cfg.pallas_tile
            )
        elif integ == "pallas":
            pad_to = math.lcm(self.bucket, cfg.pallas_tile)
        else:
            pad_to = self.bucket
        self.grid = create_grid(
            minb, cfg.voxel_size, self.nvox, cfg.trunc_m,
            feature_dim=self.clip.feature_dim,
            with_labels=cfg.with_labels,
            num_classes=cfg.num_classes,
            pad_to=pad_to,
            min_padding=1 if integ in ("sparse", "brick") else 0,
        )
        if self._mesh is not None:
            from ..parallel.sharded import shard_grid

            self.grid = shard_grid(self._mesh, self.grid)

    def _integrate(self, chunk, n_real: int):
        import jax.numpy as jnp

        from ..grid.fusion import integrate_frames, integrate_frames_einsum
        from ..pipeline import labels_for_chunk, quantized_chunk_to_device

        cfg = self.cfg
        self._ensure_grid()
        F = cfg.frame_chunk
        pad = F - len(chunk)
        chunk = chunk + [chunk[-1]] * pad

        depth_u16 = np.stack([c["depth"] for c in chunk])
        t0 = time.perf_counter()
        i420_h = 0
        if cfg.rgb_transfer == "yuv420" and all(
            "rgb_i420" in c for c in chunk
        ):
            # pass-through (the ADVICE r4 finding): the client pushed the
            # camera's native packed 4:2:0 planes and the session transfers
            # yuv420 — upload the planes VERBATIM. Zero host transcode on
            # the push path and a single chroma rounding (the client's).
            rgb_u8 = np.stack([c["rgb_i420"] for c in chunk])
            i420_h = self._frame_hw[0]
        else:
            # u8 entries (or a mixed-format chunk: decode its i420 frames)
            from ..core.yuv import i420_to_rgb_u8

            rgb_u8 = np.stack([
                i420_to_rgb_u8(c["rgb_i420"][None])[0]
                if "rgb_i420" in c else c["rgb"]
                for c in chunk
            ])
            if cfg.rgb_transfer == "yuv420":
                from ..core.yuv import i420_compatible, rgb_u8_to_i420

                if i420_compatible(rgb_u8.shape[1], rgb_u8.shape[2]):
                    i420_h = rgb_u8.shape[1]
                    rgb_u8 = rgb_u8_to_i420(rgb_u8)
                elif not getattr(self, "_warned_i420", False):
                    # crash here and the push loop retries forever with
                    # "integration deferred"; degrade to u8 transfer instead
                    self._warned_i420 = True
                    warnings.warn(
                        f"rgb_transfer=yuv420 needs H % 4 == 0 and "
                        f"W % 2 == 0, got {rgb_u8.shape[1:3]}; live session "
                        f"falls back to u8 transfer", stacklevel=2,
                    )
        rgb_dev, depth_dev = quantized_chunk_to_device(
            rgb_u8, depth_u16, depth_upsample=self._depth_scale,
            rgb_i420_height=i420_h,
        )
        if self._mesh is not None and F % self._mesh.devices.size == 0:
            # frame-shard the chunk so the CLIP/kMaX forwards GSPMD-
            # partition over the mesh (same as fuse_scan's sharded path)
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            rgb_dev = jax.device_put(
                rgb_dev, NamedSharding(self._mesh, P("d", None, None, None))
            )
        feat_imgs = self.clip.img_inference_tiled_batch(
            rgb_dev, cfg.clip_patch_size, cfg.clip_patch_stride
        )
        # same capability-priority label chain as fuse_scan (shared helper
        # — the two ingestion paths cannot diverge)
        labels = (
            None if self.seg is None
            else labels_for_chunk(
                self.seg,
                getattr(self.seg, "run_on_image", None),
                rgb_dev, n_real, cfg,
                geometry=(
                    (depth_u16,
                     np.stack([c["K"] for c in chunk]),
                     np.stack([c["pose"] for c in chunk]))
                    if getattr(self.seg, "needs_geometry", False) else None
                ),
            )
        )
        self.timings["inference_s"] += time.perf_counter() - t0

        batch = FrameBatch(
            depth=depth_dev,
            rgb=rgb_dev,
            pose=jnp.asarray(np.stack([c["pose"] for c in chunk])),
            K=jnp.asarray(np.stack([c["K"] for c in chunk])),
            feat_img=feat_imgs,
            labels=None if labels is None else jnp.asarray(labels),
            frame_valid=jnp.asarray(
                np.array([True] * n_real + [False] * (F - n_real))
            ),
        )
        t0 = time.perf_counter()
        integ = self._integrator()
        # compiled Pallas targets TPU; off-TPU the kernel interprets
        pallas_interp = not self.on_tpu
        if self._mesh is not None:
            if self._shard_step is None:
                from ..parallel.sharded import make_sharded_integrate

                self._shard_step = make_sharded_integrate(
                    self._mesh, self.grid, batch, rgb_mode=cfg.rgb_mode,
                    integrator=self._shard_integrator(),
                    pallas_tile=cfg.pallas_tile,
                    pallas_interpret=pallas_interp,
                    label_vote_mode=cfg.label_vote_mode,
                    capacity=cfg.sparse_capacity,
                    brick_size=cfg.brick_size,
                    brick_capacity=cfg.brick_capacity,
                )
            self.grid = self._shard_step(self.grid, batch)
        elif integ in ("sparse", "brick"):
            self._integrate_compact(integ, batch)
        elif integ == "pallas":
            from ..grid.fusion import integrate_frames_pallas

            self.grid = integrate_frames_pallas(
                self.grid, batch, rgb_mode=cfg.rgb_mode,
                tile=cfg.pallas_tile, interpret=pallas_interp,
                label_vote_mode=cfg.label_vote_mode,
            )
        elif integ == "einsum":
            self.grid = integrate_frames_einsum(
                self.grid, batch, rgb_mode=cfg.rgb_mode,
                label_vote_mode=cfg.label_vote_mode,
            )
        else:
            self.grid = integrate_frames(
                self.grid, batch, rgb_mode=cfg.rgb_mode,
                label_vote_mode=cfg.label_vote_mode,
            )
        self.timings["integrate_s"] += time.perf_counter() - t0
        self.frames_integrated += n_real
        if self._warm_enabled and self._warm_thread is None:
            # hand the thread its own grid copy NOW (we hold the session
            # lock here): the thread must never take the lock itself —
            # end() joins it while holding the lock, which would deadlock
            self._warm_thread = threading.Thread(
                target=self._warm_end_programs, daemon=True,
                name="live-warm", args=(self._copy_grid_locked(),),
            )
            self._warm_thread.start()

    def _integrate_compact(self, integ: str, batch):
        """sparse/brick integration with the pipeline's AdaptiveCap slot
        budgets, carried chunk-over-chunk as session state (a live stream
        has no fixed scan length, so the budgets tune over the stream's own
        history — same controller as fuse_scan)."""
        from ..pipeline import AdaptiveCap

        cfg = self.cfg
        n_buf = self.grid.tsdf_sum.shape[0]
        if self._sparse_cap is None:
            self._sparse_cap = AdaptiveCap.for_sparse(n_buf, cfg)
        if integ == "brick":
            from ..grid.brick import integrate_frames_brick

            if self._brick_cap is None:
                self._brick_cap = AdaptiveCap.for_brick(n_buf, cfg)
            self.grid, nbc, cnt = integrate_frames_brick(
                self.grid, batch, rgb_mode=cfg.rgb_mode,
                brick_size=cfg.brick_size,
                brick_capacity=self._brick_cap.value,
                capacity=self._sparse_cap.value, with_count=True,
                label_vote_mode=cfg.label_vote_mode,
            )
            if cfg.brick_capacity == 0:
                self._brick_cap.observe(nbc)
        else:
            from ..grid.fusion import integrate_frames_sparse

            self.grid, cnt = integrate_frames_sparse(
                self.grid, batch, rgb_mode=cfg.rgb_mode,
                capacity=self._sparse_cap.value, with_count=True,
                label_vote_mode=cfg.label_vote_mode,
            )
        if cfg.sparse_capacity == 0:
            self._sparse_cap.observe(cnt)

    def _warm_end_programs(self, grid):
        """Background pre-warm of every end()-path executable the session's
        grid shape determines: the finalize_grid read-side ops, the preview
        finalize, the bucket-keyed vertex samplers, and the query-path
        vertex normalizer. Runs once, right after the first integrated
        chunk, on its OWN grid copy (taken under the lock at spawn; this
        thread never locks — end() joins it while holding the lock); all
        compiles/cache-loads then ride the scanning period. Never raises —
        a warm failure only costs latency at live_end."""
        try:
            import numpy as _np

            from ..grid.voxel_grid import finalize_grid as _finalize
            from ..meshing.extract import (
                FLAT_BUCKET,
                VERT_BUCKET,
                warm_vertex_samplers,
            )

            vals = _finalize(grid)
            # force completion with scalar readbacks (dispatch is async and
            # block_until_ready is unreliable over this tunnel)
            float(vals["tsdf"][0])
            float(vals["feat"][0, 0])
            if "class_id" in vals:
                int(vals["class_id"][0])
            feat_rows = int(vals["feat"].shape[0])
            feat_dim = int(vals["feat"].shape[-1])
            del vals

            from .manager import _normalize_feats, _preview_finalize

            tsdf_dev, _w = _preview_finalize(grid)
            float(tsdf_dev[0])
            del tsdf_dev, _w, grid

            n_logical = int(_np.prod([int(v) for v in self.nvox]))
            host_rows = -(-n_logical // FLAT_BUCKET) * FLAT_BUCKET
            warm_vertex_samplers(feat_rows, host_rows, feat_dim)

            import jax.numpy as jnp

            nf = _normalize_feats(
                jnp.zeros((VERT_BUCKET, feat_dim), jnp.float32)
            )
            float(nf[0, 0])
            self.warm_state = "done"
        except Exception as e:  # pragma: no cover - depends on backend
            self.warm_state = f"failed: {type(e).__name__}: {e}"

    # -- snapshot ------------------------------------------------------------

    def _copy_grid_locked(self):
        """On-device copy of the live grid, dispatched while HOLDING the
        session lock. The integrators are jitted with donate_argnums=(0,)
        (grid/fusion.py), so the buffers behind `self.grid` are invalidated
        the moment the next chunk's integrate is dispatched — a bare
        reference handed to a reader outside the lock would raise "Array has
        been deleted" mid-device_get on TPU. Copies dispatched here are
        ordered before any later donating program (both happen under the
        lock), so the returned arrays stay valid for reads outside the lock
        while pushes keep streaming. Cost: one HBM pass over the grid
        (~ms), dispatched async."""
        import jax
        import jax.numpy as jnp

        return jax.tree_util.tree_map(jnp.copy, self.grid)

    def snapshot_state(self) -> Optional[dict]:
        """Current grid + counters for serialization, safe to device_get
        outside the session lock (see _copy_grid_locked for why a copy is
        required). Returns None before the first integrated chunk."""
        with self.lock:
            if self.grid is None:
                return None
            return {
                "grid": self._copy_grid_locked(),
                "frames_integrated": self.frames_integrated,
                "maxbound": np.array(self.maxbound, np.float32),
                "nvox": [int(v) for v in self.nvox],
                "voxel_size": self.cfg.voxel_size,
            }

    def prime_from_snapshot(self, grid, origin, maxbound, nvox,
                            frames_integrated: int):
        """Install a restored grid into a FRESH session (manager.live_resume
        fast path): the first `frames_integrated` staged frames are already
        fused into `grid`, so the replay starts after them. Exact for the
        same reason full replay is — the accumulators are order-independent
        sums, and staged order == integration order (FIFO pending queue)."""
        with self.lock:
            if self.grid is not None or self.frames_seen:
                raise ValueError(
                    "prime_from_snapshot requires a fresh session"
                )
            if self._mesh is not None:
                from ..parallel.sharded import shard_grid

                grid = shard_grid(self._mesh, grid)
            self.grid = grid
            self.origin = np.asarray(origin, np.float32)
            self.maxbound = np.asarray(maxbound, np.float32)
            self.nvox = [int(v) for v in nvox]
            self.frames_integrated = int(frames_integrated)
            self.frames_seen = int(frames_integrated)

    # -- preview / end -------------------------------------------------------

    def preview_grid(self):
        """A read-safe copy of the live grid for _preview_mesh_from_grid
        (None before the first integrated chunk). Copied for the same
        donation reason as snapshot_state: the preview finalize reads the
        grid outside the session lock, concurrent with donating pushes."""
        with self.lock:
            if self.grid is None:
                return None
            return self._copy_grid_locked()

    def end(self):
        """Integrate the tail, finalize, and return
        (FusionResult, persisted-frame arrays)."""
        with self.lock:
            if self.ended:
                raise ValueError("live session already ended")
            if self.frames_seen == 0:
                # validated BEFORE marking ended: a frameless end() leaves
                # the session usable (the client can keep pushing or abort)
                raise ValueError("live session received no frames")
            self.ended = True
            # deferred chunks (see push) + the partial tail; a persistent
            # integration failure surfaces HERE, where the client expects
            # a definitive answer
            F = self.cfg.frame_chunk
            while len(self.pending) >= F:
                self._integrate(self.pending[:F], n_real=F)
                self.pending = self.pending[F:]
            if self.pending:
                tail = self.pending
                self.pending = []
                self._integrate(tail, n_real=len(tail))
            self._ensure_grid()  # < chunk frames total: build from tail

            # an in-flight warm is compiling the very programs finalize
            # needs next; let it finish rather than racing a duplicate
            # compile through the serialized remote helper
            if self._warm_thread is not None and self._warm_thread.is_alive():
                import os

                self._warm_thread.join(
                    timeout=float(
                        os.environ.get("SAI_LIVE_WARM_JOIN_S", "600") or 0
                    )
                )

            n_logical = int(np.prod([int(v) for v in self.nvox]))
            values = {}
            for k, v in finalize_grid(self.grid).items():
                if k == "feat":
                    values[k] = v  # stays device-resident, bucket-padded
                else:
                    values[k] = np.asarray(v)[:n_logical]
            result = FusionResult(
                grid=self.grid,
                values=values,
                nvox=tuple(int(v) for v in self.nvox),
                origin=self.origin,
                config=self.cfg,
                timings=dict(self.timings),
            )
            if self.staging_dir is not None:
                # frames live on disk as staged parts; the manager
                # consolidates them into the version dir
                return result, None
            # i420-pushed frames kept their planes (ndim 2) on the hot
            # path; the one-time decode to the durable u8 format runs here
            from ..core.yuv import i420_to_rgb_u8

            persist = {
                "rgb": np.stack([
                    i420_to_rgb_u8(f[None])[0] if f.ndim == 2 else f
                    for f in self._rgb_u8
                ]),
                "depth": np.stack(self._depth_u16),
                "pose": np.stack(self._poses),
                "K": np.stack(self._Ks),
            }
            return result, persist
