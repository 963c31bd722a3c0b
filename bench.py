"""Benchmark: CLIP-feature TSDF fusion throughput on one TPU chip.

Workload matches the reference's default iPhone operating point
(BASELINE.md): 1024x768 RGB-D frames, CLIP ViT-B/32 patch 256 / stride 128
(7x5 = 35 patches/frame), voxel 0.04 m grid (~0.5M voxels), TSDF + RGB +
512-dim CLIP feature + 143-class label fusion.

Metric: end-to-end fused frames/sec/chip (tiled CLIP encode + grid
integration, steady state). Baseline: the driver's north star is a 500-frame
scan queryable in < 30 s on v5e-8 => 16.7 fps on 8 chips => 2.083 fps/chip.
vs_baseline = fps / 2.083 (>1 beats the target pro-rated per chip).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
After the contract line, the default run also executes the FULL labeled
pipeline (kMaX@1281 + CLIP + fusion + flood fill + meshes + text query) and
prints its north-star line — scan_to_queryable_s_500frame_8chip_est_full,
with variance tells — to stderr, so the driver tail records it
(SAI_BENCH_FULL_SKIP=1 disables; SAI_BENCH_FULL=1 runs only that mode with
the line on stdout).
"""
import contextlib
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


# Probe program for FRESH subprocess clients during outage recovery (the
# wedged parent's client cannot be reused: a hung dispatch has no cancel).
_PROBE_SRC = (
    "import sys; sys.path.insert(0, {bench_dir!r}); "
    "from spatially_aware_ai_tpu.utils.cache import "
    "enable_compilation_cache; enable_compilation_cache(); "
    "import jax.numpy as jnp; "
    "print(float((jnp.ones((8, 128)) + 1.0)[0, 0]))"
).format(bench_dir=os.path.dirname(os.path.abspath(__file__)))


def _probe_link_upload(with_download=False):
    """Measure host->device link bandwidth with a 16 MiB incompressible
    payload (a zeros probe would overstate health if any transport layer
    compresses). The first transfer+readback of a shape compiles/loads the
    getitem program through this sandbox's SERIALIZED remote-compile helper
    (seconds warm, minutes cold) — so warm with one throwaway transfer and
    time the second, otherwise up_mb_s is systematically understated and
    the conservative 8-chip estimate degenerates toward the no-parallelism
    bound. Returns (up_mb_s, down_mb_s) — down is None unless requested."""
    import jax.numpy as jnp

    mb = 16 * 1024 * 1024 / 1e6
    warm, probe = (
        np.random.default_rng(s).integers(
            0, 256, 16 * 1024 * 1024, dtype=np.uint8
        )
        for s in (0, 1)
    )
    warm_d = jnp.asarray(warm)
    float(warm_d[0])  # compile + first-use costs land here, not in the timer
    t0 = time.perf_counter()
    probe_d = jnp.asarray(probe)
    float(probe_d[0])
    up_mb_s = mb / max(time.perf_counter() - t0, 1e-9)
    if not with_download:
        return up_mb_s, None
    np.asarray(warm_d)  # warm the device->host path too
    t0 = time.perf_counter()
    np.asarray(probe_d)
    down_mb_s = mb / max(time.perf_counter() - t0, 1e-9)
    return up_mb_s, down_mb_s


def _require_reachable_device(deadline_s: float):
    """Gate on backend health; WAIT for recovery through a transient outage.

    The sandbox's TPU rides a remote tunnel with observed multi-hour
    outages; a first device op then blocks forever and the whole bench
    hangs with no diagnostic. Probe a trivial dispatch+sync in a daemon
    thread; if it doesn't complete within a short window (a healthy-but-
    cold tunnel needs ~3 min for its first small compile) or errors
    (UNAVAILABLE at backend init), this process's client is wedged — so
    poll for recovery with FRESH subprocess probes and, on the first
    healthy one, re-exec the bench with a clean client (bounded to
    SAI_BENCH_REEXEC_LEFT times, deadline shared across re-execs via
    SAI_BENCH_PROBE_T0). If the deadline passes first, print the reason
    to stderr and exit 3 WITHOUT printing a metric line (a 0-value metric
    would read as a perf regression rather than an infra outage).
    Override the deadline with SAI_BENCH_DEVICE_DEADLINE_S; 0 disables."""
    import subprocess
    import threading

    if deadline_s <= 0:
        return
    try:
        t0 = float(os.environ.get("SAI_BENCH_PROBE_T0", "0") or 0)
    except ValueError:
        t0 = 0.0
    t0 = t0 or time.time()
    deadline = t0 + deadline_s
    # one-shot test hook: pretend THIS process's client is wedged (popped so
    # a re-exec'd child comes up healthy) — lets tests/test_bench_smoke.py
    # drive the recovery + re-exec path without a real outage
    if os.environ.pop("SAI_BENCH_FORCE_UNHEALTHY", None) == "1":
        reason = "forced unhealthy (SAI_BENCH_FORCE_UNHEALTHY test hook)"
    else:
        done = {}

        def probe():
            try:
                import jax.numpy as jnp

                done["rt"] = float((jnp.ones((8, 128)) + 1.0)[0, 0])
            except Exception as e:  # pragma: no cover - backend specific
                done["err"] = f"{type(e).__name__}: {e}"

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(max(min(240.0, deadline - time.time()), 30.0))
        if not t.is_alive() and "err" not in done:
            # healthy: clear the shared-deadline marker so later child
            # processes (full-bench subphases, a re-run with this env)
            # don't inherit an already-spent deadline
            os.environ.pop("SAI_BENCH_PROBE_T0", None)
            return
        reason = (
            "trivial dispatch+sync blocked (wedged client)"
            if t.is_alive()
            else f"probe failed: {done['err']}"
        )
    # entering the recovery loop: share the deadline with re-exec'd children
    os.environ["SAI_BENCH_PROBE_T0"] = repr(t0)
    print(
        f"bench: device probe unhealthy ({reason}); polling for backend "
        f"recovery for up to {max(deadline - time.time(), 0):.0f}s more",
        file=sys.stderr,
        flush=True,
    )
    try:
        left = int(os.environ.get("SAI_BENCH_REEXEC_LEFT", "3"))
    except ValueError:
        left = 3
    recovered_no_budget = False
    while time.time() < deadline:  # pragma: no cover - timing dependent
        timed_out = False
        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", _PROBE_SRC],
                    # a cold first compile over this tunnel can need ~3 min;
                    # give recovery probes the same 240 s window as the
                    # in-process first probe so a recovering-but-cold backend
                    # isn't misdiagnosed (and its probe isn't killed, which
                    # would orphan a compile in the serialized remote helper)
                    timeout=max(min(240.0, deadline - time.time()), 10.0),
                    capture_output=True,
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:
            ok = False
            timed_out = True
        if ok:
            if left <= 0:
                recovered_no_budget = True
                break
            os.environ["SAI_BENCH_REEXEC_LEFT"] = str(left - 1)
            print(
                "bench: backend recovered; re-exec with a clean client "
                f"({left} re-exec(s) left)",
                file=sys.stderr,
                flush=True,
            )
            sys.stdout.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        # a KILLED probe leaves its compile running server-side and the
        # next probe queues behind it — back off hard after a timeout
        backoff = 180.0 if timed_out else 30.0
        time.sleep(max(min(backoff, deadline - time.time()), 0.0))
    if recovered_no_budget:
        print(
            "bench: backend recovered but the re-exec budget is exhausted; "
            "this process's client is wedged (not a backend outage) — "
            "aborting without a metric line; re-run to get a number",
            file=sys.stderr,
        )
    else:
        print(
            f"bench: device unreachable ({reason}; no recovery within "
            f"{deadline_s:.0f}s) — backend/tunnel outage, not a perf "
            f"result; aborting without a metric line",
            file=sys.stderr,
        )
    raise SystemExit(3)


def main():
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.data import SyntheticSceneDataset
    from spatially_aware_ai_tpu.grid.fusion import integrate_frames
    from spatially_aware_ai_tpu.grid.voxel_grid import FrameBatch, create_grid
    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine

    # SAI_BENCH_TINY=1: same code path at toy scale (tiny CLIP tower,
    # quarter-res frames) so the driver-facing contract is testable on CPU
    # (tests/test_bench_smoke.py); numbers are meaningless in this mode.
    tiny = os.environ.get("SAI_BENCH_TINY") == "1"
    W, H = (256, 192) if tiny else (1024, 768)
    PATCH, STRIDE = (64, 32) if tiny else (256, 128)
    F = int(os.environ.get("SAI_BENCH_CHUNK", "8"))  # frames per chunk
    REPEATS = 2 if tiny else 6  # timed chunks (after warmup)

    # --- build a realistic frame chunk (render small, upsample like the
    # iPhone ingest path does for depth) ---
    ds = SyntheticSceneDataset(num_frames=F, width=W // 4, height=H // 4)
    rgbs, depths, poses, Ks = [], [], [], []
    for i in range(F):
        f = ds[i]
        rgbs.append(np.kron(f.rgb, np.ones((4, 4, 1), np.float32)))
        depths.append(np.kron(f.depth, np.ones((4, 4), np.float32)))
        poses.append(f.pose)
        K = f.K.copy()
        K[0] *= 4
        K[1] *= 4
        Ks.append(K)
    rgbs = np.stack(rgbs).astype(np.float32)
    depths = np.stack(depths).astype(np.float32)
    poses = np.stack(poses).astype(np.float32)
    Ks = np.stack(Ks).astype(np.float32)

    # --- grid at the reference's default scale: ~57x56x55 voxels at
    # 0.04 m. SAI_BENCH_VOXEL overrides the voxel size over the same world
    # bounds (0.02 -> 8x the voxel count) for fine-grid integrator A/Bs. ---
    vox = float(os.environ.get("SAI_BENCH_VOXEL", "0.04"))
    scale = 0.04 / vox
    nvox = tuple(int(np.ceil(d * scale)) for d in (57, 56, 55))
    origin = np.array([-1.2, -0.7, -1.2], np.float32)

    engine = ClipEngine.tiny() if tiny else ClipEngine.random(seed=0)

    grid = create_grid(
        origin, vox, nvox, trunc=3 * vox,
        feature_dim=engine.feature_dim, with_labels=True, pad_to=1024,
        min_padding=1,
    )

    labels = np.stack(
        [np.kron(ds.render_labels(i), np.ones((4, 4), np.int32)) for i in range(F)]
    )
    labels[labels < 0] = 133

    rgbs_d = jnp.asarray(rgbs)
    depths_d = jnp.asarray(depths)
    poses_d = jnp.asarray(poses)
    Ks_d = jnp.asarray(Ks)
    labels_d = jnp.asarray(labels)

    # integrator selection: the sparse-active-voxel integrator is the TPU
    # default (exact; dense fallback on overflow; biggest wins at fine
    # grids). SAI_BENCH_INTEGRATOR=scan|einsum|pallas|sparse|brick overrides
    # ("brick" adds frustum culling of the dense TSDF pass, grid/brick.py).
    integrator = os.environ.get("SAI_BENCH_INTEGRATOR") or (
        "sparse" if jax.default_backend() == "tpu" else "scan"
    )
    if integrator not in ("scan", "einsum", "pallas", "sparse", "brick"):
        raise SystemExit(f"unknown SAI_BENCH_INTEGRATOR {integrator!r}")
    brick_caps: dict = {}  # sized at warmup from the measured cull

    def run_integrate(grid, batch):
        if integrator == "pallas":
            from spatially_aware_ai_tpu.grid.fusion import (
                integrate_frames_pallas,
            )

            return integrate_frames_pallas(grid, batch, tile=512)
        elif integrator == "einsum":
            from spatially_aware_ai_tpu.grid.fusion import (
                integrate_frames_einsum,
            )

            return integrate_frames_einsum(grid, batch)
        elif integrator == "sparse":
            from spatially_aware_ai_tpu.grid.fusion import (
                integrate_frames_sparse,
            )

            return integrate_frames_sparse(grid, batch)
        elif integrator == "brick":
            from spatially_aware_ai_tpu.grid.brick import (
                active_brick_mask,
                integrate_frames_brick,
            )

            if not brick_caps:
                # size the static budgets from the measured frustum-brick
                # count (the production pipeline adapts these from observed
                # counts; the bench reuses one chunk, so one probe sizes
                # them exactly) — the default NB//2 budget could silently
                # take the sparse fallback and mislabel the A/B
                B = 128
                mask = np.asarray(active_brick_mask(grid, batch, B))
                nb, NB = int(mask.sum()), int(mask.size)
                cap = min(NB, ((nb * 5 // 4 + 63) // 64) * 64)
                brick_caps.update(B=B, nb=nb, NB=NB, cap=cap)
            return integrate_frames_brick(
                grid, batch, brick_size=brick_caps["B"],
                brick_capacity=brick_caps["cap"],
            )
        return integrate_frames(grid, batch)

    def run_chunk(grid):
        feat_imgs = engine.img_inference_tiled_batch(rgbs_d, PATCH, STRIDE)
        batch = FrameBatch(
            depth=depths_d, rgb=rgbs_d, pose=poses_d, K=Ks_d,
            feat_img=feat_imgs, labels=labels_d,
            frame_valid=jnp.ones((F,), bool),
        )
        return run_integrate(grid, batch)

    def sync(grid):
        # NOTE: block_until_ready is not a reliable sync on the axon tunnel
        # backend; a scalar readback forces full execution.
        float(grid.tsdf_sum[0])

    # warmup / compile
    t0 = time.perf_counter()
    grid = run_chunk(grid)
    sync(grid)
    compile_s = time.perf_counter() - t0

    # chunks dispatch asynchronously (as in the production pipeline); one
    # sync at the end measures pipelined throughput.
    # SAI_BENCH_TRACE=<logdir> wraps the timed loop in a jax.profiler device
    # trace (utils/profiling.trace_to) for TensorBoard op-level attribution;
    # trace overhead lands inside the timed window, so treat the fps of a
    # traced run as diagnostic, not the headline.
    trace_dir = os.environ.get("SAI_BENCH_TRACE")
    trace_ctx = (
        __import__(
            "spatially_aware_ai_tpu.utils.profiling",
            fromlist=["trace_to"],
        ).trace_to(trace_dir)
        if trace_dir
        else contextlib.nullcontext()
    )
    # best-of-2 timed passes (VERDICT r3 weak #4 / next #8): one sick-tunnel
    # pass can otherwise print a regression as the round's record. The max
    # is the headline (both passes run identical device work; the delta is
    # tunnel/host noise) and the spread is published so the artifact itself
    # says how healthy the run was.
    passes = []
    with trace_ctx:
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(REPEATS):
                grid = run_chunk(grid)
            sync(grid)
            passes.append(time.perf_counter() - t0)
    elapsed = min(passes)
    fps = (REPEATS * F) / elapsed
    spread_pct = (max(passes) - min(passes)) / max(passes) * 100.0

    # --- per-phase timings (attributable regressions, VERDICT r1 weak #7):
    # encode-only, then integrate-only on a fixed feature image ---
    feat_imgs = engine.img_inference_tiled_batch(rgbs_d, PATCH, STRIDE)
    float(feat_imgs[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        feat_imgs = engine.img_inference_tiled_batch(rgbs_d, PATCH, STRIDE)
    float(feat_imgs[0, 0, 0, 0])
    encode_s = time.perf_counter() - t0

    batch = FrameBatch(
        depth=depths_d, rgb=rgbs_d, pose=poses_d, K=Ks_d,
        feat_img=feat_imgs, labels=labels_d,
        frame_valid=jnp.ones((F,), bool),
    )
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        grid = run_integrate(grid, batch)
    sync(grid)
    integrate_s = time.perf_counter() - t0

    # tunnel-health probe: the axon host<->device link's bandwidth varies
    # run to run (measured 17-200 MB/s down); publishing it with every
    # bench makes cross-run comparisons honest
    up_mb_s, down_mb_s = _probe_link_upload(with_download=True)
    link = {
        "upload_mb_s": round(up_mb_s, 1),
        "download_mb_s": round(down_mb_s, 1),
    }

    baseline_fps_per_chip = 500.0 / 30.0 / 8.0  # north star pro-rated per chip
    result = {
        "metric": "fusion_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps_per_chip, 3),
        "best_of": 2,
        "pass_spread_pct": round(spread_pct, 1),
    }
    print(json.dumps(result))
    # extra diagnostics on stderr (driver reads stdout's single line)
    diag = {
        "compile_s": round(compile_s, 2),
        "chunk_frames": F,
        "timed_chunks": REPEATS,
        "integrator": integrator,
        "grid_nvox": list(nvox),
        "patches_per_frame": 35,
        "device": str(jax.devices()[0]),
        "phase_encode_fps": round(REPEATS * F / encode_s, 1),
        "phase_integrate_fps": round(REPEATS * F / integrate_s, 1),
        "link": link,
        "est_500frame_scan_s_on_8chips_clip_only": round(500.0 / (fps * 8), 2),
    }
    if brick_caps:
        diag["brick_cull"] = {
            "frustum_bricks": brick_caps["nb"],
            "total_bricks": brick_caps["NB"],
            "brick_capacity": brick_caps["cap"],
            "culled_fraction": round(
                1 - brick_caps["nb"] / max(1, brick_caps["NB"]), 3
            ),
        }
    # memory: memory_stats() returns nothing over the axon tunnel; publish a
    # real number or none at all (never a fake 0.0 — VERDICT r1 weak #3)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            diag["peak_hbm_gb"] = round(peak / 1e9, 3)
        else:
            live = sum(
                x.nbytes for x in jax.live_arrays()
                if getattr(x, "nbytes", None)
            )
            diag["live_jax_arrays_gb"] = round(live / 1e9, 3)
            diag["peak_hbm_gb_note"] = (
                "memory_stats() unavailable on this backend; "
                "live_jax_arrays_gb is the tracked-buffer sum, not a peak"
            )
    except Exception:
        pass
    print(json.dumps(diag), file=sys.stderr)


class _ArrayDataset:
    """Minimal FrameDataset over in-memory arrays, with the production
    loaders' quantized-transfer and native-depth capabilities so the full
    bench pays the same upload bytes as the real iPhone ingest path
    (uint8 rgb; native low-res uint16 depth cubic-enlarged on device,
    core/upsample.py)."""

    def __init__(self, rgb, depth, pose, K, depth_native_u16=None,
                 native_depth_scale=0):
        self.rgb, self.depth, self.pose, self.K = rgb, depth, pose, K
        self.rgb_u8 = np.clip(np.rint(rgb * 255.0), 0, 255).astype(np.uint8)
        self.depth_native_u16 = depth_native_u16
        if depth_native_u16 is not None and native_depth_scale > 1:
            self.native_depth_scale = native_depth_scale

    def __len__(self):
        return len(self.rgb)

    def stacked(self, idx):
        idx = list(idx)
        return {
            "rgb": self.rgb[idx], "depth": self.depth[idx],
            "pose": self.pose[idx], "K": self.K[idx],
        }

    def stacked_u8(self, idx, native_depth=False):
        idx = list(idx)
        out = {
            "rgb": self.rgb_u8[idx], "depth": self.depth[idx],
            "pose": self.pose[idx], "K": self.K[idx],
        }
        if native_depth:
            out["depth"] = self.depth_native_u16[idx]
            out["depth_upsample"] = self.native_depth_scale
        return out

    def bounds_samples(self):
        """49-pixel bounds subsample per frame, like production FrameDataset
        loaders (data/base.py): the bounds pass then never copies whole
        depth frames on this 1-vCPU host."""
        from spatially_aware_ai_tpu.core.bounds import subsample_grid

        H, W = self.depth.shape[1:3]
        uu, vv = subsample_grid(W, H)
        return self.depth[:, vv, uu], uu, vv, self.pose, self.K


def build_full_dataset(T, W, H, native=True):
    """Synthetic frames at the full-bench operating point: render
    quarter-res, 4x kron-upsample rgb/depth like the iPhone ingest path,
    and keep the sensor-native low-res uint16-mm depth for the device-side
    cubic enlarge (core/upsample.py). Shared by main_full and
    benchmarks/trace_full_chunk.py so a traced workload can never drift
    from the scoreboard one."""
    from spatially_aware_ai_tpu.data import SyntheticSceneDataset

    base = SyntheticSceneDataset(num_frames=8, width=W // 4, height=H // 4)
    rgbs, depths, depths_u16, poses, Ks = [], [], [], [], []
    for i in range(T):
        f = base[i % 8]
        rgbs.append(np.kron(f.rgb, np.ones((4, 4, 1), np.float32)))
        depths.append(np.kron(f.depth, np.ones((4, 4), np.float32)))
        depths_u16.append(
            np.clip(np.rint(f.depth * 1000.0), 0, 65535).astype(np.uint16)
        )
        poses.append(f.pose)
        K = f.K.copy()
        K[0] *= 4
        K[1] *= 4
        Ks.append(K)
    return _ArrayDataset(
        np.stack(rgbs).astype(np.float32),
        np.stack(depths).astype(np.float32),
        np.stack(poses).astype(np.float32),
        np.stack(Ks).astype(np.float32),
        depth_native_u16=np.stack(depths_u16) if native else None,
        native_depth_scale=4,
    )


_FULL_ABORT = None  # threading.Event set by _run_full_guarded's watchdog


def _abort_checkpoint(phase: str):
    """Phase-boundary budget check for the guarded full bench: raising here
    (caught by _run_full_guarded) lets an over-budget run die BETWEEN device
    dispatches instead of being os._exit'd mid-compile — a killed compile
    client orphans its job in the sandbox's serialized remote-compile helper
    and queues everyone behind it."""
    if _FULL_ABORT is not None and _FULL_ABORT.is_set():
        raise TimeoutError(
            f"full-bench budget exceeded (SAI_BENCH_FULL_DEADLINE_S) — "
            f"stopped at phase boundary {phase!r}"
        )


def main_full(out=None):
    """The HONEST full labeled pipeline (VERDICT r1 #3) — kMaX ConvNeXt-L
    panoptic inference at the reference's 1281 long edge + tiled CLIP +
    label fusion on every frame, then flood fill + mesh + per-object meshes
    + a text query. Prints one JSON line with the estimated 500-frame
    scan -> queryable seconds on 8 chips, segmentation included.

    Standalone (SAI_BENCH_FULL=1) the line goes to stdout; in the default
    combined run it goes to stderr (out=sys.stderr) so the driver's
    one-stdout-line contract holds while the tail still captures the
    north-star estimate (VERDICT r2 next #1)."""
    out = out or sys.stdout
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.models.kmax import KmaxSegmenter
    from spatially_aware_ai_tpu.pipeline import FusionConfig, fuse_scan
    from spatially_aware_ai_tpu.meshing.extract import extract_mesh_by_object
    from spatially_aware_ai_tpu.scene.objects import flood_fill_3d

    tiny = os.environ.get("SAI_BENCH_FULL_TINY") == "1"  # CPU smoke test
    W, H = (256, 192) if tiny else (1024, 768)
    T = int(os.environ.get("SAI_BENCH_FULL_FRAMES", "8" if tiny else "24"))
    CHUNK = int(os.environ.get("SAI_BENCH_FULL_CHUNK", "4" if tiny else "8"))
    # None lets the segmenter pick its backend default (bf16 on TPU);
    # SAI_KMAX_BF16=0/1 forces f32/bf16 explicitly
    dtype = {None: None, "1": jnp.bfloat16, "0": jnp.float32}[
        os.environ.get("SAI_KMAX_BF16")
    ]

    # native depth = the iPhone sensor's form (low-res uint16 mm): the
    # pipeline uploads THAT and cubic-enlarges on device
    # (SAI_BENCH_NATIVE_DEPTH=0 reverts to full-res uploads for A/B)
    native = os.environ.get("SAI_BENCH_NATIVE_DEPTH", "1") != "0"
    ds = build_full_dataset(T, W, H, native=native)

    voxel = float(os.environ.get("SAI_BENCH_FULL_VOXEL",
                                  "0.06" if tiny else "0.04"))
    if tiny:
        engine = ClipEngine.tiny()
        seg = KmaxSegmenter.tiny()
        cfg = FusionConfig(
            voxel_size=voxel, with_labels=True, frame_chunk=CHUNK,
            clip_patch_size=64, clip_patch_stride=32,
            integrator=os.environ.get("SAI_BENCH_INTEGRATOR") or None,
            shard_voxels=os.environ.get("SAI_SHARD_VOXELS") == "1",
            rgb_transfer=os.environ.get("SAI_BENCH_RGB_TRANSFER", "u8"),
            segment_stride=int(os.environ.get("SAI_BENCH_SEG_STRIDE", "1")),
        )
    else:
        engine = ClipEngine.random(seed=0)
        seg = KmaxSegmenter(compute_dtype=dtype)  # ConvNeXt-L @ 1281
        cfg = FusionConfig(
            voxel_size=voxel, with_labels=True, frame_chunk=CHUNK,
            clip_patch_size=256, clip_patch_stride=128,
            # None = pipeline auto (sparse on TPU); SAI_BENCH_INTEGRATOR
            # A/Bs the full pipeline too (e.g. brick, grid/brick.py); the
            # deployment knob SAI_SHARD_VOXELS=1 A/Bs the voxel-sharded
            # shard_map step (1-device mesh on this host)
            integrator=os.environ.get("SAI_BENCH_INTEGRATOR") or None,
            shard_voxels=os.environ.get("SAI_SHARD_VOXELS") == "1",
            rgb_transfer=os.environ.get("SAI_BENCH_RGB_TRANSFER", "u8"),
            segment_stride=int(os.environ.get("SAI_BENCH_SEG_STRIDE", "1")),
        )

    # --- kMaX-only throughput: device-resident input, one sync across the
    # reps (the old per-call f32-upload + label-download "sync roundtrip"
    # measured the tunnel, not the model — it swung 26 -> 0.9 fps with link
    # health while the device time was constant) ---
    import jax.numpy as _jnp

    _abort_checkpoint("setup")
    chunk_rgb_dev = _jnp.asarray(ds.rgb[:CHUNK])
    seg_out = seg.run_on_batch_fused_labels(chunk_rgb_dev, as_numpy=False)
    float(_jnp.ravel(seg_out)[0].astype(_jnp.float32))  # compile + warmup

    def kmax_pass(reps=3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out_dev = seg.run_on_batch_fused_labels(
                chunk_rgb_dev, as_numpy=False
            )
        float(_jnp.ravel(out_dev)[0].astype(_jnp.float32))
        return reps * CHUNK / (time.perf_counter() - t0)

    # best-of-2: the r4 record captured 26.41 fps in a sick window while
    # healthy same-round runs measured 30.4-32.0 (VERDICT r4 weak #5); both
    # passes run identical device work, so the delta is tunnel noise
    kmax_fps = max(kmax_pass(), kmax_pass())

    # --- full pipeline: warmup scan (compiles), then timed scan ---
    def drain(res):
        # fuse_scan returns with the CLIP feature-grid finalize chain still
        # in flight by design (values["feat"] stays on device, unsliced);
        # force its completion with a scalar readback (block_until_ready is
        # unreliable over this tunnel). Without this barrier the warmup
        # scan's drain lands INSIDE the timed run's host bounds pass on
        # this 1-vCPU host (observed: bounds_s 12 s vs 0.03 s quiet).
        float(_jnp.ravel(res.values["feat"])[0].astype(_jnp.float32))

    _abort_checkpoint("kmax_throughput")
    run = lambda: fuse_scan(ds, engine, cfg, segmenter=seg.run_on_image)
    drain(run())  # warmup/compile, fully drained
    _abort_checkpoint("warmup_scan")

    # --- timed scan: best-of with health gating (VERDICT r4 next #1).
    # BENCH_r04 minted its north-star line from ONE timed scan in a window
    # its own tells flagged as sick (link probe 1.4 MB/s vs 14-18 healthy,
    # kMaX 26.4 fps vs 30.4-32, fuse_wall 12.2 s vs 2.2 in r3) while a
    # healthy-window run the same round measured 5.13 s. So: always run 2
    # timed scans; if the best still trips the documented sick tells
    # (CLAUDE.md healthy bands), keep re-running up to SAI_BENCH_FULL_MAX
    # _PASSES while the phase-budget watchdog allows. The line publishes
    # best-of count, spread, and the tells it gated on, so the artifact
    # itself says how healthy the record is. ---
    def timed_pass(run_fn=None):
        t0 = time.perf_counter()
        res = (run_fn or run)()
        fw = time.perf_counter() - t0
        t0 = time.perf_counter()
        # the timed scan's own feat-finalize tail: a real per-scan cost,
        # but a once-per-scan grid-sized one — measured separately and
        # charged with the finalize term instead of letting the 500/T
        # frame scaling multiply it
        drain(res)
        return res, fw, time.perf_counter() - t0

    # the kMaX fps tell's healthy band (30-32) is calibrated to the bf16
    # TPU default; a documented f32 run (SAI_KMAX_BF16=0) legitimately
    # measures ~18-22 and must not trip the gate. Likewise the bounds_s
    # band (healthy < 1.1 s) is per-24-frames: it scales with T.
    kmax_tell_applies = (
        dtype is not jnp.float32 and jax.default_backend() == "tpu"
    )
    bounds_sick_s = 4.0 * max(1.0, T / 24.0)

    def is_sick(fuse_walls, kmax_fps, bounds_s, link_up):
        # test hook: report sick until N passes have run, so the
        # re-run/re-probe loop is exercisable on CPU (tests/
        # test_bench_smoke.py) without a real sick window
        forced = os.environ.get("SAI_BENCH_FORCE_SICK_PASSES")
        if forced:
            if len(fuse_walls) < int(forced):
                return [f"forced sick (test hook, until {forced} passes)"]
            return []
        tells = []
        if not tiny:
            if kmax_tell_applies and kmax_fps < 24.0:
                tells.append(f"kmax_fps {kmax_fps:.1f} < 24 (healthy 30-32)")
            if bounds_s > bounds_sick_s:
                tells.append(
                    f"bounds_s {bounds_s:.1f} > {bounds_sick_s:.0f} "
                    f"(healthy <{1.1 * max(1.0, T / 24.0):.1f} at T={T})"
                )
            if link_up is not None and link_up < 5.0:
                tells.append(
                    f"link_upload {link_up:.1f} MB/s < 5 (healthy 14-18)"
                )
            if len(fuse_walls) >= 2:
                spread = (max(fuse_walls) - min(fuse_walls)) / max(fuse_walls)
                if spread > 0.35:
                    tells.append(f"pass spread {spread * 100:.0f}% > 35%")
        return tells

    max_passes = int(os.environ.get(
        "SAI_BENCH_FULL_MAX_PASSES", "2" if tiny else "4"))
    result, fuse_wall, feat_drain_s = timed_pass()
    fuse_walls = [fuse_wall]
    link_up_probe = None
    for _ in range(max_passes - 1):
        if len(fuse_walls) >= 2:
            # past the mandatory best-of-2, only re-run on sick tells
            if link_up_probe is None:
                link_up_probe, _ = _probe_link_upload()
            if not is_sick(fuse_walls, kmax_fps,
                           float(result.timings.get("bounds_s", 0.0)),
                           link_up_probe):
                break
            link_up_probe = None  # re-probe after the extra pass
        _abort_checkpoint(f"timed_scan_pass_{len(fuse_walls)}")
        res, fw, fd = timed_pass()
        fuse_walls.append(fw)
        if fw < fuse_wall:
            result, fuse_wall, feat_drain_s = res, fw, fd
        else:
            del res
        kmax_fps = max(kmax_fps, kmax_pass())
    pass_spread_pct = (
        (max(fuse_walls) - min(fuse_walls)) / max(fuse_walls) * 100.0
    )
    full_fps = T / fuse_wall

    # --- post-processing once per scan: flood fill + meshes + query.
    # Run it twice, like the fusion phase: the first pass loads the
    # bucket-stable sampler programs from the persistent compile cache
    # (a one-time per-process cost, dominated by the sandbox's serialized
    # remote-compile tunnel), the second pass is the per-scan cost a
    # server actually pays for every scan after the first. ---
    def run_postproc(result):
        nvox = result.nvox
        class_grid = result.values["class_id"].reshape(nvox)
        feats = result.feat_grid
        rgbg = result.values["rgb"].reshape(*nvox, 3)
        synthetic_labels = False
        if not ((class_grid >= 0) & (class_grid != 133)).any():
            # random kMaX weights label everything null, which would make
            # the flood-fill timing trivially fast; synthesize spatially-
            # contiguous classes over observed voxels so post-proc cost is
            # realistic. Block size 6 yields ~150-250 connected components
            # at the default 0.04 m grid — the object-count regime the
            # production postproc path was measured at (r2: 200 objects /
            # 195K faces; VERDICT r3 weak #5 flagged the old 12-block
            # variant's 46 objects as unrealistically light).
            synthetic_labels = True
            occ = (result.values["weight"].reshape(nvox) > 0)
            blk = int(os.environ.get("SAI_BENCH_BLOB_VOX", "6"))
            ix, iy, iz = np.indices(nvox)
            blob = ((ix // blk) * 3 + (iy // blk) * 5 + (iz // blk)) % 24
            class_grid = np.where(occ, blob.astype(np.int32), 133)
        t0 = time.perf_counter()
        knowledge, voxel_obj_idx = flood_fill_3d(class_grid, None, feats,
                                                 rgbg)
        flood_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        mesh = result.extract_mesh(voxel_obj_idx=voxel_obj_idx.reshape(-1),
                                   feats_on_device=True)  # production path
        mesh_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_obj_meshes = 0
        for key, info in knowledge["unique_objects"].items():
            ov, of, oc = extract_mesh_by_object(
                mesh["verts_world"], mesh["faces"], mesh["colors"],
                mesh["obj_idx"], info["object_index"],
            )
            n_obj_meshes += 1
        objmesh_s = time.perf_counter() - t0
        return (knowledge, mesh, synthetic_labels, n_obj_meshes,
                flood_s, mesh_s, objmesh_s)

    _abort_checkpoint("timed_scan")
    (*_, mesh_cold_s, _) = run_postproc(result)  # warmup: sampler programs
    _abort_checkpoint("postproc_warmup")
    (knowledge, mesh, synthetic_labels, n_obj_meshes,
     flood_s, mesh_s, objmesh_s) = run_postproc(result)

    # text query against the vertex CLIP features (scan -> QUERYABLE)
    t0 = time.perf_counter()
    vert_feats = jnp.asarray(mesh["clip_feats"])
    rel = engine.run_query(vert_feats, ["background", "a chair"])
    float(rel[0, 0])
    query_s = time.perf_counter() - t0
    # steady-state query latency (first query pays one-time text-tower /
    # matmul compiles, cached persistently across processes)
    t0 = time.perf_counter()
    rel = engine.run_query(vert_feats, ["background", "a red suitcase"])
    float(rel[0, 0])
    query_warm_s = time.perf_counter() - t0
    postproc_s = flood_s + mesh_s + objmesh_s + query_warm_s

    # finalize (sum->value grid division + label argmax) runs ONCE per scan
    # and scales with grid size, not frame count: charge it once instead of
    # letting the frames/s extrapolation multiply it by 500/T. The per-frame
    # terms (kMaX + CLIP + integrate + bounds + dispatch) stay in the scaled
    # fuse wall.
    finalize_s = float(result.timings.get("finalize_s", 0.0)) + feat_drain_s
    per_frame_wall = max(fuse_wall - (finalize_s - feat_drain_s), 1e-6)
    est_scan_s = (500.0 * per_frame_wall / T) / 8 + finalize_s + postproc_s

    # --- conservative 8-chip estimate (VERDICT r3 next #3): the optimistic
    # line divides the WHOLE per-frame wall by 8, but on a real single-host
    # v5e-8 the host-side numpy (bounds pass) and the host->device upload
    # link are SHARED across the 8 chips, not 8x'd. Split the fuse wall
    # into (host bounds + link upload + everything else) and scale only the
    # last term. The link term is estimated from the bytes this scan
    # actually uploads and a fresh 16 MB incompressible probe; on this
    # sandbox's ~12-25 MB/s tunnel it dominates and the conservative line
    # is pessimistic vs real PCIe (>1 GB/s), which is the honest direction
    # for a conservative bound. ---
    bounds_s = float(result.timings.get("bounds_s", 0.0))
    up_mb_s = link_up_probe
    if up_mb_s is None:
        up_mb_s, _ = _probe_link_upload()
    rgb_bytes = ds.rgb_u8.nbytes
    if cfg.rgb_transfer == "yuv420":
        rgb_bytes = rgb_bytes // 2
    if ds.depth_native_u16 is not None:
        depth_bytes = ds.depth_native_u16.nbytes
    else:
        depth_bytes = ds.depth.size * 2  # u16 mm quantized transfer
    # VERDICT r4 next #2: with the raw sandbox probe in the denominator the
    # "conservative" bound measured the tunnel, not the architecture (r4:
    # probe 1.4 MB/s -> 228 s). A production single-host v5e-8 feeds chips
    # over PCIe gen3 x16 (>= ~12 GB/s per direction); floor the deployment
    # link assumption at 1 GB/s — an order of magnitude below PCIe — and
    # publish BOTH the floored bound and the raw sandbox-link figure so the
    # artifact separates architecture from sandbox plumbing.
    link_floor_mb_s = float(
        os.environ.get("SAI_BENCH_LINK_FLOOR_MB_S", "1000"))
    link_s_sandbox = (rgb_bytes + depth_bytes) / 1e6 / up_mb_s
    link_s = (rgb_bytes + depth_bytes) / 1e6 / max(up_mb_s, link_floor_mb_s)

    def cons_est(link_term_s):
        shared_s = min(bounds_s + link_term_s, per_frame_wall)
        return ((500.0 / T) * ((per_frame_wall - shared_s) / 8 + shared_s)
                + finalize_s + postproc_s)

    est_scan_s_cons = cons_est(link_s)
    est_scan_s_cons_sandbox = cons_est(link_s_sandbox)
    # single-chip measured wall for THIS scan (VERDICT r3 next #2): at
    # SAI_BENCH_FULL_FRAMES=500 this is the real 500-frame measurement the
    # est formula extrapolates to — no division by 8, no 500/T scaling.
    measured_scan_s_1chip = fuse_wall + feat_drain_s + postproc_s
    sick_tells = is_sick(fuse_walls, kmax_fps, bounds_s, up_mb_s)
    result_line = {
        "metric": "scan_to_queryable_s_500frame_8chip_est_full",
        "value": round(est_scan_s, 2),
        "unit": "s",
        "vs_baseline": round(30.0 / est_scan_s, 3),  # >1 beats the 30 s target
        # best-of + spread (VERDICT r4 next #1): identical device work per
        # pass; the spread IS the tunnel/host noise of this window
        "best_of": len(fuse_walls),
        "pass_spread_pct": round(pass_spread_pct, 1),
        # variance tells (VERDICT r2 next #1): bounds_s is the host/tunnel
        # health canary (1.1 s healthy, 28+ s sick); kMaX device fps is the
        # stable cross-check (~30 on a healthy run); link probe healthy
        # band 14-18 MB/s — a slow estimate with healthy tells means host
        # contention, not a regression
        "kmax_device_fps_per_chip": round(kmax_fps, 2),
        "bounds_s": round(bounds_s, 2),
        "link_upload_mb_s": round(up_mb_s, 1),
        "health": "degraded: " + "; ".join(sick_tells) if sick_tells
                  else "ok",
        # host/link terms NOT divided by 8 (shared on a single-host v5e-8);
        # link term floored at the documented deployment assumption, raw
        # sandbox-tunnel variant published alongside (VERDICT r4 next #2)
        "value_conservative": round(est_scan_s_cons, 2),
        "link_assumption_mb_s": link_floor_mb_s,
        "value_conservative_sandbox_link": round(est_scan_s_cons_sandbox, 2),
        "measured_scan_s_1chip": round(measured_scan_s_1chip, 2),
        "measured_frames": T,
    }
    print(json.dumps(result_line), file=out, flush=True)
    print(
        json.dumps(
            {
                # device-side fused-labels throughput (device-resident
                # input, labels stay on device — the production path)
                "kmax_device_fps_per_chip": round(kmax_fps, 2),
                "full_pipeline_fps_per_chip": round(full_fps, 2),
                "fuse_wall_s": round(fuse_wall, 2),
                "feat_drain_s": round(feat_drain_s, 2),
                "postproc_s": round(postproc_s, 2),
                "postproc_phases_s": {
                    "flood_fill": round(flood_s, 2),
                    "mesh": round(mesh_s, 2),
                    "mesh_first": round(mesh_cold_s, 2),
                    "obj_meshes": round(objmesh_s, 2),
                    "query_first": round(query_s, 2),
                    "query_warm": round(query_warm_s, 3),
                },
                "timings": {k: round(v, 2) for k, v in
                            result.timings.items()},
                "upload_mb": round((rgb_bytes + depth_bytes) / 1e6, 1),
                "link_upload_mb_s": round(up_mb_s, 1),
                "link_s_est_floored": round(link_s, 2),
                "link_s_est_sandbox": round(link_s_sandbox, 2),
                "est_conservative_s": round(est_scan_s_cons, 2),
                "est_conservative_s_sandbox_link": round(
                    est_scan_s_cons_sandbox, 2),
                "fuse_wall_passes_s": [round(w, 2) for w in fuse_walls],
                "n_objects": len(knowledge["unique_objects"]),
                "n_obj_meshes": n_obj_meshes,
                "synthetic_labels_for_postproc": synthetic_labels,
                "n_verts": int(len(mesh["verts_world"])),
                "frames": T,
                "chunk": CHUNK,
                "voxel_size": voxel,
                "nvox": [int(v) for v in np.asarray(result.nvox).reshape(3)],
                "kmax_dtype": str(
                    getattr(seg, "compute_dtype", np.float32).__name__
                ),
                "device": str(jax.devices()[0]),
            }
        ),
        file=sys.stderr,
    )

    # --- fast profile (VERDICT r4 next #3): segment_stride=2 +
    # frame_chunk=16 is the one surviving device-side lever (kMaX is ~85%
    # of device compute; batching plateaus at B=8, int8 and tile-DMA
    # measured negative). Device-side win 1.50-1.63x from the measured
    # batch curve; quality cost converged to ~-1 pt mIoU at >=96-frame
    # scans (docs/ROADMAP.md stride section). The sandbox wall is
    # link-bound so the wall here can read neutral — the artifact line is
    # the evidence the preset exists and what it costs. Preset documented
    # in docs/OPERATIONS.md ("fast" profile). SAI_BENCH_FAST_PROFILE=0
    # skips. ---
    if os.environ.get("SAI_BENCH_FAST_PROFILE", "1") == "1":
        import dataclasses

        _abort_checkpoint("fast_profile_setup")
        fp_chunk = 4 if tiny else 16
        # T must be a chunk multiple or the tail chunk is mostly padding
        # and the per-frame wall overstates (measured: T=24/chunk=16 made
        # the 2nd chunk half pad slots -> fuse_wall 2x). Tile the frames
        # cyclically up to the next multiple and normalize by fp_T.
        fp_T = ((T + fp_chunk - 1) // fp_chunk) * fp_chunk
        if fp_T != T:
            idx = [i % T for i in range(fp_T)]
            fp_ds = _ArrayDataset(
                ds.rgb[idx], ds.depth[idx], ds.pose[idx], ds.K[idx],
                depth_native_u16=(None if ds.depth_native_u16 is None
                                  else ds.depth_native_u16[idx]),
                native_depth_scale=getattr(ds, "native_depth_scale", 0),
            )
        else:
            fp_ds = ds
        fp_cfg = dataclasses.replace(
            cfg, segment_stride=2, frame_chunk=fp_chunk)
        fp_run = lambda: fuse_scan(fp_ds, engine, fp_cfg,
                                   segmenter=seg.run_on_image)
        drain(fp_run())  # warmup/compile
        _abort_checkpoint("fast_profile_warmup")
        fp_walls, fp_best = [], None
        for i in range(2):
            fp_res, fp_w, fp_d = timed_pass(fp_run)
            fp_walls.append(fp_w)
            if fp_best is None or fp_w < fp_best[1]:
                fp_best = (fp_res, fp_w, fp_d)
            else:
                del fp_res
            _abort_checkpoint(f"fast_profile_pass_{i}")
        fp_res, fp_wall, fp_drain = fp_best
        fp_finalize = float(
            fp_res.timings.get("finalize_s", 0.0)) + fp_drain
        fp_per_frame = max(fp_wall - (fp_finalize - fp_drain), 1e-6)
        fp_est = (500.0 * fp_per_frame / fp_T) / 8 + fp_finalize + postproc_s
        fp_bounds = float(fp_res.timings.get("bounds_s", 0.0))
        fp_link_s = link_s * fp_T / T  # tiled frames upload more bytes
        fp_shared = min(fp_bounds + fp_link_s, fp_per_frame)
        fp_cons = ((500.0 / fp_T)
                   * ((fp_per_frame - fp_shared) / 8 + fp_shared)
                   + fp_finalize + postproc_s)
        print(json.dumps({
            "metric": "scan_to_queryable_s_500frame_8chip_est_fast_profile",
            "value": round(fp_est, 2),
            "unit": "s",
            "vs_baseline": round(30.0 / fp_est, 3),
            "preset": {"segment_stride": 2, "frame_chunk": fp_chunk},
            "best_of": len(fp_walls),
            "pass_spread_pct": round(
                (max(fp_walls) - min(fp_walls)) / max(fp_walls) * 100.0, 1),
            # measured on the hermetic GT eval: stride-2 mIoU penalty
            # converges -2.6 -> -1.0 pts by 96-160-frame scans
            # (docs/ROADMAP.md); co-observed label flips < 1%
            "quality_cost_miou_pts": -1.0,
            "quality_cost_note": "converged at >=96-frame scans; "
                                 "-2.6 pts on 32-frame short scans "
                                 "(docs/ROADMAP.md stride section)",
            "device_side_speedup_measured": "1.50-1.63x (kMaX batch curve; "
                                            "sandbox wall is link-bound)",
            "value_conservative": round(fp_cons, 2),
            "link_assumption_mb_s": link_floor_mb_s,
            "fuse_wall_s": round(fp_wall, 2),
            "bounds_s": round(fp_bounds, 2),
            "measured_scan_s_1chip": round(
                fp_wall + fp_drain + postproc_s, 2),
            "measured_frames": fp_T,
            # always stderr: the stdout single-line contract holds in both
            # standalone (SAI_BENCH_FULL=1) and combined modes; the driver
            # tail captures stderr
        }), file=sys.stderr, flush=True)


def _run_full_guarded():
    """Default-mode tail: run the full labeled pipeline AFTER the contract
    line so the driver's BENCH_r{N}.json tail carries the north-star
    estimate (VERDICT r2 next #1). The contract line is already on stdout,
    so this section must never hang or fail the process: a watchdog thread
    hard-exits 0 with a reason line if the full bench outlives its budget
    (mid-run tunnel outage / degraded host), and exceptions degrade to a
    reason line instead of a traceback."""
    import threading

    budget = float(os.environ.get("SAI_BENCH_FULL_DEADLINE_S", "2100"))
    # grace window between "budget exceeded" (graceful: the next phase
    # boundary raises) and the hard os._exit backstop. The backstop stays —
    # a wedged tunnel never reaches a phase boundary — but it should be the
    # LAST resort: hard-killing this process mid-compile orphans the job in
    # the sandbox's serialized remote-compile helper (CLAUDE.md quirk).
    grace = float(os.environ.get("SAI_BENCH_FULL_ABORT_GRACE_S", "420"))
    if budget > 0:
        global _FULL_ABORT
        _FULL_ABORT = threading.Event()
        abort_evt = _FULL_ABORT

        def watchdog():  # pragma: no cover - timing dependent
            time.sleep(budget)
            abort_evt.set()  # phase boundaries in main_full now raise
            time.sleep(grace)
            print(
                json.dumps(
                    {
                        "full_pipeline": "aborted",
                        "reason": (
                            f"full bench exceeded {budget:.0f}s "
                            f"(SAI_BENCH_FULL_DEADLINE_S) + {grace:.0f}s "
                            "grace without reaching a phase boundary — "
                            "tunnel outage or degraded host mid-run; the "
                            "fused contract line above stands"
                        ),
                    }
                ),
                file=sys.stderr,
                flush=True,
            )
            os._exit(0)

        threading.Thread(target=watchdog, daemon=True).start()
    if os.environ.get("SAI_BENCH_TINY") == "1":
        # keep the combined flow testable on CPU (tests/test_bench_smoke.py)
        os.environ.setdefault("SAI_BENCH_FULL_TINY", "1")
    try:
        main_full(out=sys.stderr)
    except BaseException as e:  # noqa: BLE001 - contract line already out
        if isinstance(e, KeyboardInterrupt):
            raise
        print(
            json.dumps(
                {
                    "full_pipeline": "failed",
                    "reason": f"{type(e).__name__}: {e}",
                }
            ),
            file=sys.stderr,
            flush=True,
        )


if __name__ == "__main__":
    # health gate covers BOTH modes (the full bench used to skip it and
    # could hang forever on a tunnel outage); persistent compile cache ON
    # before the first probe dispatch so the gate itself is warm
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _require_reachable_device(
        float(os.environ.get("SAI_BENCH_DEVICE_DEADLINE_S", "900"))
    )
    if os.environ.get("SAI_BENCH_FULL") == "1":
        main_full()
    else:
        main()
        # VERDICT r2 next #1: the default driver run also captures the full
        # labeled pipeline estimate (kMaX@1281 + CLIP + fusion + flood fill
        # + meshes + query) on stderr. SAI_BENCH_FULL_SKIP=1 restores the
        # fused-only bench.
        if os.environ.get("SAI_BENCH_FULL_SKIP") != "1":
            _run_full_guarded()
