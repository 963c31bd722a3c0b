"""Trace the FULL labeled pipeline's steady-state chunk and quantify the
device-timeline bubble share (VERDICT r4 next #6).

CLIP ~37% / kMaX ~30% MFU stand on measured negative probes (int8,
tile-DMA, fused attention — docs/SOL.md); what was never quantified is how
much of the ~0.6 s full-pipeline chunk is device IDLE (dispatch gaps, host
serialization, transfer waits) vs busy. This script:

1. builds the full operating point (kMaX ConvNeXt-L bf16 @1281 + random
   CLIP + labeled fusion, 24 frames / chunk 8 — same as bench.py
   main_full),
2. warms one scan (compiles), then traces ONE timed scan with
   jax.profiler,
3. parses the emitted chrome-trace (.trace.json.gz) and reports, per
   device track, the busy-time sum and the merged-interval busy span vs
   the traced wall — bubble = 1 - busy/wall.

Run on a HEALTHY tunnel window (trace overhead + a sick link both inflate
the gap share; check the link probe in the output before trusting it).

Usage: python benchmarks/trace_full_chunk.py [logdir]
Prints one JSON line; exits 2 if no parseable trace file was produced.
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_and_trace(logdir):
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.models.kmax import KmaxSegmenter
    from spatially_aware_ai_tpu.pipeline import FusionConfig, fuse_scan

    # bench.py main_full's OWN frame builder — shared so the traced
    # workload cannot drift from the scoreboard one
    import bench

    W, H = 1024, 768
    T = int(os.environ.get("SAI_TRACE_FRAMES", "24"))
    CHUNK = 8
    # SAI_TRACE_VOXEL=0.02 traces the fine-grid regime, where the 500-frame
    # measurement suggested integrate (not kMaX) may own the device time
    voxel = float(os.environ.get("SAI_TRACE_VOXEL", "0.04"))
    ds = bench.build_full_dataset(T, W, H)
    engine = ClipEngine.random(seed=0)
    seg = KmaxSegmenter()
    cfg = FusionConfig(
        voxel_size=voxel, with_labels=True, frame_chunk=CHUNK,
        clip_patch_size=256, clip_patch_stride=128,
    )

    def drain(res):
        float(jnp.ravel(res.values["feat"])[0].astype(jnp.float32))

    run = lambda: fuse_scan(ds, engine, cfg, segmenter=seg.run_on_image)
    t0 = time.perf_counter()
    drain(run())  # warmup/compile
    warm_s = time.perf_counter() - t0

    import jax.profiler

    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        res = run()
        drain(res)
    wall_s = time.perf_counter() - t0
    return {"frames": T, "chunk": CHUNK, "voxel": voxel,
            "warmup_s": round(warm_s, 2),
            "traced_wall_s": round(wall_s, 3),
            "fuse_timings": {k: round(v, 3) for k, v in
                             res.timings.items()}}


def merged_busy_us(events):
    """Union length of [ts, ts+dur) intervals, microseconds."""
    iv = sorted((e["ts"], e["ts"] + e["dur"]) for e in events)
    total, cur_lo, cur_hi = 0.0, None, None
    for lo, hi in iv:
        if cur_hi is None or lo > cur_hi:
            if cur_hi is not None:
                total += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
        else:
            cur_hi = max(cur_hi, hi)
    if cur_hi is not None:
        total += cur_hi - cur_lo
    return total


def analyze(logdir):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None, glob.glob(os.path.join(logdir, "**", "*"),
                               recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    pid_names, tid_names = {}, {}
    complete = []
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
        elif e.get("ph") == "X" and "dur" in e:
            complete.append(e)
    if not complete:
        return None, [path]
    t_lo = min(e["ts"] for e in complete)
    t_hi = max(e["ts"] + e["dur"] for e in complete)
    span_us = t_hi - t_lo
    tracks = {}
    for e in complete:
        key = (e["pid"], e.get("tid"))
        tracks.setdefault(key, []).append(e)
    rows = []
    for (pid, tid), evs in tracks.items():
        rows.append({
            "process": pid_names.get(pid, str(pid)),
            "thread": tid_names.get((pid, tid), str(tid)),
            "events": len(evs),
            "sum_ms": round(sum(e["dur"] for e in evs) / 1e3, 1),
            "busy_ms": round(merged_busy_us(evs) / 1e3, 1),
        })
    rows.sort(key=lambda r: -r["busy_ms"])
    # device busy: merged intervals of every track whose process or thread
    # names the TPU / XLA op stream (host python/runtime tracks excluded)
    dev_events = [
        e for (pid, tid), evs in tracks.items() for e in evs
        if any(s in (pid_names.get(pid, "") +
                     tid_names.get((pid, tid), "")).lower()
               for s in ("tpu", "xla ops", "device"))
        and "python" not in pid_names.get(pid, "").lower()
    ]
    dev_busy_us = merged_busy_us(dev_events) if dev_events else 0.0
    # per-executable attribution: the "XLA Modules" track has one complete
    # event per jitted program run — summing by name says which program
    # (kMaX forward, integrate, CLIP encode, ...) owns the device time
    mod_sums = {}
    for (pid, tid), evs in tracks.items():
        if tid_names.get((pid, tid), "") == "XLA Modules":
            for e in evs:
                name = e.get("name", "?").split("(")[0][:60]
                mod_sums[name] = mod_sums.get(name, 0.0) + e["dur"]
    modules_top = sorted(
        ({"module": k, "sum_ms": round(v / 1e3, 1)}
         for k, v in mod_sums.items()),
        key=lambda r: -r["sum_ms"],
    )[:10]
    # data-movement attribution: the "XLA Ops" track has one event per HLO
    # op execution; summing the copy/reshape/pad families by op NAME (and
    # keeping each op's longest metadata string) says WHICH copies are the
    # 17% layout tax (SOL.md r5) — i.e. whether they sit at the Pallas
    # custom-call boundaries, in the resize/pasting path, or elsewhere.
    move_sums = {}
    for (pid, tid), evs in tracks.items():
        if tid_names.get((pid, tid), "") != "XLA Ops":
            continue
        for e in evs:
            name = e.get("name", "?")
            fam = name.split(".")[0].split("-")[0].lstrip("%")
            if fam not in ("copy", "reshape", "pad", "transpose",
                           "bitcast", "slice", "concatenate"):
                continue
            rec = move_sums.setdefault(name, {"dur": 0.0, "n": 0,
                                              "meta": ""})
            rec["dur"] += e["dur"]
            rec["n"] += 1
            args = e.get("args") or {}
            meta = str(args.get("long_name") or args.get("tf_op") or
                       args.get("source") or "")
            if len(meta) > len(rec["meta"]):
                rec["meta"] = meta
    movement_top = sorted(
        ({"op": k, "sum_ms": round(v["dur"] / 1e3, 2), "count": v["n"],
          "meta": v["meta"][:160]}
         for k, v in move_sums.items()),
        key=lambda r: -r["sum_ms"],
    )[:20]
    return {
        "trace_file": path,
        "span_ms": round(span_us / 1e3, 1),
        "device_busy_ms": round(dev_busy_us / 1e3, 1),
        "device_bubble_pct": round(100.0 * (1 - dev_busy_us /
                                            max(span_us, 1)), 1),
        "modules_top": modules_top,
        "movement_top": movement_top,
        "tracks_top": rows[:12],
    }, None


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5/trace_full"
    meta = build_and_trace(logdir)
    stats, leftovers = analyze(logdir)
    if stats is None:
        print(json.dumps({"error": "no .trace.json.gz produced",
                          "files": leftovers[:20], **meta}))
        raise SystemExit(2)
    print(json.dumps({**meta, **stats}))


if __name__ == "__main__":
    main()
