"""Deployment preflight: check the environment a serve/fuse run depends on.

Automates docs/OPERATIONS.md's manual checklist — run it on a new machine
(or in CI) before the first scan:

    python -m spatially_aware_ai_tpu.cli.doctor [--scan-dir D --scan-name N]
        [--json] [--device-timeout S]

Checks (each reported ok / warn / fail; exit code 1 iff any check fails):

- imports: jax/flax/optax importable, versions echoed
- device: backend reachable, device kind, round-trip latency of a trivial
  dispatch+sync (the probe runs in a daemon thread with a timeout — a hung
  remote-compile tunnel must not hang the doctor)
- compile_cache: persistent-cache dir resolved, writable, entry count/size
- weights: SAI_CLIP_CHECKPOINT / SAI_KMAX_CHECKPOINT / SAI_BPE_VOCAB —
  unset is a WARN (weight-free fallbacks exist, docs/OPERATIONS.md §1),
  set-but-missing/unreadable is a FAIL
- assets: the sai-fetch-assets dir (SAI_ASSET_DIR or the default cache
  location) — per-asset presence + sha256-vs-pin/lockfile status; a hash
  mismatch is a FAIL, absent assets are a WARN
- native: the C++ helper library (connected components, marching
  tetrahedra) builds/loads; pure-numpy fallbacks exist so failure is a warn
- knobs: every SAI_* environment override currently set
- scan (with --scan-dir/--scan-name): versions found, per-version artifact
  presence (reference-layout names via manager/paths.get_path)
"""
from __future__ import annotations

import argparse
import json
import os
import threading
import time


def _check_imports():
    out = {}
    try:
        import jax

        out["jax"] = jax.__version__
        import flax

        out["flax"] = flax.__version__
        import optax

        out["optax"] = getattr(optax, "__version__", "?")
        import numpy

        out["numpy"] = numpy.__version__
    except Exception as e:
        return {"status": "fail", "error": f"{type(e).__name__}: {e}",
                **out}
    return {"status": "ok", **out}


def _check_device(timeout_s: float):
    result = {}

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            devs = jax.devices()
            result["platform"] = devs[0].platform
            result["device_kind"] = devs[0].device_kind
            result["n_devices"] = len(devs)
            t0 = time.perf_counter()
            x = jnp.ones((8, 128), jnp.float32) + 1.0
            # scalar readback: the only reliable sync on remote tunnels
            float(x[0, 0])
            result["roundtrip_s"] = round(time.perf_counter() - t0, 3)
            result["status"] = "ok"
        except Exception as e:  # pragma: no cover - backend specific
            result["status"] = "fail"
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return {
            "status": "fail",
            "error": f"device probe still hanging after {timeout_s:.0f}s "
                     "(remote backend unreachable or compile queue stuck); "
                     "serving on this backend would hang too",
            **{k: v for k, v in result.items() if k != "status"},
        }
    return result


def _check_compile_cache():
    loc = os.environ.get("SAI_JAX_CACHE")
    if loc == "off":
        return {"status": "warn", "note": "disabled via SAI_JAX_CACHE=off "
                "(every process re-pays full compiles)"}
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache",
                           "spatially_aware_ai_tpu", "jax")
    out = {"dir": loc}
    try:
        os.makedirs(loc, exist_ok=True)
        probe = os.path.join(loc, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError as e:
        return {"status": "fail", "error": f"not writable: {e}", **out}
    entries = [f for f in os.listdir(loc) if not f.startswith(".")]
    out["entries"] = len(entries)
    out["size_mb"] = round(
        sum(os.path.getsize(os.path.join(loc, f)) for f in entries) / 1e6, 1
    )
    out["status"] = "ok"
    if not entries:
        out["note"] = ("empty: first run pays full compiles; warm with "
                       "`python bench.py` (docs/OPERATIONS.md §3)")
    return out


def _check_weights():
    out = {}
    status = "ok"
    for var, what in [
        ("SAI_CLIP_CHECKPOINT", "converted CLIP weights"),
        ("SAI_KMAX_CHECKPOINT", "converted kMaX weights"),
    ]:
        path = os.environ.get(var)
        if not path:
            out[var] = "unset (random-weight fallback; see OPERATIONS.md §1)"
            status = "warn" if status == "ok" else status
        elif not os.path.exists(path):
            out[var] = f"SET BUT MISSING: {path}"
            status = "fail"
        else:
            out[var] = f"{path} ({os.path.getsize(path) / 1e6:.1f} MB)"
    vocab = os.environ.get("SAI_BPE_VOCAB")
    if not vocab:
        out["SAI_BPE_VOCAB"] = (
            "unset (byte-fallback tokenizer; REQUIRED with a converted "
            "CLIP checkpoint)"
        )
        status = "warn" if status == "ok" else status
    elif not os.path.exists(vocab):
        out["SAI_BPE_VOCAB"] = f"SET BUT MISSING: {vocab}"
        status = "fail"
    else:
        from ..models.clip.tokenizer import ClipTokenizer

        try:
            standard = ClipTokenizer(vocab).has_standard_vocab
        except Exception as e:  # corrupt/binary/truncated file
            out["SAI_BPE_VOCAB"] = (
                f"SET BUT UNREADABLE: {vocab} ({type(e).__name__}: {e})"
            )
            status = "fail"
        else:
            if standard:
                out["SAI_BPE_VOCAB"] = f"{vocab} (standard merges loaded)"
            else:
                out["SAI_BPE_VOCAB"] = (
                    f"SET BUT NOT A MERGES TABLE: {vocab}"
                )
                status = "fail"
    # cross-check: converted CLIP weights + fallback vocab = garbage text
    # embeddings (ClipEngine.from_checkpoint refuses this combination)
    if os.environ.get("SAI_CLIP_CHECKPOINT") and not vocab:
        out["note"] = ("SAI_CLIP_CHECKPOINT without SAI_BPE_VOCAB will be "
                       "refused at engine construction")
        status = "fail"
    out["status"] = status
    return out


def _check_assets():
    """Report the conversion-day asset dir (sai-fetch-assets): presence and
    hash status of the BPE merges table and the two torch checkpoints. All
    three absent is a WARN (weight-free fallbacks exist); a hash mismatch
    against the pin/lockfile is a FAIL (corrupt or swapped asset)."""
    from .fetch_assets import DEFAULT_DEST, check_assets

    dest = os.environ.get("SAI_ASSET_DIR", DEFAULT_DEST)
    try:
        report = check_assets(dest)
    except Exception as e:  # pragma: no cover - fs-permission edge
        return {"status": "warn", "dir": dest,
                "error": f"{type(e).__name__}: {e}"}
    out = {"dir": dest}
    status = "ok"
    for name, r in report.items():
        out[name] = f"{r['status']}: {r['detail']}"
        if r["status"] == "mismatch":
            status = "fail"
        elif r["status"] == "missing" and status == "ok":
            status = "warn"
    if status == "warn":
        out["note"] = ("missing assets are fine offline; on a connected "
                       "machine run sai-fetch-assets (docs/MIGRATION.md)")
    out["status"] = status
    return out


def _check_native():
    try:
        from ..native import native_available

        if native_available():
            return {"status": "ok", "note": "C++ helpers loaded "
                    "(connected components, marching cubes/tetrahedra)"}
        return {"status": "warn",
                "note": "C++ build unavailable; pure-numpy/scipy fallbacks "
                        "in use (correct, slower on large scenes)"}
    except Exception as e:  # pragma: no cover
        return {"status": "warn", "error": f"{type(e).__name__}: {e}"}


def _check_knobs():
    knobs = {k: v for k, v in sorted(os.environ.items())
             if k.startswith("SAI_")}
    out = {"status": "ok", **({"set": knobs} if knobs else
                              {"note": "no SAI_* overrides set "
                                       "(measured defaults active)"})}
    # validate the high-blast-radius knobs (a typo would otherwise surface
    # as a ValueError at the first fusion, or worse, a silent perf cliff)
    integ = os.environ.get("SAI_INTEGRATOR")
    if integ and integ not in ("scan", "einsum", "pallas", "sparse",
                               "brick"):
        out["status"] = "fail"
        out["SAI_INTEGRATOR"] = (
            f"unknown value {integ!r} (scan|einsum|pallas|sparse|brick)"
        )
    votes = os.environ.get("SAI_LABEL_VOTES")
    if votes and votes not in ("uniform", "near_surface"):
        out["status"] = "fail"
        out["SAI_LABEL_VOTES"] = (
            f"unknown value {votes!r} (uniform|near_surface)"
        )
    rgbt = os.environ.get("SAI_RGB_TRANSFER")
    if rgbt and rgbt not in ("u8", "yuv420"):
        out["status"] = "fail"
        out["SAI_RGB_TRANSFER"] = (
            f"unknown value {rgbt!r} (u8|yuv420)"
        )
    extractor = os.environ.get("SAI_MESH_EXTRACTOR")
    if extractor and extractor not in ("mc", "mt"):
        out["status"] = "fail"
        out["SAI_MESH_EXTRACTOR"] = (
            f"unknown value {extractor!r} (mc|mt)"
        )
    warm = os.environ.get("SAI_LIVE_WARM")
    if warm and warm not in ("0", "1"):
        out["status"] = "fail"
        out["SAI_LIVE_WARM"] = f"unknown value {warm!r} (0|1)"
    if os.environ.get("SAI_SHARD_VOXELS") == "1":
        try:
            import jax

            n = len(jax.devices())
            if n < 2:
                out.setdefault("status", "ok")
                out["SAI_SHARD_VOXELS"] = (
                    f"set, but only {n} device visible — fusion will run "
                    f"unsharded (the knob is a no-op here)"
                )
                if out["status"] == "ok":
                    out["status"] = "warn"
        except Exception:  # pragma: no cover - backend probe best-effort
            pass
    return out


def _resolve_output_dir(scan_dir: str, scan_name: str,
                        explicit) -> str:
    """--output-dir wins; otherwise try the two common layouts — the serve
    default (./unity_output relative to the CWD) and the sibling layout
    (scan_dir/../unity_output) — preferring whichever already holds this
    scene's artifacts."""
    if explicit:
        return explicit
    candidates = ["unity_output",
                  os.path.join(scan_dir, "..", "unity_output")]
    for cand in candidates:
        if os.path.isdir(os.path.join(cand, scan_name)):
            return cand
    return candidates[0]


def _check_scan(scan_dir: str, scan_name: str, output_dir=None):
    from ..manager.paths import dotdict, get_path

    root = os.path.join(scan_dir, scan_name)
    if not os.path.isdir(root):
        return {"status": "fail", "error": f"no such scan: {root}"}
    vers = sorted(
        d for d in os.listdir(root)
        if d.startswith("v") and d[1:].isdigit()
    )
    if not vers:
        return {"status": "fail",
                "error": f"{root} has no vNN version directories"}
    output_dir = _resolve_output_dir(scan_dir, scan_name, output_dir)
    out = {"output_dir": output_dir, "versions": {}}
    for v in vers:
        n = int(v[1:])
        cfg = dotdict({"scan_dir": scan_dir, "scan_name": scan_name,
                       "output_dir": output_dir})
        processed = all(
            os.path.exists(get_path(cfg, n, k))
            for k in ("mesh_rgb", "scene_knowledge", "vertex_clip_feats")
        )
        frames = len([
            f for f in os.listdir(os.path.join(root, v))
            if not f.startswith(".")
        ])
        out["versions"][v] = {
            "files": frames,
            "processed": processed,
        }
    if not any(info["processed"] for info in out["versions"].values()):
        out["status"] = "warn"
        out["note"] = ("no processed versions found at this output_dir "
                       "(first serve boot reconstructs v00; or pass "
                       "--output-dir if artifacts live elsewhere)")
    else:
        out["status"] = "ok"
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="environment preflight for spatially_aware_ai_tpu"
    )
    parser.add_argument("--scan-dir")
    parser.add_argument("--scan-name")
    parser.add_argument("--output-dir", default=None,
                        help="artifact root for the scan check (default: "
                             "./unity_output or scan_dir/../unity_output, "
                             "whichever holds the scene)")
    parser.add_argument("--json", action="store_true")
    # a COLD remote-compile tunnel legitimately needs ~3 min for the first
    # trivial program (see bench.py's probe, deadline 900 s); 300 s keeps a
    # fresh-deployment preflight from failing a healthy backend
    parser.add_argument("--device-timeout", type=float, default=300.0)
    parser.add_argument("--no-device", action="store_true",
                        help="skip the backend probe (e.g. in offline CI)")
    args = parser.parse_args(argv)

    report = {"imports": _check_imports()}
    if not args.no_device:
        report["device"] = _check_device(args.device_timeout)
    report["compile_cache"] = _check_compile_cache()
    report["weights"] = _check_weights()
    report["assets"] = _check_assets()
    report["native"] = _check_native()
    report["knobs"] = _check_knobs()
    if args.scan_dir and args.scan_name:
        report["scan"] = _check_scan(args.scan_dir, args.scan_name,
                                     args.output_dir)

    failed = any(c.get("status") == "fail" for c in report.values())
    if args.json:
        print(json.dumps({"checks": report,
                          "ok": not failed}, indent=2))
    else:
        for name, c in report.items():
            status = c.get("status", "?")
            mark = {"ok": "ok  ", "warn": "WARN", "fail": "FAIL"}.get(
                status, "?   ")
            detail = {k: v for k, v in c.items() if k != "status"}
            print(f"[{mark}] {name}: "
                  + "; ".join(f"{k}={v}" for k, v in detail.items()))
        print("result:", "FAIL" if failed else "ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
