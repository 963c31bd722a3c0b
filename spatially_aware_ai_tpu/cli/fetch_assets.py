"""Conversion-day asset fetcher: download + verify the three public assets a
real-weight deployment needs, then print the exact convert/eval command chain.

The reference gets these implicitly through pip/open_clip/detectron2
(clipfusion.py:769-781 `open_clip.create_model_and_transforms(...,
pretrained="laion400m_e32")` + `open_clip.get_tokenizer`;
clip_seem_fusion.py:78-79 + handy_utils.py:29-51 for
`kmax/kmax_convnext_large.pth`). This sandbox has zero egress, so the fetch
is packaged as a first-run tool for a connected machine:

    sai-fetch-assets [--dest DIR]          # download + sha256-verify + lock
    sai-fetch-assets --check [--dest DIR]  # offline: presence + hash report

Assets:
  1. CLIP BPE merges table (`bpe_simple_vocab_16e6.txt.gz`, ~1.3 MB) from
     the openai/CLIP repo — required by ClipTokenizer for checkpoint-
     compatible text tokenization (engine refuses a converted checkpoint
     without it, models/clip/engine.py).
  2. open_clip ViT-B-32-quickgelu laion400m_e32 torch checkpoint from the
     open_clip release assets. The trailing `-46683a32` in the canonical
     filename is open_clip's own integrity contract: the first 8 hex chars
     of the file's sha256, which we verify the same way.
  3. kMaX-DeepLab ConvNeXt-L COCO panoptic checkpoint. The upstream project
     (bytedance/kmax-deeplab) publishes it through its model-zoo page rather
     than a stable direct URL — exactly as the reference README does ("please
     follow k-means mask Transformer for additional environment setup") — so
     this asset takes `--kmax-url <direct link>` or a manual drop into the
     dest dir; verification then pins whatever was fetched in the lockfile.

Every verified asset is recorded in `<dest>/assets.lock.json`
(name -> {sha256, size, source}); subsequent runs and `sai-doctor` re-verify
against the lock, so a corrupted or swapped file is caught before it reaches
a converter. All writes are tmp + os.replace (a killed download can never
leave a plausible-looking partial file).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

from ..utils.atomic import atomic_json_dump, atomic_path

# Default asset directory; doctor and the engines look here too.
DEFAULT_DEST = os.path.join(
    os.path.expanduser("~"), ".cache", "spatially_aware_ai_tpu", "assets"
)

# sha256 of bpe_simple_vocab_16e6.txt.gz as published in the openai/CLIP
# repo (the identical file ships inside open_clip and many vendored
# tokenizers). If upstream ever rotates the file, --trust-new-hash records
# the new digest in the lockfile after a human decision.
BPE_SHA256 = "924691ac288e54409236115652ad4aa250f48203de50a9e4722a6ecd48d6804a"

ASSETS = {
    "bpe_vocab": {
        "filename": "bpe_simple_vocab_16e6.txt.gz",
        "url": ("https://github.com/openai/CLIP/raw/main/clip/"
                "bpe_simple_vocab_16e6.txt.gz"),
        "sha256": BPE_SHA256,
        "env": "SAI_BPE_VOCAB",
        "what": "CLIP BPE merges table (tokenizer)",
    },
    "clip_checkpoint": {
        "filename": "vit_b_32-quickgelu-laion400m_e32-46683a32.pt",
        "url": ("https://github.com/mlfoundations/open_clip/releases/"
                "download/v0.2-weights/"
                "vit_b_32-quickgelu-laion400m_e32-46683a32.pt"),
        # open_clip's integrity contract: filename suffix = sha256[:8]
        "sha256_prefix": "46683a32",
        "env": None,  # feeds sai-convert-clip, not the runtime directly
        "what": "open_clip ViT-B-32-quickgelu laion400m_e32 torch weights",
    },
    "kmax_checkpoint": {
        "filename": "kmax_convnext_large.pth",
        "url": None,  # model-zoo hosted; pass --kmax-url or drop manually
        "zoo": "https://github.com/bytedance/kmax-deeplab",
        "env": None,  # feeds sai-convert-kmax
        "what": "kMaX-DeepLab ConvNeXt-L COCO panoptic torch weights",
    },
}


def _sha256(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _lock_path(dest: str) -> str:
    return os.path.join(dest, "assets.lock.json")


def _read_lock(dest: str) -> dict:
    try:
        with open(_lock_path(dest)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _write_lock(dest: str, lock: dict) -> None:
    atomic_json_dump(_lock_path(dest), lock, indent=2, sort_keys=True)


def _download(url: str, out_path: str) -> None:
    """Stream `url` to `out_path` atomically (utils/atomic.py: a killed
    download can never leave a plausible-looking partial file)."""
    import urllib.request

    with atomic_path(out_path) as tmp:
        with open(tmp, "wb") as f, urllib.request.urlopen(
            url, timeout=60
        ) as r:
            while True:
                b = r.read(1 << 20)
                if not b:
                    break
                f.write(b)


def verify_asset(name: str, path: str, lock: dict,
                 trust_new_hash: bool = False):
    """Return (status, detail). status in {ok, missing, mismatch}.

    Precedence: a lockfile digest that matches the file wins — the lock
    records either the first pin-verified fetch or an explicit
    --trust-new-hash human decision, and doctor/--check must honor it.
    Otherwise the file must satisfy the code pin (full sha256, or the
    open_clip filename-prefix contract); any disagreement is a mismatch
    unless --trust-new-hash explicitly re-records it."""
    spec = ASSETS[name]
    if not os.path.exists(path):
        return "missing", "not present"
    digest = _sha256(path)
    size = os.path.getsize(path)
    locked = lock.get(name, {}).get("sha256")
    if locked == digest:
        return "ok", f"sha256={digest[:12]}… size={size / 1e6:.1f} MB"
    expect = spec.get("sha256")
    prefix = spec.get("sha256_prefix")
    pin_ok = (not expect or digest == expect) and (
        not prefix or digest.startswith(prefix)
    )
    if pin_ok and not locked:
        lock[name] = {"sha256": digest, "size": size,
                      "source": spec.get("url") or "manual drop"}
        return "ok", f"sha256={digest[:12]}… size={size / 1e6:.1f} MB"
    if trust_new_hash:
        lock[name] = {"sha256": digest, "size": size,
                      "source": "trusted via --trust-new-hash"}
        return "ok", f"sha256={digest[:12]}… (NEW hash trusted into lock)"
    if not pin_ok:
        want = expect or f"{prefix}…(filename integrity prefix)"
        return "mismatch", (
            f"sha256 {digest} != pinned {want} (pass --trust-new-hash only "
            f"after verifying upstream rotated the file)"
        )
    return "mismatch", (
        f"sha256 {digest} != previously locked {locked} "
        f"(file changed since first verification)"
    )


def check_assets(dest: str = DEFAULT_DEST) -> dict:
    """Offline asset report used by this CLI's --check and by sai-doctor.

    Returns {name: {path, status, detail}} without touching the network and
    without mutating the lockfile.
    """
    lock = _read_lock(dest)
    report = {}
    for name, spec in ASSETS.items():
        path = os.path.join(dest, spec["filename"])
        status, detail = verify_asset(name, path, dict(lock))
        report[name] = {"path": path, "status": status, "detail": detail,
                        "what": spec["what"]}
    return report


def _print_next_steps(dest: str) -> None:
    bpe = os.path.join(dest, ASSETS["bpe_vocab"]["filename"])
    clip = os.path.join(dest, ASSETS["clip_checkpoint"]["filename"])
    kmax = os.path.join(dest, ASSETS["kmax_checkpoint"]["filename"])
    print(
        "\nnext steps (docs/MIGRATION.md 'conversion day'):\n"
        f"  sai-convert-clip {clip} {dest}/clip_laion400m_e32.pkl\n"
        f"  sai-convert-kmax {kmax} {dest}/kmax_convnext_large.pkl\n"
        f"  export SAI_BPE_VOCAB={bpe}\n"
        f"  export SAI_CLIP_CHECKPOINT={dest}/clip_laion400m_e32.pkl\n"
        f"  export SAI_KMAX_CHECKPOINT={dest}/kmax_convnext_large.pkl\n"
        "  sai-doctor                      # re-validates everything\n"
        "  sai-eval-scannet --help         # quality-parity numbers"
    )


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="download + verify the public assets a real-weight "
                    "deployment needs (BPE merges, open_clip checkpoint, "
                    "kMaX checkpoint)"
    )
    parser.add_argument("--dest", default=DEFAULT_DEST)
    parser.add_argument("--check", action="store_true",
                        help="offline: report presence/hash status only")
    parser.add_argument("--kmax-url", default=None,
                        help="direct download link for "
                             "kmax_convnext_large.pth (the upstream model "
                             "zoo hosts it behind a page, not a stable URL)")
    parser.add_argument("--trust-new-hash", action="store_true",
                        help="accept and lock a digest that differs from "
                             "the pinned/locked one (upstream rotation)")
    parser.add_argument("--only", choices=sorted(ASSETS), default=None,
                        help="fetch/check a single asset")
    args = parser.parse_args(argv)

    os.makedirs(args.dest, exist_ok=True)
    names = [args.only] if args.only else list(ASSETS)

    if args.check:
        report = check_assets(args.dest)
        bad = False
        for name in names:
            r = report[name]
            mark = {"ok": "ok  ", "missing": "MISS",
                    "mismatch": "FAIL"}[r["status"]]
            print(f"[{mark}] {name}: {r['detail']}  ({r['path']})")
            bad = bad or r["status"] == "mismatch"
        return 1 if bad else 0

    lock = _read_lock(args.dest)
    failures = []
    for name in names:
        spec = ASSETS[name]
        path = os.path.join(args.dest, spec["filename"])
        url = args.kmax_url if name == "kmax_checkpoint" and args.kmax_url \
            else spec.get("url")
        status, detail = verify_asset(name, path, lock,
                                      args.trust_new_hash)
        if status == "ok":
            print(f"[ok  ] {name}: already present, {detail}")
            continue
        if status == "mismatch":
            print(f"[FAIL] {name}: {detail}")
            failures.append(name)
            continue
        if not url:
            print(
                f"[MISS] {name}: no stable direct URL — download "
                f"'{spec['filename']}' from the model zoo at "
                f"{spec.get('zoo')} and either place it at {path} or re-run "
                f"with --kmax-url <direct link>"
            )
            failures.append(name)
            continue
        print(f"[....] {name}: downloading {url}")
        try:
            _download(url, path)
        except Exception as e:
            print(f"[FAIL] {name}: download failed "
                  f"({type(e).__name__}: {e})")
            failures.append(name)
            continue
        status, detail = verify_asset(name, path, lock,
                                      args.trust_new_hash)
        if status != "ok":
            print(f"[FAIL] {name}: fetched but {detail}")
            failures.append(name)
            continue
        print(f"[ok  ] {name}: fetched + verified, {detail}")

    _write_lock(args.dest, lock)
    if failures:
        print(f"\n{len(failures)} asset(s) unresolved: "
              f"{', '.join(failures)}", file=sys.stderr)
    else:
        _print_next_steps(args.dest)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
