"""Persisted live-scan loader.

A streamed scan (manager.live_begin / live_push / live_end — no reference
equivalent; the reference only reconstructs completed scan directories,
clip_seem_fusion.py:247-437) is persisted by live_end as ONE
`live_frames.npz` in the version directory:

  rgb   [F, H, W, 3] uint8
  depth [F, H, W]    uint16 millimeters (0 = invalid)
  pose  [F, 4, 4]    float32 camera-to-world (right-down-forward)
  K     [F, 3, 3]    float32

so the standard version-control flow (reprocess_scan, evals, batch CLI)
can rebuild a streamed scan exactly like a disk scan. The manager
autodetects the file regardless of its configured dataset type.
"""
from __future__ import annotations

import os

import numpy as np

from .base import Frame, FrameDataset

LIVE_FRAMES_FILE = "live_frames.npz"


def is_live_scan_dir(scan_dir: str) -> bool:
    return os.path.exists(os.path.join(scan_dir, LIVE_FRAMES_FILE))


def save_live_frames(scan_dir: str, rgb_u8, depth_u16, pose, K) -> str:
    from ..utils.atomic import atomic_savez

    path = os.path.join(scan_dir, LIVE_FRAMES_FILE)
    atomic_savez(
        path,
        rgb=np.asarray(rgb_u8, np.uint8),
        depth=np.asarray(depth_u16, np.uint16),
        pose=np.asarray(pose, np.float32),
        K=np.asarray(K, np.float32),
    )
    return path


# -- incremental staging (crash durability for live streams) ---------------
#
# Every live_push writes its frames as one part file BEFORE returning, so a
# server crash mid-stream loses at most the in-flight request; the staged
# parts consolidate into a regular live_frames.npz version either at
# live_end or via manager.live_recover() after a restart.

def save_staging_part(staging_dir: str, part_idx: int,
                      rgb_u8, depth_u16, pose, K,
                      rgb_i420_height: int = 0) -> str:
    """rgb_i420_height > 0 marks rgb_u8 as PACKED i420 planes
    [F, H + H//2, W] u8 (a yuv420-transfer session streaming the camera's
    native 4:2:0 layout): the part stores the planes verbatim — half the
    staging bytes, no host decode on the push path, and no second chroma
    rounding when the chunk later uploads (core/yuv.py)."""
    os.makedirs(staging_dir, exist_ok=True)
    from ..utils.atomic import atomic_savez

    path = os.path.join(staging_dir, f"part_{part_idx:05d}.npz")
    rgb_key = "rgb_i420" if rgb_i420_height else "rgb"
    # atomic AND durable: fsync before the rename, otherwise an OS-level
    # crash can leave a present-but-torn part that breaks both recovery
    # paths exactly when they're needed
    atomic_savez(
        path,
        durable=True,
        depth=np.asarray(depth_u16, np.uint16),
        pose=np.asarray(pose, np.float32),
        K=np.asarray(K, np.float32),
        **{rgb_key: np.asarray(rgb_u8, np.uint8)},
    )
    return path


def part_nframes(arrays: dict) -> int:
    """Frame count of a staged part regardless of its rgb layout."""
    return len(arrays["rgb_i420"] if "rgb_i420" in arrays else arrays["rgb"])


def part_rgb_u8(arrays: dict) -> np.ndarray:
    """Decoded [F, H, W, 3] u8 rgb of a staged part (cold consolidation /
    recovery path; i420 parts decode here, never on the push path)."""
    if "rgb_i420" in arrays:
        from ..core.yuv import i420_to_rgb_u8

        return i420_to_rgb_u8(arrays["rgb_i420"])
    return arrays["rgb"]


def load_staging_parts(staging_dir: str):
    """Yield (path, arrays-dict) for each readable staged part, and return
    the unreadable ones. Torn parts (OS crash mid-write despite fsync, disk
    trouble) are skipped so ONE bad file cannot brick recovery. The rgb
    arrays key is either "rgb" [F,H,W,3] or "rgb_i420" [F,H+H//2,W]
    (packed-plane parts of a yuv420-transfer session)."""
    good, bad = [], []
    for p in staging_parts(staging_dir):
        try:
            with np.load(p) as z:
                rgb_key = "rgb_i420" if "rgb_i420" in z.files else "rgb"
                good.append(
                    (p, {k: z[k]
                         for k in (rgb_key, "depth", "pose", "K")})
                )
        except Exception:
            bad.append(p)
    return good, bad


def staging_parts(staging_dir: str):
    import glob as _glob

    return sorted(_glob.glob(os.path.join(staging_dir, "part_*.npz")))


def consolidate_staging(staging_dir: str, scan_dir: str) -> int:
    """Merge staged parts into scan_dir/live_frames.npz (frame count
    returned; unreadable parts are skipped — see load_staging_parts). The
    staging dir is left in place; the caller removes it after a successful
    consolidation."""
    good, bad = load_staging_parts(staging_dir)
    if not good:
        raise ValueError(
            f"no readable staged live frames in {staging_dir}"
            + (f" ({len(bad)} unreadable parts)" if bad else "")
        )
    save_live_frames(
        scan_dir,
        np.concatenate([part_rgb_u8(g[1]) for g in good]),
        np.concatenate([g[1]["depth"] for g in good]),
        np.concatenate([g[1]["pose"] for g in good]),
        np.concatenate([g[1]["K"] for g in good]),
    )
    return sum(part_nframes(g[1]) for g in good)


class LiveScanDataset(FrameDataset):
    def __init__(self, scan_dir: str, views_limit: int = 0):
        self.dataset_name = "live"
        self.scan_dir = scan_dir
        with np.load(os.path.join(scan_dir, LIVE_FRAMES_FILE)) as z:
            self._rgb = z["rgb"]
            self._depth = z["depth"]
            self._pose = z["pose"]
            self._K = z["K"]
        if views_limit > 0:
            self._rgb = self._rgb[:views_limit]
            self._depth = self._depth[:views_limit]
            self._pose = self._pose[:views_limit]
            self._K = self._K[:views_limit]
        self.imheight, self.imwidth = self._rgb.shape[1:3]
        # sessions streamed with native low-res depth persist it as-is;
        # reprocessing enlarges on device exactly like the live integrate
        # did (core/upsample.py; scale inferred from the array shapes)
        from ..core.upsample import infer_native_depth_scale

        s = infer_native_depth_scale(
            self._rgb.shape[1:3], self._depth.shape[1:3]
        )
        if s > 1:
            self.native_depth_scale = s

    def __len__(self):
        return len(self._rgb)

    def _depth_scale(self) -> int:
        return getattr(self, "native_depth_scale", 1)

    def _full_depth_m(self, i: int) -> np.ndarray:
        s = self._depth_scale()
        if s == 1:
            return self._depth[i].astype(np.float32) / 1000.0
        import cv2

        d = cv2.resize(
            self._depth[i], (self.imwidth, self.imheight), None, 0, 0,
            cv2.INTER_CUBIC,
        )
        return d.astype(np.float32) / 1000.0

    def __getitem__(self, i: int) -> Frame:
        return Frame(
            rgb=self._rgb[i].astype(np.float32) / 255.0,
            depth=self._full_depth_m(i),
            pose=self._pose[i],
            K=self._K[i],
            index=i,
        )

    def stacked_u8(self, indices=None, native_depth=False):
        """Native pass-through: the persisted arrays ARE the pipeline's
        quantized-transfer format. native_depth=True (only offered when the
        session streamed low-res depth) returns it untouched with the
        device-upsample factor."""
        idx = list(indices) if indices is not None else range(len(self))
        idx = list(idx)
        out = {
            "rgb": self._rgb[idx],
            "depth": self._depth[idx],
            "pose": self._pose[idx],
            "K": self._K[idx],
            "index": np.asarray(idx),
        }
        if native_depth:
            out["depth_upsample"] = self.native_depth_scale
        elif self._depth_scale() > 1:
            out["depth"] = np.stack([self._full_depth_m(i) for i in idx])
        return out

    def bounds_samples(self, uv_size: int = 7):
        """Depth-only bounds pass; for native-depth archives the sparse
        points are cubic-evaluated directly from the low-res frames
        (core/upsample.py), never materializing the enlarged frames."""
        from ..core.bounds import subsample_grid

        uu, vv = subsample_grid(self.imwidth, self.imheight, uv_size)
        s = self._depth_scale()
        if s == 1:
            d = self._depth[:, vv, uu].astype(np.float32) / 1000.0
        else:
            from ..core.upsample import sample_upsampled_u16

            d = np.stack([
                sample_upsampled_u16(self._depth[i], uu, vv, s)
                for i in range(len(self))
            ])
        return d, uu, vv, self._pose, self._K
