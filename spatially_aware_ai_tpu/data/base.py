"""The frame contract shared by all ingest datasets.

Every dataset yields frames with:
  rgb   [H, W, 3] float32 in [0, 1]
  depth [H, W]    float32 meters (0 / NaN = invalid)
  pose  [4, 4]    float32 camera-to-world, right-down-forward camera frame
  K     [3, 3]    float32 intrinsics for the (H, W) resolution
  index int       frame index within the scan

matching the reference's per-frame tuple (clipfusion.py:190, 256, 374, 465).
"""
from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np


@dataclasses.dataclass
class Frame:
    rgb: np.ndarray
    depth: np.ndarray
    pose: np.ndarray
    K: np.ndarray
    index: int


class FrameDataset:
    """Minimal sequence protocol: len() + [i] -> Frame."""

    imwidth: int
    imheight: int

    def __len__(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, i: int) -> Frame:  # pragma: no cover - abstract
        raise NotImplementedError

    def __iter__(self) -> Iterator[Frame]:
        for i in range(len(self)):
            yield self[i]

    def stacked(self, indices=None):
        """Load frames [F] -> dict of stacked numpy arrays."""
        if indices is None:
            indices = range(len(self))
        frames = [self[i] for i in indices]
        return {
            "rgb": np.stack([f.rgb for f in frames]),
            "depth": np.stack([f.depth for f in frames]),
            "pose": np.stack([f.pose for f in frames]),
            "K": np.stack([f.K for f in frames]),
            "index": np.array([f.index for f in frames]),
        }

    def stacked_u8(self, indices=None):
        """stacked() in transfer-quantized form: rgb as uint8 [0, 255] and
        depth either float32 meters or uint16 millimeters.

        The fusion pipeline uploads quantized chunks (uint8 rgb / uint16 mm
        depth — pipeline.py quantize_transfer); most loaders decode 8-bit
        images and 16-bit depth PNGs to begin with, so converting to f32
        [0,1] per frame only for the pipeline to round back costs ~450 MB
        of host memory traffic per chunk on a 1-vCPU host. Loaders with
        native 8/16-bit sources override this to pass them through;
        this default converts from stacked() (same total work, but on the
        prefetch thread)."""
        out = self.stacked(indices)
        rgb = out["rgb"]
        if rgb.dtype != np.uint8:
            out["rgb"] = np.clip(
                np.rint(rgb * 255.0), 0, 255
            ).astype(np.uint8)
        return out

    def bounds_samples(self, uv_size: int = 7):
        """Subsampled depth for the scene-bounds pass: (depth [F, P],
        uu [P], vv [P], pose [F, 4, 4], K [F, 3, 3]).

        Default loads full frames ONE AT A TIME and keeps only uv_size^2
        depth samples each — the bounds pass never stacks whole-scan
        RGB/depth. Loaders whose depth is stored separately should override
        to skip RGB decode entirely (iphone.py saves one JPEG decode per
        frame — hundreds per scan on a 1-vCPU host)."""
        from ..core.bounds import subsample_grid

        uu, vv = subsample_grid(self.imwidth, self.imheight, uv_size)
        depths, poses, Ks = [], [], []
        for f in self:
            depths.append(f.depth[vv, uu])
            poses.append(f.pose)
            Ks.append(f.K)
        return np.stack(depths), uu, vv, np.stack(poses), np.stack(Ks)
