from .base import Frame, FrameDataset
from .synthetic import SyntheticSceneDataset, SyntheticScene, Box
from .iphone import IPhone3DScannerDataset
from .scannet import ScanNetDataset
from .lerf import LERFDataset
from .magicleap2 import MagicLeap2Dataset
from .live import LiveScanDataset, is_live_scan_dir


def HypersimDataset(scan_dir):
    """Lazy import (h5py)."""
    from .hypersim import HypersimDataset as _H

    return _H(scan_dir)


def make_dataset(name: str, scan_dir: str, views_limit: int = 0):
    """Dataset dispatch matching the reference's names
    (clipfusion.py:1043-1052, clip_seem_fusion.py:258-265) + 'synthetic'."""
    name = name.lower()
    if name in ("iphone", "iphone3dscanner"):
        return IPhone3DScannerDataset(scan_dir, views_limit)
    if name == "magicleap2":
        return MagicLeap2Dataset(scan_dir, views_limit)
    if name == "scannet":
        return ScanNetDataset(scan_dir)
    if name == "hypersim":
        return HypersimDataset(scan_dir)
    if name == "lerf":
        return LERFDataset(scan_dir)
    if name == "synthetic":
        return SyntheticSceneDataset.from_dir(scan_dir)
    if name == "live":
        return LiveScanDataset(scan_dir, views_limit)
    raise NotImplementedError(f"unknown dataset: {name}")
