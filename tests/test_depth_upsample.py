"""Device-side bicubic depth upsample (core/upsample.py): fidelity vs the
host cv2.INTER_CUBIC path it replaces (reference clipfusion.py:356-360),
and the pipeline's native-depth upload wiring."""
import cv2
import numpy as np
import pytest

from spatially_aware_ai_tpu.core.upsample import (
    cubic_upsample_matrix,
    upsample_depth_u16_device,
)

RNG = np.random.default_rng(7)


def adversarial_u16(h, w):
    """Random mm depth plus saturation extremes (cubic overshoot territory)
    and hard speckle edges."""
    d = RNG.integers(0, 6000, (h, w), dtype=np.uint16)
    d[::7, ::5] = 0
    d[3::11, 2::9] = 65535
    return d


@pytest.mark.parametrize("h,w,s", [(192, 256, 4), (24, 36, 4), (30, 50, 2)])
def test_device_upsample_matches_cv2(h, w, s):
    """cv2 routes 16U resize through its float kernels, so the matrix
    formulation must match cv2.resize(INTER_CUBIC) everywhere except
    round-half ties: after mm-rounding, |diff| <= 1 unit at a tiny fraction
    of pixels; unrounded, within 0.5 mm + float noise of cv2's output."""
    d = adversarial_u16(h, w)
    ref = cv2.resize(d, (w * s, h * s), None, 0, 0, cv2.INTER_CUBIC)

    up = np.asarray(upsample_depth_u16_device(d[None], s))[0]  # f32 meters
    up_mm = up * 1000.0
    diff = np.abs(up_mm - ref.astype(np.float64))
    assert diff.max() <= 0.5 + 1e-2, diff.max()

    rounded = np.clip(np.rint(up_mm), 0, 65535).astype(np.int64)
    unit_diff = np.abs(rounded - ref.astype(np.int64))
    assert unit_diff.max() <= 1
    # off-by-one only at round-half ties: vanishingly rare
    assert (unit_diff > 0).mean() < 2e-3


def test_upsample_matrix_rows_are_partitions_of_unity():
    M = cubic_upsample_matrix(64, 4)
    np.testing.assert_allclose(M.sum(axis=1), 1.0, atol=1e-6)
    # interior rows carry exactly 4 taps; edge rows fold replicated taps
    assert (np.abs(M) > 0).sum(axis=1).max() <= 4


def test_matches_host_loader_path(tmp_path):
    """End of the contract chain: device upsample of the raw PNG frames ==
    IPhone3DScannerDataset._load_depth (cv2 u16 cubic, /1000) within the
    1 mm cv2-output quantization."""
    from test_data_loaders import write_iphone_scan

    from spatially_aware_ai_tpu.data import IPhone3DScannerDataset

    write_iphone_scan(tmp_path, num_frames=2)
    ds = IPhone3DScannerDataset(str(tmp_path))

    native = ds.stacked_u8([0, 1], native_depth=True)
    assert native["depth"].dtype == np.uint16
    assert native["depth"].shape == (2, 192, 256)
    assert native["depth_upsample"] == 4

    host = ds.stacked_u8([0, 1])["depth"]  # f32 meters, host cv2 path
    dev = np.asarray(
        upsample_depth_u16_device(native["depth"], native["depth_upsample"])
    )
    assert dev.shape == host.shape
    assert np.abs(dev - host).max() <= 1.0e-3 + 1e-6


def test_quantized_chunk_native_depth(tmp_path):
    from spatially_aware_ai_tpu.pipeline import quantized_chunk_to_device

    rgb = RNG.integers(0, 255, (2, 32, 48, 3), dtype=np.uint8)
    d = adversarial_u16(8, 12)[None].repeat(2, axis=0)
    rgb_dev, depth_dev = quantized_chunk_to_device(rgb, d, depth_upsample=4)
    assert depth_dev.shape == (2, 32, 48)
    ref = cv2.resize(d[0], (48, 32), None, 0, 0, cv2.INTER_CUBIC)
    assert np.abs(np.asarray(depth_dev)[0] * 1000 - ref).max() <= 0.6

    with pytest.raises(ValueError):
        quantized_chunk_to_device(rgb, d.astype(np.float32), depth_upsample=4)


def test_fuse_scan_native_depth_parity(tmp_path):
    """Full pipeline A/B on an iPhone-format scan: the native-depth upload
    must reproduce the host-upsampled run. The paths differ only by the
    <=0.5 mm cv2-output rounding, so grids agree to tight tolerances with
    at most isolated near-surface-threshold flips."""
    from test_data_loaders import write_iphone_scan

    from spatially_aware_ai_tpu.data import IPhone3DScannerDataset
    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.pipeline import FusionConfig, fuse_scan

    write_iphone_scan(tmp_path, num_frames=2)
    ds = IPhone3DScannerDataset(str(tmp_path))
    engine = ClipEngine.tiny()
    kw = dict(
        voxel_size=0.3, trunc_vox=2.0, clip_patch_size=256,
        clip_patch_stride=128, frame_chunk=2,
    )
    r_host = fuse_scan(
        ds, engine, FusionConfig(device_depth_upsample=False, **kw)
    )
    r_dev = fuse_scan(
        ds, engine, FusionConfig(device_depth_upsample=True, **kw)
    )
    assert r_host.nvox == r_dev.nvox
    w_host = np.asarray(r_host.values["weight"]).ravel()
    w_dev = np.asarray(r_dev.values["weight"]).ravel()
    # near-surface membership can flip only where |sdf| sits within the
    # sub-mm depth delta of the +/-1 boundary
    assert (w_host != w_dev).mean() < 0.02
    both = (w_host > 0) & (w_dev > 0)
    t_host = np.asarray(r_host.values["tsdf"]).ravel()[both]
    t_dev = np.asarray(r_dev.values["tsdf"]).ravel()[both]
    same_votes = w_host[both] == w_dev[both]
    np.testing.assert_allclose(
        t_dev[same_votes], t_host[same_votes], atol=5e-3
    )


def test_gating(tmp_path):
    """scale_patches_by_depth reads host full-res depth per frame, so the
    native-depth upload must stay off there; datasets without the
    capability attribute are untouched."""
    from test_data_loaders import write_iphone_scan

    from spatially_aware_ai_tpu.data import (
        IPhone3DScannerDataset,
        SyntheticSceneDataset,
    )

    write_iphone_scan(tmp_path, num_frames=1)
    ds = IPhone3DScannerDataset(str(tmp_path))
    assert ds.native_depth_scale == 4
    assert getattr(
        SyntheticSceneDataset(num_frames=1, width=16, height=12),
        "native_depth_scale", 0,
    ) == 0
