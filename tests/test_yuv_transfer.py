"""Opt-in 4:2:0 rgb transfer (core/yuv.py): packing layout, decode math,
roundtrip fidelity, and end-to-end pipeline effect (tsdf/weights must be
byte-identical — only chroma detail may move)."""
import numpy as np
import pytest

from spatially_aware_ai_tpu.core.yuv import (
    _INV,
    i420_to_rgb_device,
    rgb_u8_to_i420,
)

RNG = np.random.default_rng(11)


def _decode_ref(planes, H):
    """Numpy reference of the device decoder."""
    F, HP, W = planes.shape
    y = planes[:, :H].astype(np.float32)
    u = planes[:, H:H + H // 4].reshape(F, H // 2, W // 2).astype(np.float32)
    v = planes[:, H + H // 4:].reshape(F, H // 2, W // 2).astype(np.float32)
    up = lambda c: np.repeat(np.repeat(c - 128.0, 2, axis=1), 2, axis=2)
    yuv = np.stack([y, up(u), up(v)], axis=-1)
    rgb = yuv @ _INV.T
    return np.clip(rgb / 255.0, 0.0, 1.0)


def test_device_decode_matches_reference():
    planes = RNG.integers(0, 256, (2, 36, 32), dtype=np.uint8)  # H=24
    dev = np.asarray(i420_to_rgb_device(planes, 24))
    ref = _decode_ref(planes, 24)
    np.testing.assert_allclose(dev, ref, atol=1e-5)


def test_odd_dims_rejected():
    with pytest.raises(ValueError, match="H % 4"):
        rgb_u8_to_i420(np.zeros((1, 23, 32, 3), np.uint8))
    # even-but-not-multiple-of-4 height: the I420 row-packing (H/4 rows of
    # width W) can't carry it — must be a clear error, not a reshape crash
    with pytest.raises(ValueError, match="H % 4"):
        rgb_u8_to_i420(np.zeros((1, 258, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="packed plane height"):
        i420_to_rgb_device(np.zeros((1, 30, 32), np.uint8), 24)

    from spatially_aware_ai_tpu.core.yuv import i420_compatible

    assert i420_compatible(192, 256) and i420_compatible(768, 1024)
    assert not i420_compatible(258, 256)  # even H, not mult of 4
    assert not i420_compatible(192, 255)


def test_pipeline_falls_back_to_u8_on_incompatible_dims():
    """rgb_transfer=yuv420 with H % 4 != 0 frames must degrade to the u8
    transfer with a warning, not crash in the prefetch thread (where the
    reshape error would surface as an opaque chunk-load failure)."""
    import warnings as _w

    from spatially_aware_ai_tpu.data.synthetic import SyntheticSceneDataset
    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.pipeline import FusionConfig, fuse_scan

    # H=54 is even but not a multiple of 4 -> the packed I420 layout can't
    # carry it; the scan must still complete (u8 transfer) with a warning.
    # (patch/stride chosen so the CLIP tiler accepts 76x54 frames)
    ds = SyntheticSceneDataset(num_frames=4, width=76, height=54)
    engine = ClipEngine.tiny()
    kw = dict(voxel_size=0.12, trunc_vox=2.0, clip_patch_size=32,
              clip_patch_stride=22, frame_chunk=2)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        r_yuv = fuse_scan(ds, engine,
                          FusionConfig(rgb_transfer="yuv420", **kw))
    assert any("falling back to u8" in str(w.message) for w in rec)
    r_u8 = fuse_scan(ds, engine, FusionConfig(rgb_transfer="u8", **kw))
    np.testing.assert_array_equal(
        np.asarray(r_u8.values["weight"]), np.asarray(r_yuv.values["weight"])
    )
    np.testing.assert_allclose(
        np.asarray(r_u8.values["rgb"]), np.asarray(r_yuv.values["rgb"]),
        atol=1e-6,
    )


def test_forward_matrix_matches_cv2():
    """The decode matrix must invert cv2.COLOR_RGB2YUV's ACTUAL transform
    (analog-scaled BT.601 chroma, not JFIF) — probe it around mid-gray."""
    import cv2

    from spatially_aware_ai_tpu.core.yuv import _FWD

    base = np.full((2, 2, 3), 0.5, np.float32)
    y0 = cv2.cvtColor(base, cv2.COLOR_RGB2YUV)[0, 0]
    for c in range(3):
        x = base.copy()
        x[..., c] += 0.4
        d = (cv2.cvtColor(x, cv2.COLOR_RGB2YUV)[0, 0] - y0) / 0.4
        np.testing.assert_allclose(d, _FWD[:, c], atol=2e-4)


@pytest.mark.parametrize("w,h,min_psnr", [(96, 72, 31.0), (512, 384, 38.0)])
def test_roundtrip_fidelity_synthetic(w, h, min_psnr):
    """4:2:0 roundtrip fidelity on the synthetic room renders. Tiny frames
    are edge-dominated (chroma edges are most of the pixels), so the PSNR
    floor scales with resolution: 42 dB measured at the 1024x768 operating
    point. Luma is untouched by subsampling so its error stays within YUV
    u8 rounding."""
    from spatially_aware_ai_tpu.data.synthetic import SyntheticSceneDataset

    ds = SyntheticSceneDataset(num_frames=2, width=w, height=h)
    rgb = np.clip(
        np.rint(ds.stacked(range(2))["rgb"] * 255), 0, 255
    ).astype(np.uint8)
    dec = np.asarray(i420_to_rgb_device(rgb_u8_to_i420(rgb), h))
    err = dec - rgb.astype(np.float32) / 255.0
    psnr = -10 * np.log10(np.mean(err**2) + 1e-12)
    assert psnr >= min_psnr, psnr
    # luma roundtrip: project both through the Y row of the forward matrix.
    # Saturated colors can clip a channel on decode (chroma overshoot past
    # [0,1], as in cv2's own saturate_cast) which shifts luma — exclude
    # clipped pixels from the tight bound.
    from spatially_aware_ai_tpu.core.yuv import _FWD

    unclipped = ((dec > 0.0) & (dec < 1.0)).all(axis=-1)
    y_in = (rgb.astype(np.float32) @ _FWD[0]) / 255.0
    y_out = (dec * 255.0) @ _FWD[0] / 255.0
    assert np.abs(y_in - y_out)[unclipped].max() < 2.5 / 255.0


def test_pipeline_yuv420_grid_parity():
    """rgb_transfer only changes what the models/rgb channels see — the
    depth-driven tsdf and weight accumulators must be IDENTICAL, and the
    fused rgb within chroma-subsample distance."""
    from spatially_aware_ai_tpu.data.synthetic import SyntheticSceneDataset
    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.pipeline import FusionConfig, fuse_scan

    ds = SyntheticSceneDataset(num_frames=4, width=64, height=48)
    engine = ClipEngine.tiny()
    kw = dict(
        voxel_size=0.12, trunc_vox=2.0, clip_patch_size=32,
        clip_patch_stride=16, frame_chunk=2,
    )
    r_u8 = fuse_scan(ds, engine, FusionConfig(rgb_transfer="u8", **kw))
    r_yuv = fuse_scan(ds, engine, FusionConfig(rgb_transfer="yuv420", **kw))
    np.testing.assert_array_equal(
        np.asarray(r_u8.values["weight"]), np.asarray(r_yuv.values["weight"])
    )
    np.testing.assert_array_equal(
        np.asarray(r_u8.values["tsdf_weight"]),
        np.asarray(r_yuv.values["tsdf_weight"]),
    )
    np.testing.assert_allclose(
        np.asarray(r_u8.values["tsdf"]), np.asarray(r_yuv.values["tsdf"]),
        atol=1e-6,
    )
    w = np.asarray(r_u8.values["weight"]).ravel() > 0
    rgb_u8v = np.asarray(r_u8.values["rgb"]).reshape(-1, 3)[w]
    rgb_yuv = np.asarray(r_yuv.values["rgb"]).reshape(-1, 3)[w]
    assert np.abs(rgb_u8v - rgb_yuv).mean() < 0.01
    # CLIP features: same tower on near-identical frames
    f_u8 = np.asarray(r_u8.values["feat"]).reshape(rgb_u8v.shape[0] if False
                                                   else -1,
                                                   r_u8.values["feat"].shape[-1])
    f_yuv = np.asarray(r_yuv.values["feat"]).reshape(f_u8.shape)
    fu, fy = f_u8[w], f_yuv[w]
    nu = np.linalg.norm(fu, axis=1) * np.linalg.norm(fy, axis=1)
    cos = (fu * fy).sum(axis=1) / np.maximum(nu, 1e-9)
    assert np.quantile(cos, 0.05) > 0.98


def test_config_validation():
    from spatially_aware_ai_tpu.pipeline import FusionConfig

    with pytest.raises(ValueError, match="rgb_transfer"):
        FusionConfig(rgb_transfer="jpeg")


def test_host_decoder_matches_device_decoder():
    """i420_to_rgb_u8 (the server's client-push boundary decoder) must be
    the exact quantized mirror of the device decoder: same chroma expand,
    same inverse matrix, u8 rounding of the same values."""
    from spatially_aware_ai_tpu.core.yuv import i420_to_rgb_u8

    planes = RNG.integers(0, 256, (2, 36, 32), dtype=np.uint8)  # H=24
    host = i420_to_rgb_u8(planes)
    dev = np.asarray(i420_to_rgb_device(planes, 24))
    np.testing.assert_array_equal(
        host, np.clip(np.rint(dev * 255.0), 0, 255).astype(np.uint8)
    )


def test_host_decoder_roundtrip_and_validation():
    from spatially_aware_ai_tpu.core.yuv import i420_to_rgb_u8

    # smooth content (natural-image-like chroma coherence): 4:2:0 loss is
    # small; pure noise would not be representative of camera frames
    yy, xx = np.mgrid[0:24, 0:32].astype(np.float32)
    rgb = np.stack(
        [xx * 4, yy * 8, (xx + yy) * 3], axis=-1
    ).clip(0, 255).astype(np.uint8)[None].repeat(2, axis=0)
    back = i420_to_rgb_u8(rgb_u8_to_i420(rgb))
    assert back.shape == rgb.shape and back.dtype == np.uint8
    assert float(np.abs(back.astype(np.int32) - rgb).mean()) < 4.0

    with pytest.raises(ValueError):
        i420_to_rgb_u8(np.zeros((2, 35, 32), np.uint8))  # not H + H//2
    with pytest.raises(ValueError):
        i420_to_rgb_u8(np.zeros((2, 36, 31), np.uint8))  # odd width
    with pytest.raises(ValueError):
        i420_to_rgb_u8(np.zeros((2, 36, 32), np.float32))  # not u8
