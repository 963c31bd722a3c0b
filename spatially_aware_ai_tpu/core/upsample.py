"""Device-side integer-factor bicubic depth upsampling.

The iPhone ingest contract upsamples the native 256x192 uint16-mm LiDAR
depth 4x to 1024x768 with cv2.INTER_CUBIC on the host (reference
clipfusion.py:356-360) and only then moves it to the device. Over this
sandbox's ~23 MB/s host->TPU link that is the wrong order: the upsampled
uint16 frame is 16x the bytes of the sensor's native frame (1.5 MB vs
96 KB). This module lets the fusion pipeline upload the NATIVE uint16
frames and run the exact same resize on device.

For a fixed integer scale s, cv2's inverse mapping
``src = (dst + 0.5)/s - 0.5`` visits only s fractional phases per axis,
each a 4-tap Catmull-Rom-style kernel (a = -0.75) with BORDER_REPLICATE
edge folding. The whole separable resize is therefore two constant banded
matrices, and ``out = A_h @ depth @ A_w.T`` — two small dense matmuls that
XLA tiles straight onto the MXU (~0.5 GFLOP per 24-frame chunk; free next
to the upload it replaces).

Fidelity: cv2 dispatches 16U through its float kernel path (only 8U uses
the fixed-point INTER_RESIZE_COEF path), so this float formulation matches
cv2.resize(u16, INTER_CUBIC) to within 1 u16 unit (= 1 mm), differing only
at round-half ties — measured 86 off-by-one pixels out of 786,432 on
adversarial random frames (tests/test_depth_upsample.py). The device path
keeps the f32 result UNROUNDED, so it is strictly closer to the ideal
float resize than the production alternative it replaces (host cv2 resize
+ uint16-mm re-quantization of the upsampled frame, which rounds every
pixel by up to 0.5 mm).
"""
from __future__ import annotations

import functools

import numpy as np


def cubic_kernel_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """4-tap cubic-convolution weights for fractional offset ``t`` in
    [0, 1), taps at source offsets (-1, 0, 1, 2). Matches OpenCV's
    interpolateCubic (modules/imgproc resize, A = -0.75); weights sum to 1
    by construction (last tap is the residual, as in cv2)."""
    t = np.asarray(t, np.float64)
    w0 = ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
    w1 = ((a + 2) * t - (a + 3)) * t * t + 1
    tt = 1.0 - t
    w2 = ((a + 2) * tt - (a + 3)) * tt * tt + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=None)
def cubic_upsample_matrix(n_src: int, scale: int, a: float = -0.75):
    """[n_src*scale, n_src] float32 matrix implementing cv2's INTER_CUBIC
    enlarge along one axis (inverse mapping (dst+0.5)/scale - 0.5,
    BORDER_REPLICATE: out-of-range taps fold onto the edge sample)."""
    n_dst = n_src * scale
    M = np.zeros((n_dst, n_src), np.float64)
    dst = np.arange(n_dst)
    src = (dst + 0.5) / scale - 0.5
    base = np.floor(src).astype(np.int64)
    w = cubic_kernel_weights(src - base, a)
    for tap in range(4):
        col = np.clip(base - 1 + tap, 0, n_src - 1)
        np.add.at(M, (dst, col), w[:, tap])
    return M.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _upsampler_fn(h: int, w: int, scale: int):
    import jax
    import jax.numpy as jnp

    Ah = jnp.asarray(cubic_upsample_matrix(h, scale))
    Aw = jnp.asarray(cubic_upsample_matrix(w, scale))

    @jax.jit
    def up(depth_u16):  # [F, h, w] uint16 mm -> [F, h*s, w*s] f32 meters
        d = depth_u16.astype(jnp.float32)
        # horizontal then vertical, f32 accumulation like cv2's float path;
        # cubic overshoot past the u16 range saturates exactly as cv2 does
        out = jnp.einsum(
            "Hh,fhw,Ww->fHW", Ah, d, Aw,
            preferred_element_type=jnp.float32,
        )
        return jnp.clip(out, 0.0, 65535.0) / 1000.0

    return up


def sample_upsampled_u16(depth_u16: np.ndarray, uu, vv, scale: int):
    """Host-side sparse evaluation of the SAME upsample at full-res pixel
    coordinates (uu, vv) — for bounds passes that need a handful of samples
    per frame without materializing the enlarged frame. depth_u16 [h, w]
    uint16 mm -> f32 meters [len(uu)], equal to
    upsample_depth_u16_device(...)[vv, uu] up to f32 summation order."""
    h, w = depth_u16.shape
    Mh = cubic_upsample_matrix(h, scale)[np.asarray(vv)]  # [P, h]
    Mw = cubic_upsample_matrix(w, scale)[np.asarray(uu)]  # [P, w]
    d = depth_u16.astype(np.float32)
    samples = np.einsum("ph,hw,pw->p", Mh, d, Mw, optimize=True)
    return np.clip(samples, 0.0, 65535.0).astype(np.float32) / 1000.0


def infer_native_depth_scale(rgb_hw, depth_hw):
    """Integer upsample factor implied by rgb [H, W] vs depth [h, w]
    resolutions: 1 when equal, s >= 2 when (H, W) == (h*s, w*s), else
    raises (the live-push contract, manager/live.py)."""
    H, W = rgb_hw
    h, w = depth_hw
    if (H, W) == (h, w):
        return 1
    if h > 0 and w > 0 and H % h == 0 and W % w == 0 and H // h == W // w:
        return H // h
    raise ValueError(
        f"depth resolution {(h, w)} is neither rgb resolution {(H, W)} nor "
        "an exact integer divisor of it"
    )


def upsample_depth_u16_device(depth_u16, scale: int):
    """Upload-side entry: native uint16-mm depth [F, h, w] (host or device)
    -> f32 meters [F, h*scale, w*scale] on device, matching the host path
    (cv2 INTER_CUBIC enlarge, then /1000) to <=1 mm."""
    import jax.numpy as jnp

    dev = jnp.asarray(depth_u16)
    f, h, w = dev.shape
    return _upsampler_fn(int(h), int(w), int(scale))(dev)
