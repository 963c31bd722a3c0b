"""Opt-in 4:2:0 chroma-subsampled RGB transfers (host encode, device decode).

After the native-depth change (core/upsample.py) the RGB plane is ~95% of
host->device upload bytes on the fusion path (uint8, 3 B/px). Real scan
sources are 4:2:0-subsampled JPEGs (iPhone/ScanNet), so a full-range
BT.601 YUV 4:2:0 re-encode carries essentially the same information at
1.5 B/px — half the bytes of the u8 path on the link that bounds the fuse
phase.

Layout: one uint8 array [F, H + H/2, W] per chunk — the Y plane [H, W]
followed by U then V quarter planes, each packed as H/4 rows of width W
(two W/2 chroma rows per packed row, the I420 convention, so a plain
row-major reshape unpacks them). H must be a multiple of 4, W even.

Encode (host, prefetch thread): full-range BT.601 via cv2's SIMD paths —
COLOR_RGB2YUV then INTER_AREA 2x2 chroma averaging. Decode (device, part
of the jitted preamble): nearest 2x2 chroma expand + the exact float
inverse matrix, clamped to [0, 1].

Fidelity: lossy by design (chroma resolution + u8 YUV rounding). Measured
on the synthetic bench scenes: >= 38 dB PSNR vs the u8 path and zero
change in hermetic-eval label mIoU / query metrics
(tests/test_yuv_transfer.py). Kept OFF by default for reference parity
(clipfusion.py uploads full RGB); enable with
FusionConfig.rgb_transfer="yuv420" / SAI_RGB_TRANSFER=yuv420 where the
link is the bottleneck.
"""
from __future__ import annotations

import functools

import numpy as np

# cv2.COLOR_RGB2YUV's exact definition: BT.601 luma with ANALOG-scaled
# chroma U = 0.492(B-Y), V = 0.877(R-Y) (probed empirically against cv2 in
# tests/test_yuv_transfer.py — this is NOT the JFIF Cb/Cr scaling)
_FWD = np.array(
    [
        [0.299, 0.587, 0.114],
        [0.492 * -0.299, 0.492 * -0.587, 0.492 * 0.886],
        [0.877 * 0.701, 0.877 * -0.587, 0.877 * -0.114],
    ],
    np.float32,
)
_INV = np.linalg.inv(_FWD.astype(np.float64)).astype(np.float32)


def i420_compatible(h: int, w: int) -> bool:
    """Whether [H, W] frames can carry the packed I420 layout."""
    return h % 4 == 0 and w % 2 == 0


def rgb_u8_to_i420(rgb_u8: np.ndarray) -> np.ndarray:
    """[F, H, W, 3] uint8 RGB -> [F, H + H//2, W] uint8 packed 4:2:0
    (host-side, cv2 SIMD). H must be a multiple of 4, W even."""
    import cv2

    f, h, w, _ = rgb_u8.shape
    # the I420 row-packing (two W/2 chroma rows per packed row -> H/4 rows
    # of width W, and the decoder's planes[:, h:h+h//4] slice) needs H to
    # be a multiple of 4, not merely even
    if h % 4 or w % 2:
        raise ValueError(
            f"4:2:0 packed layout needs H % 4 == 0 and W % 2 == 0, "
            f"got {(h, w)}"
        )
    out = np.empty((f, h + h // 2, w), np.uint8)
    for i in range(f):
        yuv = cv2.cvtColor(rgb_u8[i], cv2.COLOR_RGB2YUV)
        out[i, :h] = yuv[..., 0]
        u = cv2.resize(yuv[..., 1], (w // 2, h // 2), None, 0, 0,
                       cv2.INTER_AREA)
        v = cv2.resize(yuv[..., 2], (w // 2, h // 2), None, 0, 0,
                       cv2.INTER_AREA)
        out[i, h:h + h // 4] = u.reshape(h // 4, w)
        out[i, h + h // 4:] = v.reshape(h // 4, w)
    return out


def i420_to_rgb_u8(planes: np.ndarray) -> np.ndarray:
    """[F, H + H//2, W] packed 4:2:0 uint8 -> [F, H, W, 3] uint8 RGB.

    Host-side numpy mirror of the device decoder (same nearest 2x2 chroma
    expand, same inverse matrix), for boundaries that need host u8 frames
    — e.g. the server accepting a client's native-YUV live pushes while
    the session's device transfer stays u8. Round-trip with
    rgb_u8_to_i420 is the usual 4:2:0 chroma loss (~42 dB PSNR at
    1024x768), identical to what the device path applies."""
    planes = np.asarray(planes)
    if planes.ndim != 3 or planes.dtype != np.uint8:
        raise ValueError(
            f"expected [F, H + H//2, W] uint8 planes, got "
            f"{planes.shape} {planes.dtype}"
        )
    f, hp, w = planes.shape
    if hp % 3 or (hp * 2 // 3) % 4 or w % 2:
        raise ValueError(
            f"packed plane height {hp} is not H + H//2 for an "
            f"I420-compatible H (H % 4 == 0, W % 2 == 0), width {w}"
        )
    h = hp * 2 // 3
    y = planes[:, :h].astype(np.float32)
    qu = planes[:, h:h + h // 4].reshape(f, h // 2, w // 2)
    qv = planes[:, h + h // 4:].reshape(f, h // 2, w // 2)

    def up2(c):
        c = c.astype(np.float32) - 128.0
        return c.repeat(2, axis=1).repeat(2, axis=2)

    yuv = np.stack([y, up2(qu), up2(qv)], axis=-1)
    rgb = yuv @ _INV.T
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


@functools.lru_cache(maxsize=None)
def _decoder_fn(h: int, w: int):
    import jax
    import jax.numpy as jnp

    inv = jnp.asarray(_INV)

    @jax.jit
    def dec(planes):  # [F, H + H/2, W] u8 -> [F, H, W, 3] f32 in [0, 1]
        y = planes[:, :h].astype(jnp.float32)
        qu = planes[:, h:h + h // 4].reshape(-1, h // 2, w // 2)
        qv = planes[:, h + h // 4:].reshape(-1, h // 2, w // 2)
        # nearest 2x2 chroma expand (broadcast, no gather)
        def up2(c):
            c = c.astype(jnp.float32) - 128.0
            c = jnp.repeat(c, 2, axis=1)
            return jnp.repeat(c, 2, axis=2)

        yuv = jnp.stack([y, up2(qu), up2(qv)], axis=-1)
        rgb = jnp.einsum(
            "fhwc,rc->fhwr", yuv, inv,
            preferred_element_type=jnp.float32,
        )
        return jnp.clip(rgb / 255.0, 0.0, 1.0)

    return dec


def i420_to_rgb_device(planes, height: int):
    """Packed 4:2:0 chunk (host or device) -> f32 RGB [0,1] on device."""
    import jax.numpy as jnp

    planes = jnp.asarray(planes)
    f, hp, w = planes.shape
    if hp != height + height // 2:
        raise ValueError(
            f"packed plane height {hp} != H + H/2 for H={height}"
        )
    return _decoder_fn(int(height), int(w))(planes)
