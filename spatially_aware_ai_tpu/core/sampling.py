"""Gather-based image / volume sampling with the exact semantics the reference
gets from `torch.nn.functional.grid_sample(align_corners=False,
padding_mode="zeros")` (clipfusion.py:661-666, 697-721, 741-760).

Instead of torch's normalized [-1, 1] grid coordinates we sample directly at
pixel coordinates: the reference always builds its grid as
g = ((uv + 0.5) / [W, H]) * 2 - 1, and grid_sample unnormalizes with
x = (g + 1) / 2 * W - 0.5, which round-trips exactly back to `uv`. So the
contract here is: `sample_image_at_uv(img, uv)` == reference's
grid_sample(img, normalize(uv)).

Nearest mode uses round-half-to-even, matching torch's `std::nearbyint`.
All functions are pure jnp (jit-able, TPU-friendly gathers).
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img, yi, xi):
    """img: [H, W, C]; yi/xi: int32 [...]. Zero padding for out-of-bounds."""
    H, W = img.shape[0], img.shape[1]
    inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    yc = jnp.clip(yi, 0, H - 1)
    xc = jnp.clip(xi, 0, W - 1)
    vals = img[yc, xc]  # [..., C]
    return jnp.where(inb[..., None], vals, 0.0)


def sample_image_at_uv(img, uv, mode: str = "bilinear"):
    """Sample a [H, W, C] image at continuous pixel coordinates uv [..., 2].

    uv[..., 0] is the x/u coordinate (width axis), uv[..., 1] is y/v.
    Out-of-bounds reads contribute zeros (torch padding_mode="zeros").
    """
    x = uv[..., 0]
    y = uv[..., 1]
    if mode == "nearest":
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        return _gather_2d(img, yi, xi)
    if mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        v00 = _gather_2d(img, y0i, x0i)
        v01 = _gather_2d(img, y0i, x0i + 1)
        v10 = _gather_2d(img, y0i + 1, x0i)
        v11 = _gather_2d(img, y0i + 1, x0i + 1)
        fx = fx[..., None]
        fy = fy[..., None]
        return (
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )
    raise ValueError(f"unknown mode: {mode}")


def pack_bilinear_corners(img):
    """Precompute per-pixel 2x2 corner neighborhoods: [H, W, C] ->
    [H+1, W+1, 4C] where packed[y, x] = (img[y-1,x-1], img[y-1,x],
    img[y,x-1], img[y,x]) with zero padding outside the image.

    One gather of the packed image at (floor(v)+1, floor(u)+1) returns all
    four bilinear corners at once — a 4x reduction in gather passes for
    gather-bound samplers (TPU gathers cost per index, not per channel).
    """
    C = img.shape[-1]
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=-1
    )
    return packed  # [H+1, W+1, 4C]


def sample_bilinear_packed(packed, uv, channels: int):
    """Bilinear sampling using a pack_bilinear_corners image — exact same
    result as sample_image_at_uv(img, uv, "bilinear"), one gather."""
    x = uv[..., 0]
    y = uv[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    idx_y = y0.astype(jnp.int32) + 1
    idx_x = x0.astype(jnp.int32) + 1
    quad = _gather_2d(packed, idx_y, idx_x)  # [..., 4C]
    v00 = quad[..., :channels]
    v01 = quad[..., channels : 2 * channels]
    v10 = quad[..., 2 * channels : 3 * channels]
    v11 = quad[..., 3 * channels :]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def grid_sample_2d(img, grid_norm, mode: str = "bilinear"):
    """torch-compatible entry point on normalized [-1, 1] grid coords.

    img: [H, W, C]; grid_norm: [..., 2] with (gx, gy) normalized as torch.
    """
    H, W = img.shape[0], img.shape[1]
    x = (grid_norm[..., 0] + 1.0) * 0.5 * W - 0.5
    y = (grid_norm[..., 1] + 1.0) * 0.5 * H - 0.5
    return sample_image_at_uv(img, jnp.stack([x, y], axis=-1), mode=mode)


def _gather_3d(vol, i0, i1, i2):
    """vol: [D0, D1, D2, C]; zero padding for out-of-bounds."""
    D0, D1, D2 = vol.shape[0], vol.shape[1], vol.shape[2]
    inb = (i0 >= 0) & (i0 < D0) & (i1 >= 0) & (i1 < D1) & (i2 >= 0) & (i2 < D2)
    c0 = jnp.clip(i0, 0, D0 - 1)
    c1 = jnp.clip(i1, 0, D1 - 1)
    c2 = jnp.clip(i2, 0, D2 - 1)
    vals = vol[c0, c1, c2]
    return jnp.where(inb[..., None], vals, 0.0)


def trilinear_sample(vol, coords, mode: str = "bilinear"):
    """Sample a [D0, D1, D2, C] volume at continuous index coords [..., 3].

    coords[..., i] indexes volume axis i directly (array index space). This is
    what the reference's mesh-extraction sampling reduces to: it builds
    g = (verts + 0.5) / nvox * 2 - 1 and permutes to torch's (x=last-axis)
    order (clipfusion.py:741-760); the unnormalization cancels back to `verts`.
    """
    c0, c1, c2 = coords[..., 0], coords[..., 1], coords[..., 2]
    if mode == "nearest":
        return _gather_3d(
            vol,
            jnp.round(c0).astype(jnp.int32),
            jnp.round(c1).astype(jnp.int32),
            jnp.round(c2).astype(jnp.int32),
        )
    if mode == "bilinear":
        f0 = jnp.floor(c0)
        f1 = jnp.floor(c1)
        f2 = jnp.floor(c2)
        t0 = (c0 - f0)[..., None]
        t1 = (c1 - f1)[..., None]
        t2 = (c2 - f2)[..., None]
        i0 = f0.astype(jnp.int32)
        i1 = f1.astype(jnp.int32)
        i2 = f2.astype(jnp.int32)
        out = 0.0
        for d0 in (0, 1):
            for d1 in (0, 1):
                for d2 in (0, 1):
                    w = (
                        (t0 if d0 else 1 - t0)
                        * (t1 if d1 else 1 - t1)
                        * (t2 if d2 else 1 - t2)
                    )
                    out = out + w * _gather_3d(vol, i0 + d0, i1 + d1, i2 + d2)
        return out
    raise ValueError(f"unknown mode: {mode}")


def trilinear_sample_flat(flat, nvox, coords, mode: str = "bilinear"):
    """trilinear_sample over a FLATTENED volume buffer.

    flat: [Nbuf, C] row-major flattening of a [d0, d1, d2, C] volume; Nbuf
    may exceed prod(nvox) (bucket padding — the tail is never read because
    out-of-bounds is decided against `nvox`). nvox: int32[3], a TRACED
    value — so a jit of this function is keyed only on (Nbuf, coords shape,
    C, mode), not on the per-scan grid dims. That keying is the point: on
    the TPU sandbox every new eager-op shape costs a serialized remote
    compile, and scan grids never repeat their dims exactly.
    """
    d0 = nvox[0]
    d1 = nvox[1]
    d2 = nvox[2]

    def gather(i0, i1, i2):
        inb = (
            (i0 >= 0) & (i0 < d0) & (i1 >= 0) & (i1 < d1)
            & (i2 >= 0) & (i2 < d2)
        )
        idx = (
            jnp.clip(i0, 0, d0 - 1) * d1 + jnp.clip(i1, 0, d1 - 1)
        ) * d2 + jnp.clip(i2, 0, d2 - 1)
        vals = flat[idx]
        return jnp.where(inb[..., None], vals, 0.0)

    c0, c1, c2 = coords[..., 0], coords[..., 1], coords[..., 2]
    if mode == "nearest":
        return gather(
            jnp.round(c0).astype(jnp.int32),
            jnp.round(c1).astype(jnp.int32),
            jnp.round(c2).astype(jnp.int32),
        )
    if mode == "bilinear":
        f0, f1, f2 = jnp.floor(c0), jnp.floor(c1), jnp.floor(c2)
        t0 = (c0 - f0)[..., None]
        t1 = (c1 - f1)[..., None]
        t2 = (c2 - f2)[..., None]
        i0 = f0.astype(jnp.int32)
        i1 = f1.astype(jnp.int32)
        i2 = f2.astype(jnp.int32)
        out = 0.0
        for d0_ in (0, 1):
            for d1_ in (0, 1):
                for d2_ in (0, 1):
                    w = (
                        (t0 if d0_ else 1 - t0)
                        * (t1 if d1_ else 1 - t1)
                        * (t2 if d2_ else 1 - t2)
                    )
                    out = out + w * gather(i0 + d0_, i1 + d1_, i2 + d2_)
        return out
    raise ValueError(f"unknown mode: {mode}")


def grid_sample_3d(vol, grid_norm, mode: str = "bilinear"):
    """torch-compatible 3D entry point. vol: [D0, D1, D2, C].

    grid_norm [..., 3] holds normalized coords in (x, y, z) = (axis2, axis1,
    axis0) torch order, matching grid_sample's convention.
    """
    D0, D1, D2 = vol.shape[0], vol.shape[1], vol.shape[2]
    c2 = (grid_norm[..., 0] + 1.0) * 0.5 * D2 - 0.5
    c1 = (grid_norm[..., 1] + 1.0) * 0.5 * D1 - 0.5
    c0 = (grid_norm[..., 2] + 1.0) * 0.5 * D0 - 0.5
    return trilinear_sample(vol, jnp.stack([c0, c1, c2], axis=-1), mode=mode)
