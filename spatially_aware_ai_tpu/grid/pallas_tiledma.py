"""Tile-DMA image sampling prototype (ROADMAP perf-next-steps #1, VERDICT r3
next #6): the one identified lever past XLA's flat per-index gather floor.

The production integrators sample the depth(+label) image at every voxel's
projection with an XLA gather: ~1.2 ms per 0.5M indices on v5e regardless of
index order (benchmarks/bench_gather.py) because the VPU has no vector
gather — XLA lowers to a serial per-index loop. This kernel exploits the
SPATIAL structure the flat gather ignores: voxels of an 8^3 brick project
into a small image bbox, so per (brick, frame) we

  1. DMA that bbox tile HBM -> VMEM (offsets from a scalar-prefetch bbox
     array computed by a cheap XLA pre-pass over brick corners),
  2. one-hot ROW matmul on the MXU: R[v, th] = (th == iy[v]) gathers each
     voxel's image row,
  3. one-hot column select on the VPU: out[v] = sum_tw G[v, tw] * (tw == ix[v]).

The per-lane gather becomes an MXU matmul + two compare-iota masks — no
serial element loop anywhere. Out-of-tile voxels (brick too close to the
camera for the static tile) return 0 with valid=False; production would
route those bricks to the XLA gather fallback. The kernel's valid mask is
purely TILE-geometric (it never sees z): callers must sentinel invalid
projections — z <= 0 (mirrored finite uv!) and non-finite — out of every
tile, which brick_voxel_uv does (-1e6). With that contract, in-tile
implies in-image AND z > 0, because a clamped tile lies inside the image.
Nearest-neighbor rounding matches core.sampling.sample_image_at_uv
(jnp.round, torch grid_sample zeros-padding semantics).

Measured A/B vs the XLA gather lives in benchmarks/probe_tiledma.py; the
verdict is recorded in docs/SOL.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane / sublane alignment for the DMA'd tile offsets
_LANE = 128
_SUB = 8


def brick_voxel_uv(nvox, origin, voxel_size, poses, Ks, brick: int = 8):
    """Brick-major projected pixel coords for every voxel of a dense grid.

    The single setup path shared by the A/B probe and the parity test —
    they must sample the SAME (voxel, frame) projections or the measured
    kernel and the tested kernel drift apart.

    Returns (uv [NB, F, V, 2] f32, z [NB, F, V] f32) for cubic bricks of
    `brick`^3 voxels. INVALID projections — z <= 0 (behind-camera voxels
    project to a MIRRORED finite uv that could land inside a tile) and
    non-finite uv — are sentineled to -1e6, far outside every possible
    tile, so the kernel's in-tile mask is False for them by construction
    (the kernel itself never sees z and could not exclude them otherwise).
    """
    import numpy as np

    from ..core.geometry import project_points, world_to_cam

    nb = [-(-int(n) // brick) for n in nvox]
    bx, by, bz = np.meshgrid(*[np.arange(n) for n in nb], indexing="ij")
    base = np.stack([bx, by, bz], -1).reshape(-1, 3) * brick  # [NB, 3]
    ox, oy, oz = np.meshgrid(*[np.arange(brick)] * 3, indexing="ij")
    offs = np.stack([ox, oy, oz], -1).reshape(-1, 3)  # [V, 3]
    idx = base[:, None, :] + offs[None, :, :]  # [NB, V, 3]
    xyz = idx.astype(np.float32) * float(voxel_size) + np.asarray(
        origin, np.float32
    )
    NB, V = xyz.shape[0], brick**3
    uvs, zs = [], []
    for pose, K in zip(poses, Ks):
        cam = world_to_cam(jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(pose))
        uv, z = project_points(cam, jnp.asarray(K))
        uvs.append(np.asarray(uv).reshape(NB, V, 2))
        zs.append(np.asarray(z).reshape(NB, V))
    uv = np.stack(uvs, 1)  # [NB, F, V, 2]
    z = np.stack(zs, 1)
    invalid = ~np.isfinite(uv) | (z <= 0)[..., None]
    uv = np.where(invalid, np.float32(-1e6), uv).astype(np.float32)
    return uv, z.astype(np.float32)


def in_image_mask(uv, z, H: int, W: int):
    """Nearest-rounded in-image mask matching the kernel/gather convention."""
    import numpy as np

    x, y = uv[..., 0], uv[..., 1]
    return (
        (np.round(x) >= 0) & (np.round(x) < W)
        & (np.round(y) >= 0) & (np.round(y) < H) & (z > 0)
    )


def brick_tile_bboxes(uv, valid, tile_h: int, tile_w: int, H: int, W: int):
    """Per (brick, frame) aligned tile origin for the projected voxels.

    Args:
      uv: [NB, F, V, 2] f32 pixel coords (x, y) of each brick voxel.
      valid: [NB, F, V] bool — voxels whose projection should be covered.
    Returns:
      bbox: [NB, F, 2] i32 (y0, x0), sublane/lane-aligned, clamped so the
        tile stays inside the image.
      fits: [NB, F] bool — whether every valid voxel's nearest-neighbor
        pixel landed inside the tile (diagnostic; out-of-tile voxels are
        also flagged per-voxel by the kernel's valid output).
    """
    assert tile_h <= H and tile_w <= W, (
        f"tile ({tile_h}, {tile_w}) exceeds the image ({H}, {W}): the "
        f"clamp ceiling would collapse to 0 and the kernel's static tile "
        f"slice would read past the image edge"
    )
    big = jnp.float32(1e9)
    x = jnp.round(uv[..., 0])
    y = jnp.round(uv[..., 1])
    vx = jnp.where(valid, x, big)
    vy = jnp.where(valid, y, big)
    x_min = jnp.min(vx, axis=-1)
    y_min = jnp.min(vy, axis=-1)
    none_valid = ~valid.any(axis=-1)
    x_min = jnp.where(none_valid, 0.0, x_min)
    y_min = jnp.where(none_valid, 0.0, y_min)
    # align down, clamp so the static tile fits in the image; the clamp
    # ceiling must ITSELF be lane/sublane-aligned (align down, losing right/
    # bottom-edge coverage) or the DMA offset would be misaligned whenever
    # W - tile_w is not a multiple of 128
    x0 = (x_min.astype(jnp.int32) // _LANE) * _LANE
    y0 = (y_min.astype(jnp.int32) // _SUB) * _SUB
    x0 = jnp.clip(x0, 0, (max(W - tile_w, 0) // _LANE) * _LANE)
    y0 = jnp.clip(y0, 0, (max(H - tile_h, 0) // _SUB) * _SUB)
    in_tile = (
        (x >= x0[..., None]) & (x < x0[..., None] + tile_w)
        & (y >= y0[..., None]) & (y < y0[..., None] + tile_h)
    )
    fits = (in_tile | ~valid).all(axis=-1)
    return jnp.stack([y0, x0], axis=-1), fits


def _tile_sample_kernel(
    bbox_ref, uv_ref, img_ref, out_ref, val_ref, tile, sem,
    *, C, F, TH, TW, V,
):
    i = pl.program_id(0)
    f = pl.program_id(1)
    # bbox is FLAT [NB*F*2] in TILING units (y0/8, x0/128). Two real-TPU
    # lowering constraints meet here: (1) Mosaic must PROVE the dynamic
    # HBM slice offsets divide the (8, 128) memref tiling — a raw
    # prefetched scalar is unprovable, a product with the tiling constant
    # is divisible by construction ("Failed to prove that a tile index in
    # dimension 2 is divisible by the tiling (8)"); (2) a multi-dim
    # computed SMEM operand gets lane-padded ([NB, F, 2] -> [NB, F, 128]
    # i32 = 1.6 MB > the 1 MB SMEM — "Allocation would exceed memory
    # (space=smem)"), while a flat 1-D scalar array lays out linearly.
    base = (i * F + f) * 2
    y0 = bbox_ref[base] * _SUB
    x0 = bbox_ref[base + 1] * _LANE

    dma = pltpu.make_async_copy(
        img_ref.at[f, :, pl.ds(y0, TH), pl.ds(x0, TW)], tile, sem
    )
    dma.start()

    u = uv_ref[0, 0, 0, :]  # [V] f32 global pixel x
    v = uv_ref[0, 0, 1, :]
    ix = jnp.round(u).astype(jnp.int32) - x0
    iy = jnp.round(v).astype(jnp.int32) - y0
    inb = (ix >= 0) & (ix < TW) & (iy >= 0) & (iy < TH)
    ixs = jnp.where(inb, ix, 0)
    iys = jnp.where(inb, iy, 0)

    # one-hot row gather on the MXU, one-hot column select on the VPU
    th_iota = jax.lax.broadcasted_iota(jnp.int32, (V, TH), 1)
    R = (th_iota == iys[:, None]).astype(jnp.float32)  # [V, TH]
    tw_iota = jax.lax.broadcasted_iota(jnp.int32, (V, TW), 1)
    colmask = (tw_iota == ixs[:, None]).astype(jnp.float32)  # [V, TW]

    dma.wait()
    inb_f = inb.astype(jnp.float32)
    for c in range(C):
        G = jnp.dot(
            R, tile[c].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # [V, TW]
        out_ref[0, 0, c, :] = jnp.sum(G * colmask, axis=1) * inb_f
    # Mosaic requires the last two block dims be (8k, 128k) or equal the
    # array dims; a [.., F, V] block of (1, V) has an illegal sublane dim,
    # so the valid mask carries a unit axis: [NB, F, 1, V].
    val_ref[0, 0, 0, :] = inb.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "interpret")
)
def tile_sample_nearest(
    img, uv, bbox, *, tile_h: int = 256, tile_w: int = 256,
    interpret: bool = False,
):
    """Nearest-sample C image channels at brick-coherent projections.

    Args:
      img: [F, C, H, W] f32 (channel-first so the DMA'd tile reads as
        aligned [C, TH, TW] planes).
      uv: [NB, F, 2, V] f32 — global pixel (x; y) per brick voxel.
      bbox: [NB, F, 2] i32 aligned tile origins (from brick_tile_bboxes).
    Returns:
      samples [NB, F, C, V] f32 (0 where invalid), in_tile [NB, F, V] bool.
    """
    F, C, H, W = img.shape
    NB, F2, two, V = uv.shape
    assert F == F2 and two == 2, (img.shape, uv.shape)
    assert V % _LANE == 0, f"{V=} must be a lane multiple"

    kernel = functools.partial(
        _tile_sample_kernel, C=C, F=F, TH=tile_h, TW=tile_w, V=V
    )
    # scalar-prefetch the bbox FLAT and in TILING units (see kernel
    # comment): the origins are (8, 128)-aligned by brick_tile_bboxes'
    # construction, so this division is exact
    bbox = (bbox // jnp.array([_SUB, _LANE], jnp.int32)).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB, F),
        in_specs=[
            pl.BlockSpec((1, 1, 2, V), lambda i, f, b: (i, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # img stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, V), lambda i, f, b: (i, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, V), lambda i, f, b: (i, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, tile_h, tile_w), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    samples, in_tile = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NB, F, C, V), jnp.float32),
            jax.ShapeDtypeStruct((NB, F, 1, V), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * NB * F * C * V * tile_h * tile_w,  # row one-hot mm
            bytes_accessed=NB * F * C * tile_h * tile_w * img.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bbox, uv, img)
    return samples, in_tile[:, :, 0, :].astype(jnp.bool_)
