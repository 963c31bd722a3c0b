"""Frame integration into the FusionGrid — the XLA reference path.

Semantics match ClipFusion.integrate / ClipSeemFusion.integrate
(clipfusion.py:627-721, clip_seem_fusion.py:676-822) exactly, reformulated as
order-independent sum-form updates (see voxel_grid.py):

  1. project every voxel into the frame: xyz_cam = R^T (x - t), uvz = K xyz_cam
  2. sample depth (nearest), sdf = (depth - z) / trunc, tsdf = clamp(sdf, -1, 1)
  3. _valid = in-frustum & z > 0
     tsdf update mask: _valid & sdf > -1        (free space included)
     feature update mask: _valid & |sdf| <= 1   (near-surface only)
  4. rgb sampled (nearest in ClipFusion, bilinear in ClipSeemFusion), CLIP
     features bilinear from the low-res patch-feature image, labels nearest
     from the panoptic mask; all accumulated with per-observation weight 1.

The whole frame batch is integrated by one jitted lax.scan over frames — the
grid stays in HBM, XLA fuses the projection/sample/update per step. The Pallas
kernel in pallas_fusion.py accelerates the dominant feat_sum update by turning
the bilinear splat into an MXU matmul; this module is the correctness oracle.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import project_points, world_to_cam, in_frustum_mask
from ..core.sampling import sample_image_at_uv
from .voxel_grid import FrameBatch, FusionGrid, accumulate_label_hist


def voxel_world_coords(nvox, origin, voxel_size):
    """[N, 3] world coordinates of voxel centers: idx * voxel_size + origin
    (reference clipfusion.py:617-622)."""
    nx, ny, nz = nvox
    ii = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 2)
    idx = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3).astype(jnp.float32)
    return idx * voxel_size + jnp.asarray(origin, jnp.float32)


def decode_flat_coords(nvox, origin, voxel_size, flat):
    """World coords of voxel centers for an ARBITRARY array of flat indices.

    `flat` may be any int32 array (not necessarily contiguous); out-of-grid
    indices (>= prod(nvox)) clamp to the last voxel and are reported False in
    the returned in_grid mask. nvox may be traced (grid dims are data, not
    compile-time constants — see FusionGrid.nvox).
    """
    nvox = jnp.asarray(nvox, jnp.int32)
    ny = nvox[1]
    nz = nvox[2]
    n = nvox[0] * ny * nz
    in_grid = flat < n
    safe = jnp.minimum(flat, n - 1)
    i0 = safe // (ny * nz)
    rem = safe % (ny * nz)
    i1 = rem // nz
    i2 = rem % nz
    idx = jnp.stack([i0, i1, i2], axis=-1).astype(jnp.float32)
    return idx * voxel_size + jnp.asarray(origin, jnp.float32), in_grid


def voxel_world_coords_flat(nvox, origin, voxel_size, start, count: int):
    """World coords for the flat-index range [start, start+count).

    Used by the sharded integrator: each device shard owns a contiguous flat
    slice of the (possibly padded) voxel buffer. `start` and `nvox` may be
    traced values — grid DIMENSIONS are data, not compile-time constants, so
    scenes of different sizes share one executable. Returns (xyz [count, 3],
    in_grid [count] bool) where in_grid masks padding voxels past
    prod(nvox).
    """
    flat = start + jax.lax.broadcasted_iota(jnp.int32, (count, 1), 0)[:, 0]
    return decode_flat_coords(nvox, origin, voxel_size, flat)


def frame_geometry(grid: FusionGrid, xyz_world, depth, pose, K, labels=None):
    """Per-frame projection + sdf (+ optional fused label sampling).

    When `labels` is given, it rides along in the same nearest gather as the
    depth image (identical indices and rounding mode) — one gather pass
    instead of two. Returns (uv, tsdf, tsdf_valid, feat_valid[, lab])."""
    H, W = depth.shape
    xyz_cam = world_to_cam(xyz_world, pose)  # [N, 3]
    uv, z = project_points(xyz_cam, K)  # [N, 2], [N]
    frustum = in_frustum_mask(uv, z, W, H)
    # Voxels on the camera plane (z == 0) project to inf/NaN uv. The frustum
    # mask already rejects them (NaN/inf comparisons are false, matching the
    # reference's normalized-grid bound check), but sampling images at
    # non-finite uv returns NaN, and `NaN * 0-weight` would poison the
    # accumulators of voxels that were never validly observed. Sanitize uv to
    # a harmless in-range coordinate; every consumer weights by the validity
    # masks below, so the sampled value at these voxels never contributes.
    uv = jnp.where(jnp.isfinite(uv), uv, 0.0)

    if labels is None:
        d = sample_image_at_uv(depth[..., None], uv, mode="nearest")[..., 0]
        lab = None
    else:
        packed = jnp.stack([depth, labels.astype(jnp.float32)], axis=-1)
        s = sample_image_at_uv(packed, uv, mode="nearest")
        d = s[..., 0]
        lab = s[..., 1].astype(jnp.int32)
    sdf = (d - z) / grid.trunc
    tsdf = jnp.clip(sdf, -1.0, 1.0)

    tsdf_valid = frustum & (sdf > -1.0)
    feat_valid = frustum & (jnp.abs(sdf) <= 1.0)
    if labels is None:
        return uv, tsdf, tsdf_valid, feat_valid
    return uv, tsdf, tsdf_valid, feat_valid, lab


# Quantization of the opt-in proximity-weighted label vote (see
# label_vote_weights): votes stay small integers so the histogram keeps its
# int32 accumulators and the reference's argmax-with-check read side.
# Swept on the hermetic eval: Q=16 linear beat Q=8 and sharper power curves
# on every seed tested (evals/synthetic.py, 0.05 m, seeds 0-2).
LABEL_VOTE_QUANT = 16


def label_vote_weights(tsdf, feat_valid):
    """Opt-in surface-proximity label-vote weights (label_vote_mode=
    "near_surface").

    The reference scatters one uniform vote per valid observation
    (clip_seem_fusion.py:820-822): a voxel at the truncation-shell edge
    counts as much as one on the measured surface. Misvotes concentrate
    exactly there — at occlusion boundaries and grazing views a near-A
    voxel projects into a pixel of object B with a large depth mismatch
    (|sdf| -> 1). Weighting each vote by surface proximity keeps every
    observation counted (min vote 1, so coverage is unchanged) while
    on-surface observations dominate the argmax:

        vote = 1 + round((Q-1) * max(0, 1 - |tsdf|)),  Q = 16

    Measured on the hermetic synthetic eval (ground-truth segmenter, so 2D
    label noise is zero and only geometric misvotes remain): mIoU
    +0.18..+0.27 pts across seeds at 0.05 m voxels, never negative
    (evals/synthetic.py --label-votes near_surface). With a real (noisy)
    segmenter the shell-misvote term this suppresses is strictly larger.
    Default stays "uniform" (exact reference parity).
    """
    prox = jnp.clip(1.0 - jnp.abs(tsdf), 0.0, 1.0)
    votes = 1 + jnp.round((LABEL_VOTE_QUANT - 1) * prox).astype(jnp.int32)
    return votes * feat_valid.astype(jnp.int32)


def sample_feat_img(feat_img, uv, imwidth, imheight):
    """Bilinear-sample the low-res patch-feature image at full-res pixel
    coordinates. The reference samples the [Py, Px] feature map with the same
    normalized grid as the full image (clipfusion.py:708-713), i.e. the patch
    map is treated as a downsampled image over the same extent."""
    py, px = feat_img.shape[0], feat_img.shape[1]
    scale = jnp.array([px / imwidth, py / imheight], jnp.float32)
    uv_patch = (uv + 0.5) * scale - 0.5
    return sample_image_at_uv(feat_img, uv_patch, mode="bilinear")


def integrate_one_frame(
    grid: FusionGrid,
    xyz_world,
    depth,
    rgb,
    pose,
    K,
    feat_img,
    labels=None,
    frame_valid=True,
    rgb_mode: str = "bilinear",
    vox_valid=None,
    label_vote_mode: str = "uniform",
) -> FusionGrid:
    """Accumulate a single frame. Pure function; used inside lax.scan."""
    H, W = depth.shape
    track_labels = grid.label_hist is not None
    if track_labels:
        if labels is None:
            raise ValueError("grid tracks labels but frame has none")
        uv, tsdf, tsdf_valid, feat_valid, lab = frame_geometry(
            grid, xyz_world, depth, pose, K, labels
        )
    else:
        uv, tsdf, tsdf_valid, feat_valid = frame_geometry(
            grid, xyz_world, depth, pose, K
        )
    fv = jnp.asarray(frame_valid)
    tsdf_valid = tsdf_valid & fv
    feat_valid = feat_valid & fv
    if vox_valid is not None:
        tsdf_valid = tsdf_valid & vox_valid
        feat_valid = feat_valid & vox_valid

    tsdf_w = tsdf_valid.astype(jnp.float32)
    feat_w = feat_valid.astype(jnp.float32)

    rgb_s = sample_image_at_uv(rgb, uv, mode=rgb_mode)  # [N, 3]
    feat_s = sample_feat_img(feat_img, uv, W, H)  # [N, C]

    new = dict(
        tsdf_sum=grid.tsdf_sum + tsdf * tsdf_w,
        tsdf_w=grid.tsdf_w + tsdf_valid.astype(jnp.int32),
        rgb_sum=grid.rgb_sum + rgb_s * feat_w[:, None],
        feat_sum=(grid.feat_sum + (feat_s * feat_w[:, None]).astype(grid.feat_sum.dtype)),
        w=grid.w + feat_valid.astype(jnp.int32),
    )
    if track_labels:
        num_classes = grid.label_hist.shape[1]
        onehot = jax.nn.one_hot(lab, num_classes, dtype=jnp.int32)
        if label_vote_mode == "near_surface":
            vote = label_vote_weights(tsdf, feat_valid)
        else:
            vote = feat_valid.astype(jnp.int32)
        new["label_hist"] = accumulate_label_hist(
            grid.label_hist, onehot * vote[:, None]
        )
    return grid.replace(**new)


def integrate_frames_impl(
    grid: FusionGrid,
    frames: FrameBatch,
    rgb_mode: str = "bilinear",
    voxel_start=0,
    label_vote_mode: str = "uniform",
) -> FusionGrid:
    """Integrate a FrameBatch with a lax.scan over frames.

    `voxel_start` is the global flat index of this grid buffer's first voxel
    (nonzero inside a voxel-sharded shard_map body; may be traced). Padding
    voxels past prod(nvox) never accumulate.
    """
    count = grid.tsdf_sum.shape[0]
    xyz_world, vox_valid = voxel_world_coords_flat(
        grid.nvox, grid.origin, grid.voxel_size, voxel_start, count
    )

    def step(g, frame):
        depth, rgb, pose, K, feat_img, labels, fv = frame
        g = integrate_one_frame(
            g, xyz_world, depth, rgb, pose, K, feat_img, labels, fv,
            rgb_mode=rgb_mode, vox_valid=vox_valid,
            label_vote_mode=label_vote_mode,
        )
        return g, None

    if grid.label_hist is not None:
        if frames.labels is None:
            raise ValueError("grid tracks labels but FrameBatch.labels is None")
        labels_xs = frames.labels
    else:
        labels_xs = jnp.zeros((frames.num_frames, 1, 1), jnp.int32)
    xs = (
        frames.depth,
        frames.rgb,
        frames.pose,
        frames.K,
        frames.feat_img,
        labels_xs,
        frames.frame_valid,
    )
    grid, _ = jax.lax.scan(step, grid, xs)
    return grid


@functools.partial(
    jax.jit, static_argnames=("rgb_mode", "label_vote_mode"),
    donate_argnums=(0,),
)
def integrate_frames(
    grid: FusionGrid, frames: FrameBatch, rgb_mode: str = "bilinear",
    label_vote_mode: str = "uniform",
) -> FusionGrid:
    """Jitted single-process entry point; grid donated (in-place in HBM)."""
    return integrate_frames_impl(
        grid, frames, rgb_mode=rgb_mode, voxel_start=0,
        label_vote_mode=label_vote_mode,
    )


def einsum_feature_splat(feat_sum, uvw, feat_imgs, block_voxels: int = 262144):
    """XLA-only chunk-batched feature splat: materialize the bilinear weight
    tensor W [bs, F, P] one voxel block at a time and contract it against
    the patch features as an MXU matmul:

        feat_sum[block] += reshape(W, [bs, F*P]) @ reshape(feat_imgs, [F*P, C])

    Same F-fold reduction in feat_sum HBM traffic as the Pallas kernel
    (W costs one write+read instead of F grid read-modify-writes), with no
    custom-kernel compile. Blocks (lax.map, sequential) bound the transient
    W to bs*F*P floats, so 0.02 m-scale grids (millions of voxels) fit.
    Accumulation uses the MXU's default (bf16-multiply) f32 precision —
    ~1e-3 relative, irrelevant for CLIP-feature averaging.
    """
    N = uvw.shape[0]
    F, Py, Px, C = feat_imgs.shape
    P = Py * Px
    feat_flat = feat_imgs.reshape(F * P, C)

    bs = min(block_voxels, N)
    nb = -(-N // bs)
    n_pad = nb * bs - N
    uvw_p = jnp.pad(uvw, ((0, n_pad), (0, 0), (0, 0)))  # val=0 rows: no-op

    def block(u):
        px = u[..., 0]
        py = u[..., 1]
        val = u[..., 2]
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        W = jnp.zeros((bs, F, P), jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0.astype(jnp.int32) + dx
                cy = y0.astype(jnp.int32) + dy
                wx = fx if dx else (1.0 - fx)
                wy = fy if dy else (1.0 - fy)
                w = wx * wy * val
                inb = (cx >= 0) & (cx < Px) & (cy >= 0) & (cy < Py)
                idx = jnp.where(inb, cy * Px + cx, P)  # P = dead slot
                W = W + jax.nn.one_hot(idx, P, dtype=jnp.float32) * w[..., None]
        return jax.lax.dot(
            W.reshape(bs, F * P), feat_flat,
            preferred_element_type=jnp.float32,
        )

    contrib = jax.lax.map(block, uvw_p.reshape(nb, bs, F, 3))
    contrib = contrib.reshape(nb * bs, C)[:N]
    return feat_sum + contrib.astype(feat_sum.dtype)


def blocked_label_splat(label_hist, labs, valids, block_voxels: int = 131072):
    """Chunk-batched label-histogram accumulation.

    labs [F, N] i32 sampled class ids, valids [F, N] bool — or i32 VOTE
    WEIGHTS (0 = invalid), which accumulate as weighted votes (the
    near_surface label_vote_mode). Accumulates all F frames' one-hots into
    label_hist with ONE read-modify-write of the histogram instead of F
    (the per-frame scan RMW is the second-largest traffic term after
    features). Voxel blocks (lax.map) bound the one-hot transient.
    """
    F, N = labs.shape
    L = label_hist.shape[1]
    bs = min(block_voxels, N)
    nb = -(-N // bs)
    n_pad = nb * bs - N
    labs_p = jnp.pad(labs, ((0, 0), (0, n_pad)))
    valids_p = jnp.pad(valids, ((0, 0), (0, n_pad)))

    def block(args):
        lb, vb = args  # [F, bs]
        contrib = jnp.zeros((bs, L), jnp.int32)
        for f in range(F):
            onehot = jax.nn.one_hot(lb[f], L, dtype=jnp.int32)
            contrib = contrib + onehot * vb[f][:, None].astype(jnp.int32)
        return contrib

    contrib = jax.lax.map(
        block,
        (
            labs_p.reshape(F, nb, bs).transpose(1, 0, 2),
            valids_p.reshape(F, nb, bs).transpose(1, 0, 2),
        ),
    )
    return accumulate_label_hist(label_hist, contrib.reshape(nb * bs, L)[:N])


def integrate_frames_hybrid_impl(
    grid: FusionGrid,
    frames: FrameBatch,
    rgb_mode: str = "bilinear",
    voxel_start=0,
    tile: int = 512,
    interpret: bool = False,
    splat: str = "pallas",
    label_vote_mode: str = "uniform",
) -> FusionGrid:
    """Hybrid integration: XLA scan for tsdf/rgb/labels + ONE chunk-batched
    pass for the dominant [N, C] CLIP-feature accumulation — either the
    Pallas fused kernel (splat="pallas", see pallas_fusion.py) or the
    portable XLA einsum formulation (splat="einsum").

    Numerically equivalent to integrate_frames up to matmul reassociation;
    HBM traffic on feat_sum drops by the chunk size F.
    """
    from .pallas_fusion import fused_feature_splat

    count = grid.tsdf_sum.shape[0]
    xyz_world, vox_valid = voxel_world_coords_flat(
        grid.nvox, grid.origin, grid.voxel_size, voxel_start, count
    )
    F_, H, W = frames.depth.shape
    Py, Px = frames.feat_img.shape[1], frames.feat_img.shape[2]
    patch_scale = jnp.array([Px / W, Py / H], jnp.float32)

    def step(g, frame):
        depth, rgb, pose, K, labels, fv = frame
        if g.label_hist is not None:
            uv, tsdf, tsdf_valid, feat_valid, lab = frame_geometry(
                g, xyz_world, depth, pose, K, labels
            )
        else:
            uv, tsdf, tsdf_valid, feat_valid = frame_geometry(
                g, xyz_world, depth, pose, K
            )
        tsdf_valid = tsdf_valid & fv & vox_valid
        feat_valid = feat_valid & fv & vox_valid
        feat_w = feat_valid.astype(jnp.float32)

        if rgb_mode == "bilinear":
            # corner-packed single-gather bilinear (TPU gathers cost per
            # index; this replaces 4 gather passes with 1)
            from ..core.sampling import (
                pack_bilinear_corners,
                sample_bilinear_packed,
            )

            rgb_s = sample_bilinear_packed(
                pack_bilinear_corners(rgb), uv, channels=3
            )
        else:
            rgb_s = sample_image_at_uv(rgb, uv, mode=rgb_mode)
        new = dict(
            tsdf_sum=g.tsdf_sum + tsdf * tsdf_valid.astype(jnp.float32),
            tsdf_w=g.tsdf_w + tsdf_valid.astype(jnp.int32),
            rgb_sum=g.rgb_sum + rgb_s * feat_w[:, None],
            w=g.w + feat_valid.astype(jnp.int32),
        )
        uv_patch = (uv + 0.5) * patch_scale - 0.5
        uvw = jnp.concatenate([uv_patch, feat_w[:, None]], axis=-1)
        if g.label_hist is None:
            lab = jnp.zeros((), jnp.int32)  # placeholder ys leaf
        if g.label_hist is not None and label_vote_mode == "near_surface":
            vote = label_vote_weights(tsdf, feat_valid)
        else:
            vote = jnp.zeros((), jnp.int32)  # placeholder ys leaf
        return g.replace(**new), (uvw, lab, vote)

    if grid.label_hist is not None:
        if frames.labels is None:
            raise ValueError("grid tracks labels but FrameBatch.labels is None")
        labels_xs = frames.labels
    else:
        labels_xs = jnp.zeros((frames.num_frames, 1, 1), jnp.int32)

    xs = (frames.depth, frames.rgb, frames.pose, frames.K, labels_xs,
          frames.frame_valid)
    grid, (uvws, labs, votes) = jax.lax.scan(step, grid, xs)  # uvws [F, N, 3]
    uvw = jnp.transpose(uvws, (1, 0, 2))  # [N, F, 3]

    if grid.label_hist is not None:
        label_hist = blocked_label_splat(
            grid.label_hist, labs,
            votes if label_vote_mode == "near_surface"
            else uvws[:, :, 2] > 0,
        )
        grid = grid.replace(label_hist=label_hist)

    if splat == "einsum":
        feat_sum = einsum_feature_splat(grid.feat_sum, uvw, frames.feat_img)
    else:
        feat_sum = fused_feature_splat(
            grid.feat_sum, uvw, frames.feat_img, tile=tile,
            interpret=interpret,
        )
    return grid.replace(feat_sum=feat_sum)


@functools.partial(
    jax.jit,
    static_argnames=("rgb_mode", "tile", "interpret", "label_vote_mode"),
    donate_argnums=(0,),
)
def integrate_frames_pallas(
    grid: FusionGrid,
    frames: FrameBatch,
    rgb_mode: str = "bilinear",
    tile: int = 512,
    interpret: bool = False,
    label_vote_mode: str = "uniform",
) -> FusionGrid:
    """Jitted hybrid (XLA + Pallas) integration entry point."""
    return integrate_frames_hybrid_impl(
        grid, frames, rgb_mode=rgb_mode, voxel_start=0, tile=tile,
        interpret=interpret, label_vote_mode=label_vote_mode,
    )


@functools.partial(
    jax.jit, static_argnames=("rgb_mode", "label_vote_mode"),
    donate_argnums=(0,),
)
def integrate_frames_einsum(
    grid: FusionGrid, frames: FrameBatch, rgb_mode: str = "bilinear",
    label_vote_mode: str = "uniform",
) -> FusionGrid:
    """Jitted hybrid (XLA scan + einsum splat) entry point — the portable
    chunk-batched fast path (no custom kernels)."""
    return integrate_frames_hybrid_impl(
        grid, frames, rgb_mode=rgb_mode, voxel_start=0, splat="einsum",
        label_vote_mode=label_vote_mode,
    )


def sample_rgb_mode(rgb_img, uv_pix, rgb_mode: str):
    """One frame's rgb sample at PIXEL uv under the configured mode —
    shared by the sparse and brick integrators (identical math, one
    definition)."""
    if rgb_mode == "bilinear":
        from ..core.sampling import (
            pack_bilinear_corners,
            sample_bilinear_packed,
        )

        return sample_bilinear_packed(
            pack_bilinear_corners(rgb_img), uv_pix, channels=3
        )
    return sample_image_at_uv(rgb_img, uv_pix, mode=rgb_mode)


def pixel_uvw_to_patch(uvw_arr, patch_scale):
    """The dense einsum path's exact patch-coordinate expression, applied
    at splat time to carried pixel uv (a patch->pixel round trip is not
    bit-exact in f32 — see integrate_frames_sparse_impl)."""
    return jnp.concatenate(
        [(uvw_arr[..., :2] + 0.5) * patch_scale - 0.5,
         uvw_arr[..., 2:]], axis=-1,
    )


def integrate_frames_sparse_impl(
    grid: FusionGrid,
    frames: FrameBatch,
    rgb_mode: str = "bilinear",
    capacity: int = 0,
    with_count: bool = False,
    label_vote_mode: str = "uniform",
    voxel_start=0,
):
    """Sparse-active-voxel integration.

    TSDF updates are inherently dense (free-space carving covers the
    frustum), but the expensive channels — RGB, CLIP features, labels —
    only apply to near-surface voxels (|sdf| <= 1). This integrator runs the
    dense geometry/TSDF scan, takes the chunk's UNION of near-surface
    voxels, and when it fits in `capacity` slots does all per-voxel gathers
    and accumulator updates on that subset only (gathers and grid RMWs
    shrink by the sparsity factor). If the union overflows capacity the
    whole chunk falls back to the dense einsum path inside the same jit
    (lax.cond) — results are ALWAYS exact, capacity only affects speed.

    `voxel_start` (may be traced): the grid buffer's first row corresponds
    to this GLOBAL flat voxel index — the voxel-sharded step runs this impl
    per shard (parallel/sharded.py). nonzero's fill slots drain into an
    appended dead compaction slot (zero weight in every frame), so no
    padding row in the buffer is required.
    """
    N_buf = grid.tsdf_sum.shape[0]
    xyz_world, vox_valid = voxel_world_coords_flat(
        grid.nvox, grid.origin, grid.voxel_size, voxel_start, N_buf
    )
    F_, H, W = frames.depth.shape
    Py, Px = frames.feat_img.shape[1], frames.feat_img.shape[2]
    patch_scale = jnp.array([Px / W, Py / H], jnp.float32)
    capacity = capacity or max(1024, N_buf // 4)

    track_labels = grid.label_hist is not None
    if track_labels and frames.labels is None:
        raise ValueError("grid tracks labels but FrameBatch.labels is None")

    # ---- phase 1: dense geometry scan (tsdf only) ----
    def step(g, frame):
        depth, pose, K, labels, fv = frame
        if track_labels:
            uv, tsdf, tsdf_valid, feat_valid, lab = frame_geometry(
                g, xyz_world, depth, pose, K, labels
            )
        else:
            uv, tsdf, tsdf_valid, feat_valid = frame_geometry(
                g, xyz_world, depth, pose, K
            )
            lab = jnp.zeros((N_buf,), jnp.int32)
        tsdf_valid = tsdf_valid & fv & vox_valid
        feat_valid = feat_valid & fv & vox_valid
        g = g.replace(
            tsdf_sum=g.tsdf_sum + tsdf * tsdf_valid.astype(jnp.float32),
            tsdf_w=g.tsdf_w + tsdf_valid.astype(jnp.int32),
        )
        # carry PIXEL uv (not patch coords): rgb then samples the exact
        # coordinates the dense oracle samples — the old patch->pixel
        # round trip ((uv+0.5)*s, later /s) is not bit-exact in f32 at
        # non-power-of-two patch scales and could flip a 'nearest' pixel
        # on knife-edge coordinates. The feature splat derives patch
        # coords at use time with the dense path's exact expression
        # (to_patch below).
        uvw = jnp.concatenate(
            [uv, feat_valid.astype(jnp.float32)[:, None]], axis=-1
        )
        if track_labels and label_vote_mode == "near_surface":
            vote = label_vote_weights(tsdf, feat_valid)
        else:
            vote = jnp.zeros((), jnp.int32)  # placeholder ys leaf
        return g, (uvw, lab, vote)

    labels_xs = (
        frames.labels if track_labels
        else jnp.zeros((frames.num_frames, 1, 1), jnp.int32)
    )
    xs = (frames.depth, frames.pose, frames.K, labels_xs, frames.frame_valid)
    grid, (uvws, labs, votes) = jax.lax.scan(step, grid, xs)
    weighted_votes = label_vote_mode == "near_surface"

    valids = uvws[:, :, 2] > 0  # [F, N]
    w_counts = valids.sum(axis=0).astype(jnp.int32)  # [N]
    union = valids.any(axis=0)
    count = union.sum()

    def rgb_sample(rgb_img, uv_pix):
        return sample_rgb_mode(rgb_img, uv_pix, rgb_mode)

    def to_patch(uvw_arr):
        return pixel_uvw_to_patch(uvw_arr, patch_scale)

    # ---- phase 2a: sparse branch ----
    def sparse_branch(g):
        # nonzero's fill slots point at an APPENDED dead slot (w = 0 in
        # every frame): its contributions are structurally zero and the
        # out-of-range scatter index N_buf drops (mode="drop"), so no
        # buffer padding row is needed — shard-local buffers (voxel_start
        # > 0) have no padding rows at all
        (active,) = jnp.nonzero(union, size=capacity, fill_value=N_buf)
        uvw_pad = jnp.pad(uvws, ((0, 0), (0, 1), (0, 0)))
        labs_pad = jnp.pad(labs, ((0, 0), (0, 1)))
        w_counts_pad = jnp.pad(w_counts, (0, 1))
        uvw_a = jnp.take(uvw_pad, active, axis=1)  # [F, K, 3]
        labs_a = jnp.take(labs_pad, active, axis=1)  # [F, K]

        def rgb_step(acc, frame):
            rgb_img, uvw_f = frame
            s = rgb_sample(rgb_img, uvw_f[:, :2])  # exact pixel uv
            return acc + s * uvw_f[:, 2:3], None

        rgb_contrib, _ = jax.lax.scan(
            rgb_step, jnp.zeros((capacity, 3), jnp.float32),
            (frames.rgb, uvw_a),
        )

        feat_contrib = einsum_feature_splat(
            jnp.zeros((capacity, g.feat_sum.shape[1]), g.feat_sum.dtype),
            jnp.transpose(to_patch(uvw_a), (1, 0, 2)),
            frames.feat_img,
        )

        new = dict(
            rgb_sum=g.rgb_sum.at[active].add(rgb_contrib, mode="drop"),
            w=g.w.at[active].add(
                jnp.take(w_counts_pad, active), mode="drop"
            ),
            feat_sum=g.feat_sum.at[active].add(feat_contrib, mode="drop"),
        )
        if track_labels:
            hist_contrib = blocked_label_splat(
                jnp.zeros((capacity, g.label_hist.shape[1]), jnp.int32),
                labs_a,
                jnp.take(jnp.pad(votes, ((0, 0), (0, 1))), active, axis=1)
                if weighted_votes else uvw_a[:, :, 2] > 0,
            )
            # gather/saturate/set instead of scatter-add: keeps the
            # narrow-dtype histogram's saturating-update contract (active
            # indices are unique; fill slots at N_buf drop)
            old_rows = g.label_hist.at[active].get(
                mode="fill", fill_value=0
            )
            new["label_hist"] = g.label_hist.at[active].set(
                accumulate_label_hist(old_rows, hist_contrib), mode="drop"
            )
        return g.replace(**new)

    # ---- phase 2b: dense fallback ----
    def dense_branch(g):
        def rgb_step(acc, frame):
            rgb_img, uvw_f = frame
            s = rgb_sample(rgb_img, uvw_f[:, :2])  # exact pixel uv
            return acc + s * uvw_f[:, 2:3], None

        rgb_contrib, _ = jax.lax.scan(
            rgb_step, jnp.zeros((N_buf, 3), jnp.float32),
            (frames.rgb, uvws),
        )
        new = dict(
            rgb_sum=g.rgb_sum + rgb_contrib,
            w=g.w + w_counts,
            feat_sum=einsum_feature_splat(
                g.feat_sum, jnp.transpose(to_patch(uvws), (1, 0, 2)),
                frames.feat_img,
            ),
        )
        if track_labels:
            new["label_hist"] = blocked_label_splat(
                g.label_hist, labs,
                votes if weighted_votes else valids,
            )
        return g.replace(**new)

    out = jax.lax.cond(count <= capacity, sparse_branch, dense_branch, grid)
    if with_count:
        return out, count
    return out


@functools.partial(
    jax.jit,
    static_argnames=("rgb_mode", "capacity", "with_count",
                     "label_vote_mode"),
    donate_argnums=(0,),
)
def integrate_frames_sparse(
    grid: FusionGrid,
    frames: FrameBatch,
    rgb_mode: str = "bilinear",
    capacity: int = 0,
    with_count: bool = False,
    label_vote_mode: str = "uniform",
    voxel_start=0,
):
    """Jitted sparse-active-voxel entry point (exact; dense fallback on
    capacity overflow).

    with_count=True additionally returns the chunk's active-voxel union size
    (device i32 scalar) — the feedback signal for the pipeline's adaptive
    capacity sizing (phase-2 cost scales with CAPACITY, not with the actual
    union, so right-sizing it is a measured ~25% end-to-end win at fine
    grids)."""
    return integrate_frames_sparse_impl(
        grid, frames, rgb_mode=rgb_mode, capacity=capacity,
        with_count=with_count, label_vote_mode=label_vote_mode,
        voxel_start=voxel_start,
    )
