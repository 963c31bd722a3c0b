"""Brick-level frustum-culled frame integration.

The sparse integrator (fusion.py:integrate_frames_sparse_impl) already
restricts the expensive channels (RGB, CLIP features, labels) to the
near-surface voxel union, but its phase-1 geometry/TSDF scan is still dense:
every frame projects ALL N_buf voxels and gathers the depth image at their
pixels, because free-space carving (reference clipfusion.py:681-695,
`sdf > -1` voxels get a TSDF update) covers the whole camera frustum.

That frustum is the key: a voxel center can receive ANY update from a frame
(TSDF or feature) only if it satisfies the reference's validity conditions
(clipfusion.py:656-673 normalized-grid bounds + z > 0, :681 sdf > -1,
:699 |sdf| <= 1), and every one of those conditions is a closed half-space
that is LINEAR in the camera matrix rows:

    z > 0                <->  r2 . x_cam > 0
    u >= -0.5            <->  (r0 + 0.5 r2) . x_cam >= 0
    u <= W - 0.5         <->  ((W - 0.5) r2 - r0) . x_cam >= 0
    v bounds             <->  same with r1 / H
    sdf >= -1            ==>  z <= max(depth) + trunc   (far plane)

(the generalized form with K rows rather than axis-aligned bounds keeps the
test exact for Hypersim's projective K whose bottom row is not [0,0,1],
core/geometry.py:hypersim_M_to_K). This module partitions the flat voxel
buffer into BRICKS of `brick_size` contiguous flat indices, computes each
brick's world AABB (exact min/max over member voxel centers — pure
arithmetic, no gathers), and keeps a brick for the chunk iff, for some valid
frame, the AABB is not entirely outside any of that frame's six planes
(standard conservative plane-AABB test: outside iff m.c + d < -(|m|.e)).
The per-frame geometry scan then runs only on the selected bricks'
voxels — the last dense term in the integrator goes frustum-sparse.

Exactness contract (same as the sparse integrator): culling is conservative,
selected-brick processing reproduces the dense math bit-for-bit on the kept
voxels, and overflowing `brick_capacity` falls back IN-JIT (lax.cond) to the
sparse integrator on the full buffer. Capacity only affects speed, never
results. Phase 2 reuses the sparse integrator's near-surface voxel
compaction *within* the brick-compact buffer, with its own in-jit dense
(-within-bricks) fallback.

TPU notes: the cull itself is NB x F x 6 dot products (trivial); the win is
the phase-1 depth gather + projection shrinking from N_buf to
brick_capacity * brick_size rows per frame. Brick size defaults to 128
(one lane tile): tighter AABBs cull more, and the scatter indices stay
contiguous per brick.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fusion import (
    blocked_label_splat,
    decode_flat_coords,
    einsum_feature_splat,
    frame_geometry,
    integrate_frames_sparse_impl,
    label_vote_weights,
    pixel_uvw_to_patch,
    sample_rgb_mode,
)
from .voxel_grid import FrameBatch, FusionGrid, accumulate_label_hist


def frame_frustum_planes(K, pose, imwidth, imheight, far):
    """World half-space planes [6, 3+1] for one frame.

    Returns (m [6, 3], d [6]) such that a voxel center x can receive an
    update from this frame only if m_i . x + d_i >= 0 for ALL i. Derivation
    in the module docstring; x_cam = R^T (x - t) (core/geometry.py:69-82)
    turns a camera-frame half-space n . x_cam + c >= 0 into the world-frame
    (R n) . x + (c - (R n) . t) >= 0.
    """
    r0, r1, r2 = K[0], K[1], K[2]
    n = jnp.stack(
        [
            r2,                                  # z > 0
            r0 + 0.5 * r2,                       # u >= -0.5
            (imwidth - 0.5) * r2 - r0,           # u <= W - 0.5
            r1 + 0.5 * r2,                       # v >= -0.5
            (imheight - 0.5) * r2 - r1,          # v <= H - 0.5
            -r2,                                 # z <= far (sdf >= -1)
        ]
    )  # [6, 3] camera-frame normals
    const = jnp.concatenate([jnp.zeros((5,), jnp.float32), far[None]])
    R = pose[:3, :3]
    t = pose[:3, 3]
    m = n @ R.T  # row i = R @ n_i
    d = const - m @ t
    return m, d


def active_brick_mask(grid: FusionGrid, frames: FrameBatch, brick_size: int,
                      voxel_start=0):
    """[NB] bool: bricks that may receive any update from this chunk.

    Conservative: a False entry is PROVEN to get no TSDF and no feature
    update from any valid frame. NaN depth/pose/K values fail the exclusion
    comparison and keep the brick (conservative). Pure-padding bricks
    (entirely past prod(nvox)) are always False. `voxel_start` (may be
    traced) offsets the buffer's rows to global flat indices for
    shard-local buffers.
    """
    N_buf = grid.tsdf_sum.shape[0]
    B = brick_size
    NB = -(-N_buf // B)
    F = frames.num_frames

    flat = voxel_start + jax.lax.broadcasted_iota(
        jnp.int32, (NB * B, 1), 0
    )[:, 0]
    xyz, _ = decode_flat_coords(grid.nvox, grid.origin, grid.voxel_size, flat)
    bmin = xyz.reshape(NB, B, 3).min(axis=1)
    bmax = xyz.reshape(NB, B, 3).max(axis=1)
    center = 0.5 * (bmin + bmax)
    extent = 0.5 * (bmax - bmin)

    # far plane from the frame's own depth image: any update needs
    # sdf >= -1, i.e. z <= sampled_depth + trunc <= max(depth) + trunc.
    # max() propagates inf/NaN, which disables the exclusion (conservative).
    far = jnp.max(frames.depth.reshape(F, -1), axis=1) + grid.trunc  # [F]
    m, d = jax.vmap(
        lambda K, pose, f: frame_frustum_planes(
            K, pose, frames.depth.shape[2], frames.depth.shape[1], f
        )
    )(frames.K, frames.pose, far)  # m [F, 6, 3], d [F, 6]

    s = jnp.einsum("nk,fpk->nfp", center, m) + d[None]          # [NB, F, 6]
    r = jnp.einsum("nk,fpk->nfp", extent, jnp.abs(m))
    # rounding margin: the plane form multiplies the frustum inequalities
    # out (u >= -0.5 becomes (r0 + 0.5 r2).x >= 0) while frame_geometry
    # divides then compares — the two f32 evaluations can disagree by a few
    # ulps at the boundary, and a non-conservative cull there would break
    # the bit-for-bit exactness contract. A relative epsilon keeps every
    # boundary voxel in (cull efficiency loss is negligible).
    eps = 1e-5 * (1.0 + jnp.abs(s) + r)
    excluded = jnp.any(s < -(r + eps), axis=2)                  # [NB, F]
    visible = (~excluded) & frames.frame_valid[None, :]
    active = jnp.any(visible, axis=1)

    n_logical = grid.nvox[0] * grid.nvox[1] * grid.nvox[2]
    brick_start = voxel_start + jnp.arange(NB, dtype=jnp.int32) * B
    return active & (brick_start < n_logical)


def integrate_frames_brick_impl(
    grid: FusionGrid,
    frames: FrameBatch,
    rgb_mode: str = "bilinear",
    brick_size: int = 128,
    brick_capacity: int = 0,
    capacity: int = 0,
    with_count: bool = False,
    label_vote_mode: str = "uniform",
    voxel_start=0,
):
    """Brick-culled integration (exact; in-jit fallbacks on overflow).

    Semantics identical to integrate_frames / integrate_frames_sparse_impl
    for any input. brick_capacity bounds the number of brick slots phase 1
    processes; `capacity` bounds the near-surface voxel slots phase 2
    processes (both static — the pipeline right-sizes them adaptively from
    the returned counts). `voxel_start` (may be traced) maps shard-local
    buffer rows to global flat voxel indices so the voxel-sharded step can
    host this integrator per shard (compaction is per-device bookkeeping).
    """
    N_buf = grid.tsdf_sum.shape[0]
    B = brick_size
    NB = -(-N_buf // B)
    brick_capacity = brick_capacity or max(64, NB // 2)
    brick_capacity = min(brick_capacity, NB)
    KBB = brick_capacity * B
    capacity = capacity or max(1024, KBB // 4)
    capacity = min(capacity, KBB)

    track_labels = grid.label_hist is not None
    if track_labels and frames.labels is None:
        raise ValueError("grid tracks labels but FrameBatch.labels is None")
    F, H, W = frames.depth.shape
    Py, Px = frames.feat_img.shape[1], frames.feat_img.shape[2]
    patch_scale = jnp.array([Px / W, Py / H], jnp.float32)
    weighted_votes = label_vote_mode == "near_surface"

    active = active_brick_mask(grid, frames, B, voxel_start=voxel_start)
    nb_count = active.sum()

    labels_xs = (
        frames.labels if track_labels
        else jnp.zeros((frames.num_frames, 1, 1), jnp.int32)
    )
    xs = (frames.depth, frames.pose, frames.K, labels_xs, frames.frame_valid)

    def rgb_sample(rgb_img, uv_pix):
        return sample_rgb_mode(rgb_img, uv_pix, rgb_mode)

    def to_patch(uvw_arr):
        return pixel_uvw_to_patch(uvw_arr, patch_scale)

    def brick_branch(g):
        (sel,) = jnp.nonzero(active, size=brick_capacity, fill_value=NB - 1)
        slot_valid = jnp.arange(brick_capacity) < nb_count  # [KB]
        idx = (
            sel[:, None] * B + jnp.arange(B, dtype=jnp.int32)[None, :]
        ).reshape(-1)  # [KBB]; fill slots duplicate brick NB-1 (zero adds)
        xyz_c, in_grid_c = decode_flat_coords(
            g.nvox, g.origin, g.voxel_size, voxel_start + idx
        )
        # idx < N_buf: when a shard-local buffer length is not a brick
        # multiple, the tail brick's rows past the buffer decode to the
        # NEXT shard's in-grid voxels — their scatters already drop, but
        # without this mask they'd burn phase-2 capacity slots and
        # inflate the with_count feedback the adaptive sizing reads
        vox_ok = in_grid_c & jnp.repeat(slot_valid, B) & (idx < N_buf)

        # ---- phase 1: geometry/TSDF scan on selected bricks only ----
        def step(carry, frame):
            ts, tw = carry
            depth, pose, K, labels, fv = frame
            if track_labels:
                uv, tsdf, tsdf_valid, feat_valid, lab = frame_geometry(
                    g, xyz_c, depth, pose, K, labels
                )
            else:
                uv, tsdf, tsdf_valid, feat_valid = frame_geometry(
                    g, xyz_c, depth, pose, K
                )
                lab = jnp.zeros((KBB,), jnp.int32)
            tsdf_valid = tsdf_valid & fv & vox_ok
            feat_valid = feat_valid & fv & vox_ok
            ts = ts + tsdf * tsdf_valid.astype(jnp.float32)
            tw = tw + tsdf_valid.astype(jnp.int32)
            # PIXEL uv carried; patch coords derived at splat time
            uvw = jnp.concatenate(
                [uv, feat_valid.astype(jnp.float32)[:, None]], axis=-1
            )
            if track_labels and weighted_votes:
                vote = label_vote_weights(tsdf, feat_valid)
            else:
                vote = jnp.zeros((), jnp.int32)
            return (ts, tw), (uvw, lab, vote)

        init = (jnp.zeros((KBB,), jnp.float32), jnp.zeros((KBB,), jnp.int32))
        (ts, tw), (uvws, labs, votes) = jax.lax.scan(step, init, xs)
        new = dict(
            tsdf_sum=g.tsdf_sum.at[idx].add(ts, mode="drop"),
            tsdf_w=g.tsdf_w.at[idx].add(tw, mode="drop"),
        )

        # ---- phase 2: near-surface voxel compaction WITHIN the bricks ----
        valids = uvws[:, :, 2] > 0  # [F, KBB]
        w_counts = valids.sum(axis=0).astype(jnp.int32)
        union = valids.any(axis=0)
        count = union.sum()

        # one appended dead slot (w = 0 in every frame; its out-of-range
        # scatter index N_buf drops under mode="drop") absorbs nonzero's
        # fill indices — no buffer padding row needed, so shard-local
        # buffers work too
        idx_pad = jnp.concatenate(
            [idx, jnp.array([N_buf], jnp.int32)]
        )
        uvw_pad = jnp.pad(uvws, ((0, 0), (0, 1), (0, 0)))
        labs_pad = jnp.pad(labs, ((0, 0), (0, 1)))
        votes_pad = (
            jnp.pad(votes, ((0, 0), (0, 1)))
            if track_labels and weighted_votes else votes
        )
        w_counts_pad = jnp.pad(w_counts, (0, 1))

        def rgb_step(acc, frame):
            rgb_img, uvw_f = frame
            s = rgb_sample(rgb_img, uvw_f[:, :2])  # exact pixel uv
            return acc + s * uvw_f[:, 2:3], None

        def sparse_inner(g):
            (active_local,) = jnp.nonzero(union, size=capacity, fill_value=KBB)
            active_global = jnp.take(idx_pad, active_local)
            uvw_a = jnp.take(uvw_pad, active_local, axis=1)  # [F, K, 3]
            labs_a = jnp.take(labs_pad, active_local, axis=1)

            rgb_contrib, _ = jax.lax.scan(
                rgb_step, jnp.zeros((capacity, 3), jnp.float32),
                (frames.rgb, uvw_a),
            )
            feat_contrib = einsum_feature_splat(
                jnp.zeros((capacity, g.feat_sum.shape[1]), g.feat_sum.dtype),
                jnp.transpose(to_patch(uvw_a), (1, 0, 2)),
                frames.feat_img,
            )
            out = dict(
                rgb_sum=g.rgb_sum.at[active_global].add(
                    rgb_contrib, mode="drop"
                ),
                w=g.w.at[active_global].add(
                    jnp.take(w_counts_pad, active_local), mode="drop"
                ),
                feat_sum=g.feat_sum.at[active_global].add(
                    feat_contrib, mode="drop"
                ),
            )
            if track_labels:
                hist_contrib = blocked_label_splat(
                    jnp.zeros((capacity, g.label_hist.shape[1]), jnp.int32),
                    labs_a,
                    jnp.take(votes_pad, active_local, axis=1)
                    if weighted_votes else uvw_a[:, :, 2] > 0,
                )
                # gather/saturate/set keeps the narrow-dtype histogram's
                # saturating-update contract (indices unique; fills drop)
                old_rows = g.label_hist.at[active_global].get(
                    mode="fill", fill_value=0
                )
                out["label_hist"] = g.label_hist.at[active_global].set(
                    accumulate_label_hist(old_rows, hist_contrib),
                    mode="drop",
                )
            return g.replace(**out)

        def dense_inner(g):
            # voxel union overflowed `capacity`: process every selected-brick
            # voxel (still KBB, not N_buf)
            rgb_contrib, _ = jax.lax.scan(
                rgb_step, jnp.zeros((KBB, 3), jnp.float32),
                (frames.rgb, uvws),
            )
            feat_contrib = einsum_feature_splat(
                jnp.zeros((KBB, g.feat_sum.shape[1]), g.feat_sum.dtype),
                jnp.transpose(to_patch(uvws), (1, 0, 2)),
                frames.feat_img,
            )
            out = dict(
                rgb_sum=g.rgb_sum.at[idx].add(rgb_contrib, mode="drop"),
                w=g.w.at[idx].add(w_counts, mode="drop"),
                feat_sum=g.feat_sum.at[idx].add(feat_contrib, mode="drop"),
            )
            if track_labels:
                hist_contrib = blocked_label_splat(
                    jnp.zeros((KBB, g.label_hist.shape[1]), jnp.int32),
                    labs,
                    votes if weighted_votes else valids,
                )
                # the gather/saturate/SET pattern is only duplicate-safe for
                # unique indices, but nonzero's fill slots duplicate brick
                # NB-1's rows in `idx` — a fill slot's old+0 write could
                # land AFTER the real slot's old+contrib write (scatter
                # duplicate order is unspecified) and silently drop the
                # chunk's votes for that brick. Route fill slots to the
                # out-of-range dead index so mode="drop" discards them.
                idx_hist = jnp.where(
                    jnp.repeat(slot_valid, B), idx, N_buf
                )
                old_rows = g.label_hist.at[idx_hist].get(
                    mode="fill", fill_value=0
                )
                out["label_hist"] = g.label_hist.at[idx_hist].set(
                    accumulate_label_hist(old_rows, hist_contrib),
                    mode="drop",
                )
            return g.replace(**out)

        g = g.replace(**new)
        g = jax.lax.cond(count <= capacity, sparse_inner, dense_inner, g)
        return g, count

    def fallback_branch(g):
        # brick union overflowed brick_capacity: whole chunk through the
        # sparse integrator (which has its own dense fallback)
        return integrate_frames_sparse_impl(
            g, frames, rgb_mode=rgb_mode, capacity=capacity,
            with_count=True, label_vote_mode=label_vote_mode,
            voxel_start=voxel_start,
        )

    grid, vox_count = jax.lax.cond(
        nb_count <= brick_capacity, brick_branch, fallback_branch, grid
    )
    if with_count:
        return grid, nb_count, vox_count
    return grid


@functools.partial(
    jax.jit,
    static_argnames=(
        "rgb_mode", "brick_size", "brick_capacity", "capacity",
        "with_count", "label_vote_mode",
    ),
    donate_argnums=(0,),
)
def integrate_frames_brick(
    grid: FusionGrid,
    frames: FrameBatch,
    rgb_mode: str = "bilinear",
    brick_size: int = 128,
    brick_capacity: int = 0,
    capacity: int = 0,
    with_count: bool = False,
    label_vote_mode: str = "uniform",
    voxel_start=0,
):
    """Jitted brick-culled entry point (exact; in-jit fallbacks on overflow).

    with_count=True additionally returns (active brick count, near-surface
    voxel union count) — the feedback signals for the pipeline's adaptive
    capacity sizing of both static slot budgets.
    """
    return integrate_frames_brick_impl(
        grid, frames, rgb_mode=rgb_mode, brick_size=brick_size,
        brick_capacity=brick_capacity, capacity=capacity,
        with_count=with_count, label_vote_mode=label_vote_mode,
        voxel_start=voxel_start,
    )
