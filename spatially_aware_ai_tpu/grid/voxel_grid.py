"""The HBM-resident TSDF + feature voxel grid.

The reference keeps running averages updated sequentially one frame at a time
(clipfusion.py:605-613, 681-721). Running averages are order-dependent
read-modify-write, which serializes fusion. We instead store *sum-form*
accumulators:

    tsdf_sum   = sum_f  w_f * tsdf_f        tsdf_w = sum_f w_f
    rgb_sum    = sum_f  w_f * rgb_f         w      = sum_f w_f
    feat_sum   = sum_f  w_f * clip_feat_f
    label_hist = sum_f  one_hot(label_f)

with w_f in {0, 1} per (voxel, frame). Division happens once at read time
(`finalize_grid`). Because sums are associative and commutative, integration
is order-independent: frames can be batched, processed in any order, and the
grid can be sharded across TPU chips with a single psum (or no communication
at all when the grid itself is sharded over voxels).

Numerically this matches the reference's integer-weight running average
exactly in exact arithmetic (both equal sum(x_f)/count); float discrepancy is
at the ulp level and covered by golden tests.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

# The reference reserves 133 COCO panoptic classes + 10 spare user classes,
# with 133 = null (clip_seem_fusion.py:653-659).
NUM_LABEL_CLASSES = 143
NULL_CLASS_ID = 133

# Label-histogram accumulator dtype. The reference uses int32 one-hot sums
# (clip_seem_fusion.py:653-659), which makes label_hist the single largest
# grid buffer (~860 MB at a 0.02 m iPhone grid). uint16 halves that for
# free: the vote ceiling per cell is frames x LABEL_VOTE_QUANT = 500 x 16 =
# 8,000 for the north-star scan, far under 65,535. Updates SATURATE at
# LABEL_HIST_MAX (never wrap), so pathological >4K-frame scans degrade to a
# tied-argmax at the ceiling instead of corrupting counts.
DEFAULT_LABEL_DTYPE = jnp.uint16
LABEL_HIST_MAX = 65535


def accumulate_label_hist(hist: jnp.ndarray, contrib: jnp.ndarray):
    """hist + contrib with overflow protection.

    `contrib` is a non-negative int32 vote count (one chunk's worth: at most
    chunk_frames x LABEL_VOTE_QUANT per cell). For int32 histograms this is
    a plain add (exact reference semantics); for narrower dtypes the add is
    computed in int32 and clamped to LABEL_HIST_MAX so a saturated cell
    stays saturated rather than wrapping. XLA fuses the widen/clamp/narrow
    into the update — the HBM-resident buffer stays at the narrow dtype.
    """
    if hist.dtype == jnp.int32:
        return hist + contrib
    s = hist.astype(jnp.int32) + contrib
    return jnp.minimum(s, LABEL_HIST_MAX).astype(hist.dtype)


@flax.struct.dataclass
class FusionGrid:
    """Pytree of flat [N, ...] voxel buffers. N = prod(nvox).

    Flat layout (not [X, Y, Z, ...]) keeps every accumulator a plain 2D
    (N, C) array: contiguous 128-lane tiles for the VPU/MXU and trivially
    shardable on the voxel axis.
    """

    tsdf_sum: jnp.ndarray  # [N] f32
    tsdf_w: jnp.ndarray  # [N] i32
    rgb_sum: jnp.ndarray  # [N, 3] f32
    feat_sum: jnp.ndarray  # [N, C] f32
    w: jnp.ndarray  # [N] i32
    label_hist: Optional[jnp.ndarray]  # [N, L] u16 (saturating) or i32, or None
    origin: jnp.ndarray  # [3] f32 world position of voxel (0,0,0)
    # grid dims are a LEAF (traced array), not static metadata: scenes with
    # different bounds but the same bucketed buffer size then share one
    # compiled integration executable (compiles cost minutes through some
    # TPU toolchains; see create_grid(pad_to=...))
    nvox: jnp.ndarray  # [3] i32
    voxel_size: float = flax.struct.field(pytree_node=False)
    trunc: float = flax.struct.field(pytree_node=False)

    @property
    def nvox_tuple(self) -> Tuple[int, int, int]:
        """Host-side concrete dims (do not call inside jit)."""
        return tuple(int(v) for v in np.asarray(self.nvox))

    @property
    def num_voxels(self) -> int:
        return int(np.prod(np.asarray(self.nvox)))

    @property
    def feature_dim(self) -> int:
        return self.feat_sum.shape[-1]


def create_grid(
    origin,
    voxel_size: float,
    nvox,
    trunc: float,
    feature_dim: int = 512,
    with_labels: bool = False,
    num_classes: int = NUM_LABEL_CLASSES,
    feat_dtype=jnp.float32,
    label_dtype=DEFAULT_LABEL_DTYPE,
    pad_to: int = 1,
    min_padding: int = 0,
) -> FusionGrid:
    """pad_to: round the flat voxel buffer up to a multiple (e.g. the device
    count for voxel-sharding, or 1024 for tile alignment). Padding voxels
    never accumulate and are sliced off at read time. min_padding forces at
    least that many padding slots. NOTE: the sparse/brick integrators no
    longer need a padding row (they scatter fill slots to an APPENDED
    virtual dead slot at index N_buf, dropped under mode="drop" — see
    fusion.py sparse_branch); callers passing min_padding=1 for them keep a
    harmless vestigial row."""
    nvox = tuple(int(v) for v in np.asarray(nvox).reshape(3))
    n = int(np.prod(nvox))
    n = ((n + min_padding + pad_to - 1) // pad_to) * pad_to
    return FusionGrid(
        tsdf_sum=jnp.zeros((n,), jnp.float32),
        tsdf_w=jnp.zeros((n,), jnp.int32),
        rgb_sum=jnp.zeros((n, 3), jnp.float32),
        feat_sum=jnp.zeros((n, feature_dim), feat_dtype),
        w=jnp.zeros((n,), jnp.int32),
        label_hist=jnp.zeros((n, num_classes), label_dtype) if with_labels else None,
        origin=jnp.asarray(origin, jnp.float32),
        nvox=jnp.asarray(nvox, jnp.int32),
        voxel_size=float(voxel_size),
        trunc=float(trunc),
    )


@flax.struct.dataclass
class FrameBatch:
    """A fixed-size batch of preprocessed frames ready for integration.

    All leaves have a leading frame axis F. `frame_valid` masks padding
    frames so the last partial chunk of a scan can reuse the same compiled
    executable (static shapes, no per-scan recompiles).
    """

    depth: jnp.ndarray  # [F, H, W] f32, meters
    rgb: jnp.ndarray  # [F, H, W, 3] f32 in [0, 1]
    pose: jnp.ndarray  # [F, 4, 4] f32 camera-to-world (right-down-forward)
    K: jnp.ndarray  # [F, 3, 3] f32
    feat_img: jnp.ndarray  # [F, Py, Px, C] f32 CLIP patch-feature image
    labels: Optional[jnp.ndarray]  # [F, H, W] i32 panoptic class ids, or None
    frame_valid: jnp.ndarray  # [F] bool

    @property
    def num_frames(self) -> int:
        return self.depth.shape[0]


def finalize_grid(grid: FusionGrid):
    """Convert sum-form accumulators to the reference's read-side quantities.

    Returns a dict with:
      tsdf [N]           tsdf_sum / tsdf_w (0 where never observed)
      rgb [N, 3]         rgb_sum / w
      feat [N, C]        feat_sum / w
      weight [N] i32     feature observation count
      tsdf_weight [N]    tsdf observation count
      class_id [N] i32   argmax of label_hist, -1 for all-zero rows
                         (reference argmax_with_check, clip_seem_fusion.py:315-328)
    """
    tsdf_w = jnp.maximum(grid.tsdf_w, 1)
    w = jnp.maximum(grid.w, 1)
    out = {
        "tsdf": grid.tsdf_sum / tsdf_w.astype(jnp.float32),
        "rgb": grid.rgb_sum / w[:, None].astype(jnp.float32),
        "feat": grid.feat_sum.astype(jnp.float32) / w[:, None].astype(jnp.float32),
        "weight": grid.w,
        "tsdf_weight": grid.tsdf_w,
    }
    if grid.label_hist is not None:
        any_nonzero = jnp.any(grid.label_hist != 0, axis=1)
        class_id = jnp.argmax(grid.label_hist, axis=1).astype(jnp.int32)
        out["class_id"] = jnp.where(any_nonzero, class_id, -1)
    return out
