"""Property test for the framework's central algebraic claim: sum-form
accumulators make fusion frame-order independent (grid/voxel_grid.py
module docstring; the reference's running averages are order-dependent
read-modify-write, clipfusion.py:681-721).

Exact contract: integer accumulators (tsdf_w, w, label_hist) are
bit-identical under any frame permutation or chunk split; float sums agree
up to summation-order ulps (they are reassociated, not reordered-dependent).
"""
import numpy as np
import jax.numpy as jnp

from spatially_aware_ai_tpu.grid import FrameBatch, integrate_frames
from spatially_aware_ai_tpu.grid.voxel_grid import create_grid

from test_fusion import make_scene
from test_parallel import build_batch, grid_args

INT_FIELDS = ("tsdf_w", "w", "label_hist")
FLOAT_FIELDS = ("tsdf_sum", "rgb_sum", "feat_sum")


def _permuted(batch, perm):
    return FrameBatch(
        depth=batch.depth[perm],
        rgb=batch.rgb[perm],
        pose=batch.pose[perm],
        K=batch.K[perm],
        feat_img=batch.feat_img[perm],
        labels=None if batch.labels is None else batch.labels[perm],
        frame_valid=batch.frame_valid[perm],
    )


def _slice(batch, lo, hi):
    return FrameBatch(
        depth=batch.depth[lo:hi],
        rgb=batch.rgb[lo:hi],
        pose=batch.pose[lo:hi],
        K=batch.K[lo:hi],
        feat_img=batch.feat_img[lo:hi],
        labels=None if batch.labels is None else batch.labels[lo:hi],
        frame_valid=batch.frame_valid[lo:hi],
    )


def _check(ref, out):
    for name in INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(out, name)),
            err_msg=name,
        )
    for name in FLOAT_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(out, name)),
            atol=1e-4, err_msg=name,
        )


def test_frame_permutation_is_noop():
    scene = make_scene(num_frames=6)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)

    rng = np.random.default_rng(7)
    for _ in range(2):
        perm = jnp.asarray(rng.permutation(6))
        out = integrate_frames(
            create_grid(**grid_args(scene)), _permuted(batch, perm)
        )
        _check(ref, out)


def test_chunk_split_is_noop():
    """One 6-frame batch == 3+3 == 2+4, sequentially accumulated (the
    pipeline's frame_chunk invariant: chunking is a compile-shape choice,
    never a semantics choice)."""
    scene = make_scene(num_frames=6)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(create_grid(**grid_args(scene)), batch)

    for split in (3, 2):
        g = create_grid(**grid_args(scene))
        g = integrate_frames(g, _slice(batch, 0, split))
        g = integrate_frames(g, _slice(batch, split, 6))
        _check(ref, g)


def test_permutation_with_weighted_votes():
    """Order independence holds in near_surface label-vote mode too (votes
    are per-observation functions of geometry, so they commute)."""
    scene = make_scene(num_frames=5)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(
        create_grid(**grid_args(scene)), batch,
        label_vote_mode="near_surface",
    )
    perm = jnp.asarray([4, 2, 0, 3, 1])
    out = integrate_frames(
        create_grid(**grid_args(scene)), _permuted(batch, perm),
        label_vote_mode="near_surface",
    )
    _check(ref, out)
