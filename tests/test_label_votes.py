"""Opt-in proximity-weighted label voting (label_vote_mode="near_surface").

The reference scatters one uniform vote per valid observation
(clip_seem_fusion.py:820-822); the weighted mode scales each vote 1..Q by
surface proximity (grid/fusion.py:label_vote_weights). Contracts tested:
- weight values: Q on the surface, 1 at the shell edge, 0 when invalid
- all four integrators agree exactly in weighted mode
- weighting touches ONLY the label histogram (tsdf/rgb/feat/w identical to
  uniform mode), and coverage is unchanged (same voxels have votes)
"""
import numpy as np
import jax.numpy as jnp

from spatially_aware_ai_tpu.grid import FrameBatch, integrate_frames
from spatially_aware_ai_tpu.grid.fusion import (
    LABEL_VOTE_QUANT,
    integrate_frames_einsum,
    integrate_frames_pallas,
    integrate_frames_sparse,
    label_vote_weights,
)
from spatially_aware_ai_tpu.grid.voxel_grid import create_grid

from test_fusion import make_scene
from test_parallel import build_batch, grid_args


def test_vote_weight_values():
    tsdf = jnp.asarray([0.0, 1.0, -1.0, 0.5, 0.25])
    valid = jnp.asarray([True, True, True, True, False])
    v = np.asarray(label_vote_weights(tsdf, valid))
    Q = LABEL_VOTE_QUANT
    assert v[0] == Q  # on the measured surface
    assert v[1] == 1 and v[2] == 1  # shell edge still counts once
    assert v[3] == 1 + round((Q - 1) * 0.5)
    assert v[4] == 0  # invalid observations never vote


def test_weighted_votes_cross_integrator_equality():
    scene = make_scene(num_frames=6)
    batch = build_batch(scene, with_labels=True)

    ref = integrate_frames(
        create_grid(**grid_args(scene)), batch,
        label_vote_mode="near_surface",
    )
    n = ref.tsdf_sum.shape[0]

    tile = 56
    assert n % tile == 0
    out_pallas = integrate_frames_pallas(
        create_grid(**grid_args(scene)), batch, tile=tile, interpret=True,
        label_vote_mode="near_surface",
    )
    out_einsum = integrate_frames_einsum(
        create_grid(**grid_args(scene)), batch,
        label_vote_mode="near_surface",
    )
    g_args = dict(grid_args(scene), pad_to=8, min_padding=1)
    out_sparse = integrate_frames_sparse(
        create_grid(**g_args), batch, capacity=n,
        label_vote_mode="near_surface",
    )

    for name, out in (("pallas", out_pallas), ("einsum", out_einsum),
                      ("sparse", out_sparse)):
        np.testing.assert_array_equal(
            np.asarray(out.label_hist)[:n],
            np.asarray(ref.label_hist),
            err_msg=f"label_hist mismatch: {name} vs scan",
        )


def test_weighted_votes_sharded_compact_equality():
    """near_surface voting inside the voxel-sharded compact step matches
    the single-device scan oracle (vote weights are per-observation, so
    sharding must not change them)."""
    import jax

    from spatially_aware_ai_tpu.parallel import make_mesh, shard_grid
    from spatially_aware_ai_tpu.parallel.sharded import (
        make_sharded_integrate,
    )

    assert len(jax.devices()) > 1
    mesh = make_mesh()
    n_dev = mesh.devices.size

    scene = make_scene(num_frames=6)
    batch = build_batch(scene, with_labels=True)
    ref = integrate_frames(
        create_grid(**grid_args(scene)), batch,
        label_vote_mode="near_surface",
    )
    n = ref.tsdf_sum.shape[0]

    for kw in (dict(integrator="sparse"),
               dict(integrator="brick", brick_size=16)):
        g = shard_grid(
            mesh, create_grid(**dict(grid_args(scene), pad_to=n_dev))
        )
        step = make_sharded_integrate(
            mesh, g, batch, label_vote_mode="near_surface", **kw
        )
        out = step(g, batch)
        np.testing.assert_array_equal(
            np.asarray(out.label_hist)[:n], np.asarray(ref.label_hist),
            err_msg=f"label_hist mismatch: sharded {kw} vs scan",
        )


def test_weighting_touches_only_labels():
    scene = make_scene(num_frames=5)
    batch = build_batch(scene, with_labels=True)

    uni = integrate_frames(create_grid(**grid_args(scene)), batch)
    wtd = integrate_frames(
        create_grid(**grid_args(scene)), batch,
        label_vote_mode="near_surface",
    )

    for name in ("tsdf_sum", "tsdf_w", "rgb_sum", "feat_sum", "w"):
        np.testing.assert_array_equal(
            np.asarray(getattr(uni, name)), np.asarray(getattr(wtd, name)),
            err_msg=name,
        )
    hu = np.asarray(uni.label_hist)
    hw = np.asarray(wtd.label_hist)
    # coverage identical: exactly the same (voxel, class) cells got votes
    np.testing.assert_array_equal(hu > 0, hw > 0)
    # weighted counts dominate uniform ones and stay within the Q bound
    assert (hw >= hu).all()
    assert (hw <= LABEL_VOTE_QUANT * hu).all()
    assert (hw > hu).any()  # some observation was actually near the surface


def test_label_hist_default_uint16_matches_int32():
    """The uint16 histogram (half the HBM of the reference's i32 layout,
    grid/voxel_grid.py:DEFAULT_LABEL_DTYPE) is value-identical to int32
    below the saturation ceiling, across all integrators."""
    scene = make_scene(num_frames=6)
    batch = build_batch(scene, with_labels=True)

    g16 = create_grid(**grid_args(scene))
    assert g16.label_hist.dtype == jnp.uint16  # the default

    ref = integrate_frames(
        create_grid(**dict(grid_args(scene), label_dtype=jnp.int32)), batch,
        label_vote_mode="near_surface",
    )
    out = integrate_frames(g16, batch, label_vote_mode="near_surface")
    assert out.label_hist.dtype == jnp.uint16
    np.testing.assert_array_equal(
        np.asarray(out.label_hist).astype(np.int32),
        np.asarray(ref.label_hist),
    )

    n = ref.tsdf_sum.shape[0]
    g_args = dict(grid_args(scene), pad_to=8, min_padding=1)
    out_sparse = integrate_frames_sparse(
        create_grid(**g_args), batch, capacity=n,
        label_vote_mode="near_surface",
    )
    assert out_sparse.label_hist.dtype == jnp.uint16
    np.testing.assert_array_equal(
        np.asarray(out_sparse.label_hist)[:n].astype(np.int32),
        np.asarray(ref.label_hist),
    )


def test_label_hist_saturates_instead_of_wrapping():
    """Overflow guard: a uint16 cell pinned at LABEL_HIST_MAX stays there
    (saturating add), it does not wrap to a small count that would corrupt
    the argmax (grid/voxel_grid.py:accumulate_label_hist)."""
    from spatially_aware_ai_tpu.grid.voxel_grid import (
        LABEL_HIST_MAX,
        accumulate_label_hist,
    )

    hist = jnp.asarray(
        [[LABEL_HIST_MAX, 0], [LABEL_HIST_MAX - 3, 5], [0, 0]], jnp.uint16
    )
    contrib = jnp.asarray([[7, 1], [10, 0], [2, 2]], jnp.int32)
    out = np.asarray(accumulate_label_hist(hist, contrib))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(
        out, [[LABEL_HIST_MAX, 1], [LABEL_HIST_MAX, 5], [2, 2]]
    )

    # int32 histograms keep exact reference add semantics
    h32 = accumulate_label_hist(hist.astype(jnp.int32), contrib)
    assert h32.dtype == jnp.int32
    np.testing.assert_array_equal(
        np.asarray(h32),
        np.asarray(hist, np.int64) + np.asarray(contrib, np.int64),
    )


def test_noisy_segmenter_corruption_modes():
    """NoisySegmenter (vote-weighting ablation harness): shift moves the
    label map, flip reassigns ~p of non-null pixels, null stays null."""
    import numpy as np

    from spatially_aware_ai_tpu.data.synthetic import (
        ColorSegmenter,
        NoisySegmenter,
        SyntheticScene,
        SyntheticSceneDataset,
    )

    scene = SyntheticScene.demo_room()
    ds = SyntheticSceneDataset(scene=scene, num_frames=2, width=64,
                               height=48)
    rgb = ds[0].rgb
    clean = ColorSegmenter(scene).run_on_image(rgb)

    noisy = NoisySegmenter(ColorSegmenter(scene), flip_prob=0.2, seed=0)
    lab = noisy.run_on_image(rgb)
    non_null = clean != noisy.null_id
    frac = float((lab[non_null] != clean[non_null]).mean())
    # ~20% flipped to a RANDOM class (which may equal the original)
    assert 0.05 < frac < 0.35
    # flips only touch non-null pixels
    assert (lab[~non_null] == clean[~non_null]).all()

    shifty = NoisySegmenter(ColorSegmenter(scene), shift_px=2, seed=1)
    lab2 = shifty.run_on_image(rgb)
    assert lab2.shape == clean.shape
    # same multiset of labels (roll is a permutation)
    assert np.array_equal(np.sort(lab2.ravel()), np.sort(clean.ravel()))

    # zero-noise wrapper is the identity
    ident = NoisySegmenter(ColorSegmenter(scene), seed=2)
    assert np.array_equal(ident.run_on_image(rgb), clean)


def test_eval_accepts_segmenter_noise():
    from spatially_aware_ai_tpu.evals.synthetic import eval_synthetic_labels

    clean = eval_synthetic_labels(num_frames=6, width=64, height=48,
                                  voxel_size=0.08)
    noisy = eval_synthetic_labels(num_frames=6, width=64, height=48,
                                  voxel_size=0.08, seg_shift_px=2,
                                  seg_flip_prob=0.2)
    assert noisy["seg_shift_px"] == 2
    # noise must actually hurt the fused labels
    assert noisy["miou"] < clean["miou"]
