"""Parity of the tile-DMA sampling prototype (grid/pallas_tiledma.py) vs the
XLA gather baseline (core.sampling.sample_image_at_uv, mode=nearest), on
realistic brick-coherent projections from the synthetic scene."""
import numpy as np
import pytest

import jax.numpy as jnp

from spatially_aware_ai_tpu.core.sampling import sample_image_at_uv
from spatially_aware_ai_tpu.data import SyntheticSceneDataset
from spatially_aware_ai_tpu.grid.pallas_tiledma import (
    brick_tile_bboxes,
    brick_voxel_uv,
    in_image_mask,
    tile_sample_nearest,
)

BRICK = 8
V = BRICK**3


def test_tile_sample_matches_xla_gather():
    F = 4
    ds = SyntheticSceneDataset(num_frames=F, width=160, height=120)
    H, W = 120, 160
    nvox = (24, 16, 24)
    origin = np.array([-1.0, -0.5, -1.0], np.float32)
    poses = [ds[i].pose for i in range(F)]
    Ks = [ds[i].K for i in range(F)]
    depths = np.stack([ds[i].depth for i in range(F)]).astype(np.float32)
    labels = np.stack(
        [ds.render_labels(i) for i in range(F)]
    ).astype(np.float32)
    img = np.stack([depths, labels], axis=1)  # [F, C=2, H, W]

    uv, z = brick_voxel_uv(nvox, origin, 0.05, poses, Ks, brick=BRICK)
    NB = uv.shape[0]
    in_img = in_image_mask(uv, z, H, W)

    TH, TW = 64, 128
    bbox, fits = brick_tile_bboxes(
        jnp.asarray(uv), jnp.asarray(in_img), TH, TW, H, W
    )
    uv_cf = jnp.asarray(uv.transpose(0, 1, 3, 2).copy())  # [NB, F, 2, V]
    samples, in_tile = tile_sample_nearest(
        jnp.asarray(img), uv_cf, bbox, tile_h=TH, tile_w=TW, interpret=True
    )
    samples = np.asarray(samples)
    in_tile = np.asarray(in_tile)

    # baseline: the production XLA gather (per frame, like the integrators)
    def ref_channel(c):
        per_f = [
            np.asarray(
                sample_image_at_uv(
                    jnp.asarray(img[f, c, :, :, None]),
                    jnp.asarray(uv[:, f].reshape(-1, 2)),
                    mode="nearest",
                )
            ).reshape(NB, V)
            for f in range(F)
        ]
        return np.stack(per_f, 1)  # [NB, F, V]

    ref = ref_channel(0)
    ref_lab = ref_channel(1)

    # where the voxel projects in-image AND the tile covered it, values must
    # match the gather exactly
    ok = in_img & in_tile
    assert ok.mean() > 0.2, f"degenerate test: only {ok.mean():.1%} covered"
    np.testing.assert_array_equal(samples[:, :, 0][ok], ref[ok])
    np.testing.assert_array_equal(samples[:, :, 1][ok], ref_lab[ok])
    # the sentinel contract (brick_voxel_uv -1e6 for z<=0 / non-finite)
    # makes in-tile IMPLY in-image: a behind-camera voxel's mirrored uv can
    # never be flagged valid
    assert not (in_tile & ~in_img).any()
    # out-of-tile voxels return exactly 0, never silently-wrong data
    assert samples[:, :, 0][~in_tile].sum() == 0
    assert samples[:, :, 1][~in_tile].sum() == 0
    # the bbox pre-pass "fits" diagnostic agrees with the kernel's per-voxel
    # coverage for valid voxels
    fits = np.asarray(fits)
    agree = (in_tile | ~in_img).all(axis=-1)
    np.testing.assert_array_equal(fits, agree)
