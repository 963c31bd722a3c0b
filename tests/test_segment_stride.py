"""Segmentation stride (FusionConfig.segment_stride, beyond-parity
deployment knob): every k-th frame is segmented; skipped frames contribute
TSDF/RGB/CLIP features but cast ZERO label votes (their label images are
-1, which jax.nn.one_hot drops — null=133 would instead be a real vote for
the null class). Oracle: a stride-k run must equal a stride-1 run whose
segmenter returns all -1 for the skipped frames."""
import numpy as np
import pytest

import jax.numpy as jnp

from spatially_aware_ai_tpu.data.synthetic import (
    ColorPanopticSegmenter,
    ColorSegmenter,
    SyntheticSceneDataset,
)
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.pipeline import (
    FusionConfig,
    fuse_scan,
    labels_for_chunk,
)


def cfg(**over):
    base = dict(
        voxel_size=0.05, with_labels=True, frame_chunk=4,
        clip_patch_size=40, clip_patch_stride=20,
    )
    base.update(over)
    return FusionConfig(**base)


class StridedOracle:
    """Per-frame segmenter that emits -1 (no votes) off the stride slots,
    replicating what segment_stride does internally — but through the
    plain stride=1 path, so the two runs must match exactly."""

    def __init__(self, inner, stride, chunk):
        self.inner = inner
        self.stride = stride
        self.chunk = chunk
        self.calls = 0

    def run_on_image(self, rgb):
        i = self.calls % self.chunk
        self.calls += 1
        if i % self.stride == 0:
            return self.inner.run_on_image(rgb)
        return np.full(rgb.shape[:2], -1, np.int32)


def test_stride_matches_minus_one_oracle():
    ds = SyntheticSceneDataset(num_frames=8, width=80, height=60)
    engine = ClipEngine.tiny()
    seg = ColorSegmenter(ds.scene)

    out_strided = fuse_scan(
        ds, engine, cfg(segment_stride=2), segmenter=seg.run_on_image
    )
    oracle = StridedOracle(seg, stride=2, chunk=4)
    out_ref = fuse_scan(
        ds, engine, cfg(), segmenter=oracle.run_on_image
    )
    np.testing.assert_array_equal(
        np.asarray(out_strided.grid.label_hist),
        np.asarray(out_ref.grid.label_hist),
    )
    np.testing.assert_array_equal(
        out_strided.values["class_id"], out_ref.values["class_id"]
    )
    # geometry and features are untouched by the stride
    full = fuse_scan(ds, engine, cfg(), segmenter=seg.run_on_image)
    np.testing.assert_allclose(
        np.asarray(out_strided.grid.tsdf_sum),
        np.asarray(full.grid.tsdf_sum), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_strided.grid.feat_sum),
        np.asarray(full.grid.feat_sum), atol=1e-5,
    )
    # and the stride really dropped some votes
    assert (np.asarray(out_strided.grid.label_hist).sum()
            < np.asarray(full.grid.label_hist).sum())


def test_stride_quality_holds_on_clean_segmenter():
    """Stride-2 quality decomposes into (a) label FLIPS on voxels labeled
    in both runs — tiny, the vote averaging absorbs dropped frames — and
    (b) COVERAGE: voxels observed only by skipped frames stay unlabeled.
    Coverage is a scan-length effect (measured here: 87% at 8 frames, 92%
    at 16, 94% at 24, monotonically toward ~100% at production scan
    lengths where every surface is seen by many frames); flips are the
    real quality cost and must stay <2%."""
    ds = SyntheticSceneDataset(num_frames=16, width=80, height=60)
    engine = ClipEngine.tiny()
    seg = ColorSegmenter(ds.scene)
    full = fuse_scan(ds, engine, cfg(), segmenter=seg.run_on_image)
    half = fuse_scan(
        ds, engine, cfg(segment_stride=2), segmenter=seg.run_on_image
    )
    a = full.values["class_id"]
    b = half.values["class_id"]
    la, lb = a >= 0, b >= 0
    coverage = lb[la].mean()
    both = la & lb
    flips = (a[both] != b[both]).mean()
    assert flips < 0.02, f"stride-2 flipped {flips:.3f} of shared voxels"
    assert coverage > 0.9, f"stride-2 coverage {coverage:.3f} at 16 frames"


def test_stride_panoptic_batch_path():
    """The batch-capability path (run_on_batch_panoptic + seam nulling)
    segments only the stride slots; skipped slots are all -1."""
    ds = SyntheticSceneDataset(num_frames=4, width=80, height=60)
    seg = ColorPanopticSegmenter(ds.scene)
    rgb = np.stack([ds[i].rgb for i in range(4)])
    labels = labels_for_chunk(
        seg, seg.run_on_image, rgb, 4, cfg(segment_stride=2)
    )
    labels = np.asarray(labels)
    assert labels.shape == rgb.shape[:3]
    assert (labels[1] == -1).all() and (labels[3] == -1).all()
    ref = labels_for_chunk(seg, seg.run_on_image, rgb[::2], 2, cfg())
    np.testing.assert_array_equal(labels[::2], np.asarray(ref))


def test_stride_device_fused_path_scatters_on_device():
    """A seg_obj exposing run_on_batch_fused_labels (the production kMaX
    path) gets a device scatter: the result is a jax array with -1 in the
    skipped slots and the fused labels in the stride slots."""

    class DeviceSeg:
        def run_on_batch_fused_labels(self, rgb, dilate=2, as_numpy=False):
            B, H, W = rgb.shape[:3]
            return jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, H, W)
            )

    rgb = jnp.zeros((4, 8, 8, 3), jnp.float32)
    out = labels_for_chunk(
        DeviceSeg(), None, rgb, 4, cfg(segment_stride=2)
    )
    assert isinstance(out, jnp.ndarray)
    out = np.asarray(out)
    # stride slots hold the sub-batch's own indices (0, 1), skipped = -1
    assert (out[0] == 0).all() and (out[2] == 1).all()
    assert (out[1] == -1).all() and (out[3] == -1).all()


def test_stride_must_divide_chunk():
    # config-time validation (a live session would otherwise swallow the
    # per-chunk error as "integration deferred" and wedge the stream)
    with pytest.raises(ValueError, match="segment_stride"):
        cfg(segment_stride=3)  # frame_chunk=4
    with pytest.raises(ValueError, match="segment_stride"):
        cfg(segment_stride=0)
    # the per-chunk guard still protects direct callers with ad-hoc sizes
    rgb = np.zeros((6, 8, 8, 3), np.float32)
    seg = lambda img: np.zeros(img.shape[:2], np.int32)  # noqa: E731
    with pytest.raises(ValueError, match="segment_stride"):
        labels_for_chunk(None, seg, rgb, 6, cfg(segment_stride=4, frame_chunk=8))


def test_all_knobs_cross_integrator_equivalence(tmp_path):
    """The opt-in deployment knobs COMPOSE: stride-2 labels + yuv420 rgb
    transfer + native device depth upsample, run through every integrator,
    must produce the same grid (integer accumulators exact, float sums to
    XLA-reassociation tolerance). Interaction bugs between opt-in paths
    hide exactly in this all-on configuration, which no single-knob parity
    test exercises."""
    from test_data_loaders import write_iphone_scan

    from spatially_aware_ai_tpu.data import IPhone3DScannerDataset

    write_iphone_scan(tmp_path, num_frames=4)
    ds = IPhone3DScannerDataset(str(tmp_path))
    engine = ClipEngine.tiny()

    def seg_fn(rgb):
        a = np.asarray(rgb, np.float32)
        if a.max() > 2.0:
            a = a / 255.0
        return (a.mean(-1) * 7.0).astype(np.int32) % 20

    kw = dict(
        voxel_size=0.3, trunc_vox=2.0, with_labels=True,
        clip_patch_size=256, clip_patch_stride=128, frame_chunk=2,
        segment_stride=2, rgb_transfer="yuv420",
        device_depth_upsample=True,
    )
    outs = {
        integ: fuse_scan(
            ds, engine, FusionConfig(integrator=integ, **kw),
            segmenter=seg_fn,
        )
        for integ in ("scan", "einsum", "sparse", "brick")
    }
    ref = outs["scan"]
    # compare the PUBLIC values contract, not raw grid buffers: the compact
    # integrators (sparse/brick) append a drain slot, so raw buffer shapes
    # legitimately differ by one row
    ref_vals = ref.values
    assert int(np.asarray(ref_vals["weight"]).sum()) > 0
    assert int((np.asarray(ref_vals["class_id"]) >= 0).sum()) > 0
    for name, r in outs.items():
        assert r.nvox == ref.nvox, name
        vals = r.values
        for field in ("weight", "class_id"):
            np.testing.assert_array_equal(
                np.asarray(vals[field]), np.asarray(ref_vals[field]),
                err_msg=f"{name}.{field}",
            )
        for field in ("tsdf", "rgb"):
            # scatter-order reassociation between integrators: measured
            # max |diff| ~3e-5 on finalized averages (division by small
            # vote counts amplifies f32 sum differences)
            np.testing.assert_allclose(
                np.asarray(vals[field]), np.asarray(ref_vals[field]),
                atol=1e-4, err_msg=f"{name}.{field}",
            )
