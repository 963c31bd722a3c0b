"""Instance-aware label fusion: two TOUCHING same-class objects must come out
as two scene objects when the segmenter provides per-frame panoptic segment
ids (the reference left within-frame instance separation as a TODO,
handy_utils.py:135 — its 3D flood fill merges touching same-class objects).
"""
import numpy as np

from spatially_aware_ai_tpu.data.synthetic import (
    Box,
    ColorPanopticSegmenter,
    ColorSegmenter,
    SyntheticScene,
    SyntheticSceneDataset,
)
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.pipeline import (
    FusionConfig,
    fuse_scan,
    null_instance_boundaries,
)
from spatially_aware_ai_tpu.scene.objects import flood_fill_3d

CHAIR = 56


def two_chair_scene():
    """Floor + two chairs (same class) touching at the x=0 plane, with
    distinct albedos so the color-based panoptic oracle can tell them
    apart."""
    return SyntheticScene([
        Box([-1.0, 0.95, -1.0], [1.0, 1.05, 1.0], [0.55, 0.40, 0.25],
            class_id=87, name="floor"),
        Box([-0.4, 0.55, -0.2], [0.0, 0.95, 0.2], [0.85, 0.15, 0.10],
            class_id=CHAIR, name="chair_a"),
        Box([0.0, 0.55, -0.2], [0.4, 0.95, 0.2], [0.10, 0.20, 0.85],
            class_id=CHAIR, name="chair_b"),
    ])


def fuse(scene, segmenter):
    ds = SyntheticSceneDataset(scene=scene, num_frames=10, width=80,
                               height=60)
    engine = ClipEngine.tiny()
    cfg = FusionConfig(
        voxel_size=0.05, with_labels=True, frame_chunk=5,
        clip_patch_size=40, clip_patch_stride=20,
    )
    result = fuse_scan(ds, engine, cfg, segmenter=segmenter.run_on_image)
    nvox = result.nvox
    class_grid = result.values["class_id"].reshape(nvox)
    feats = np.asarray(result.feat_grid)
    rgb = result.values["rgb"].reshape(*nvox, 3)
    knowledge, _ = flood_fill_3d(class_grid, None, feats, rgb)
    return knowledge


def chair_objects(knowledge):
    return [
        k for k, v in knowledge["unique_objects"].items()
        if v["class_label"] == "chair"
    ]


def test_touching_same_class_objects_split_with_instances():
    scene = two_chair_scene()
    knowledge = fuse(scene, ColorPanopticSegmenter(scene))
    chairs = chair_objects(knowledge)
    assert len(chairs) == 2, (
        f"expected 2 chair instances, got {chairs}: "
        f"{list(knowledge['unique_objects'])}"
    )


def test_touching_same_class_objects_merge_without_instances():
    """Control: a class-only segmenter (the reference's behavior) merges the
    touching chairs into one object — documents what the panoptic path
    adds."""
    scene = two_chair_scene()
    knowledge = fuse(scene, ColorSegmenter(scene))
    chairs = chair_objects(knowledge)
    assert len(chairs) == 1, f"expected 1 merged chair, got {chairs}"


def test_null_instance_boundaries_unit():
    # two segments of one class side by side; seam nulled + dilated
    cat = np.full((1, 5, 8), 7, np.int32)
    seg = np.zeros((1, 5, 8), np.int32)
    seg[:, :, :4] = 1
    seg[:, :, 4:] = 2
    out = null_instance_boundaries(cat, seg, null_id=133, dilate=1)
    assert (out[0, :, 2:6] == 133).all()   # seam columns 3,4 + dilation
    assert (out[0, :, 0] == 7).all() and (out[0, :, 7] == 7).all()

    # different classes: untouched (3D CC separates those already)
    cat2 = cat.copy()
    cat2[:, :, 4:] = 9
    out2 = null_instance_boundaries(cat2, seg, null_id=133, dilate=1)
    np.testing.assert_array_equal(out2, cat2)

    # object/background edges: untouched
    seg3 = np.zeros_like(seg)
    seg3[:, :, :4] = 1
    out3 = null_instance_boundaries(cat, seg3, null_id=133, dilate=1)
    np.testing.assert_array_equal(out3, cat)


def test_device_fused_labels_match_host_path():
    """KmaxSegmenter.run_on_batch_fused_labels (one on-device program) must
    equal run_on_batch_panoptic + pipeline.null_instance_boundaries
    (the host path) exactly, including the dilation semantics."""
    from spatially_aware_ai_tpu.models.kmax import KmaxSegmenter

    seg = KmaxSegmenter.tiny()
    rng = np.random.default_rng(3)
    rgbs = rng.uniform(size=(2, 96, 128, 3)).astype(np.float32)
    for dilate in (0, 1, 2):
        fused = seg.run_on_batch_fused_labels(rgbs, dilate=dilate)
        cat, sg = seg.run_on_batch_panoptic(rgbs)
        host = null_instance_boundaries(cat, sg, dilate=dilate)
        np.testing.assert_array_equal(fused, host, err_msg=f"dilate={dilate}")


def test_null_seams_device_matches_scipy_dilation():
    """Random cat/seg maps: the jax seam-nulling (reduce_window Chebyshev
    ball) must equal the scipy binary_dilation host reference."""
    from spatially_aware_ai_tpu.models.kmax.model import (
        null_same_class_instance_seams,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for trial in range(3):
        cat = rng.integers(0, 4, (20, 24)).astype(np.int32)
        seg = rng.integers(0, 5, (20, 24)).astype(np.int32)
        for dilate in (0, 1, 2):
            dev = np.asarray(
                null_same_class_instance_seams(
                    jnp.asarray(cat), jnp.asarray(seg), dilate=dilate
                )
            )
            host = null_instance_boundaries(
                cat[None], seg[None], dilate=dilate
            )[0]
            np.testing.assert_array_equal(
                dev, host, err_msg=f"trial={trial} dilate={dilate}"
            )
