import numpy as np
import jax
import jax.numpy as jnp

from spatially_aware_ai_tpu.models.kmax import (
    ConvNeXt,
    KMaxDeepLab,
    KmaxSegmenter,
    panoptic_class_map,
)
from spatially_aware_ai_tpu.models.kmax.convnext import CONVNEXT_TINY_TEST
from spatially_aware_ai_tpu.models.kmax.model import KMAX_TINY_TEST

RNG = np.random.default_rng(9)


def test_convnext_pyramid_shapes():
    model = ConvNeXt(CONVNEXT_TINY_TEST)
    x = jnp.asarray(RNG.normal(size=(2, 64, 96, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats["os4"].shape == (2, 16, 24, 16)
    assert feats["os8"].shape == (2, 8, 12, 32)
    assert feats["os16"].shape == (2, 4, 6, 48)
    assert feats["os32"].shape == (2, 2, 3, 64)
    for v in feats.values():
        assert np.isfinite(np.asarray(v)).all()


def test_kmax_forward_shapes():
    model = KMaxDeepLab(KMAX_TINY_TEST)
    x = jnp.asarray(RNG.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    cls, masks = model.apply(params, x)
    assert cls.shape == (1, 16, 134)
    assert masks.shape == (1, 16, 16, 16)
    assert np.isfinite(np.asarray(cls)).all()
    assert np.isfinite(np.asarray(masks)).all()


def test_panoptic_class_map_synthetic():
    """Hand-built query logits must produce the expected per-pixel map."""
    cfg = KMAX_TINY_TEST
    N, C = 4, 133
    h = w = 8
    cls = np.full((N, C + 1), -10.0, np.float32)
    # query 0: confident 'chair' (56); query 1: confident 'floor-wood' (87)
    cls[0, 56] = 10.0
    cls[1, 87] = 10.0
    # query 2: void -> dropped; query 3: weak -> dropped
    cls[2, 133] = 10.0
    cls[3, :] = 0.0

    masks = np.full((h, w, N), -10.0, np.float32)
    masks[:4, :, 0] = 10.0   # top half -> chair
    masks[4:, :, 1] = 10.0   # bottom half -> floor
    masks[:, :, 2] = 10.0    # void query covers all (must not matter)
    # leave one corner unclaimed by any kept query
    masks[0, 0, 0] = -10.0

    out = np.asarray(
        panoptic_class_map(
            jnp.asarray(cls), jnp.asarray(masks), (h, w), cfg
        )
    )
    assert out.shape == (h, w)
    assert out[0, 0] == 133  # unclaimed -> null
    assert (out[1:4, 1:] == 56).all()
    assert (out[4:, :] == 87).all()


def test_run_on_image_contract():
    seg = KmaxSegmenter.tiny()
    rgb = RNG.uniform(size=(96, 128, 3)).astype(np.float32)
    out = seg.run_on_image(rgb)
    assert out.shape == (96, 128)
    assert out.dtype == np.int32
    assert out.min() >= 0 and out.max() <= 133
    # deterministic
    out2 = seg.run_on_image(rgb)
    np.testing.assert_array_equal(out, out2)


def test_run_on_image_portrait_aspect():
    seg = KmaxSegmenter.tiny()
    rgb = RNG.uniform(size=(128, 96, 3)).astype(np.float32)
    out = seg.run_on_image(rgb)
    assert out.shape == (128, 96)


def test_run_on_batch_matches_single():
    seg = KmaxSegmenter.tiny()
    rgbs = RNG.uniform(size=(3, 96, 128, 3)).astype(np.float32)
    batch = seg.run_on_batch(rgbs)
    assert batch.shape == (3, 96, 128)
    for i in range(3):
        single = seg.run_on_image(rgbs[i])
        np.testing.assert_array_equal(batch[i], single)


def test_panoptic_all_void_gives_null_map():
    cfg = KMAX_TINY_TEST
    N, C, h, w = 4, 133, 8, 8
    cls = np.full((N, C + 1), -10.0, np.float32)
    cls[:, 133] = 10.0  # every query votes void
    masks = np.full((h, w, N), 10.0, np.float32)
    out = np.asarray(
        panoptic_class_map(jnp.asarray(cls), jnp.asarray(masks), (h, w), cfg)
    )
    assert (out == 133).all()
