"""Tiled CLIP feature extraction: patch decomposition + depth-scaled variant."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.models.clip.tiling import (
    get_patches,
    num_patches,
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
)

RNG = np.random.default_rng(13)


def test_get_patches_matches_unfold():
    H, W, ps, stride = 40, 56, 16, 8
    img = RNG.normal(size=(H, W, 3)).astype(np.float32)
    patches = np.asarray(get_patches(jnp.asarray(img), ps, stride))
    ny, nx = num_patches(H, ps, stride), num_patches(W, ps, stride)
    assert patches.shape == (ny, nx, ps, ps, 3)

    t = torch.from_numpy(img.transpose(2, 0, 1))[None]
    unf = TF.unfold(t, kernel_size=(ps, ps), stride=stride)
    unf = unf.transpose(1, 2).reshape(1, ny, nx, 3, ps, ps)[0]
    np.testing.assert_allclose(
        patches, unf.permute(0, 1, 3, 4, 2).numpy(), atol=1e-6
    )


def test_tiled_batch_matches_per_frame():
    engine = ClipEngine.tiny()
    imgs = RNG.uniform(size=(3, 56, 56, 3)).astype(np.float32)
    batch = np.asarray(engine.img_inference_tiled_batch(imgs, 28, 14))
    for i in range(3):
        single = np.asarray(engine.img_inference_tiled(imgs[i], 28, 14))
        np.testing.assert_allclose(batch[i], single, atol=1e-4)


def test_depthscaled_shapes_and_scaling():
    engine = ClipEngine.tiny()
    H, W = 64, 96
    img = RNG.uniform(size=(H, W, 3)).astype(np.float32)
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)
    depth = np.full((H, W), 1.0, np.float32)
    out = engine.img_inference_tiled_depthscaled(img, depth, K, 16)
    ny = len(np.arange(16, H, 16))
    nx = len(np.arange(16, W, 16))
    assert np.asarray(out).shape == (ny, nx, engine.feature_dim)
    assert np.isfinite(np.asarray(out)).all()

    # with uniform depth, a flat image, and a footprint small enough that no
    # crop crosses the border, all features must be identical
    flat = np.full((H, W, 3), 0.5, np.float32)
    out_flat = np.asarray(
        engine.img_inference_tiled_depthscaled(
            flat, depth, K, 16, footprint_m=0.2
        )
    )
    np.testing.assert_allclose(
        out_flat, np.broadcast_to(out_flat[0, 0], out_flat.shape), atol=1e-3
    )

    # invalid depth (0) everywhere -> zero features (weight 0)
    out_zero = np.asarray(
        engine.img_inference_tiled_depthscaled(
            img, np.zeros((H, W), np.float32), K, 16
        )
    )
    np.testing.assert_allclose(out_zero, 0.0, atol=1e-6)


def test_batch_fast_prep_matches_slow():
    """The resize-once fast path must match unfold-then-resize per patch."""
    import jax
    from spatially_aware_ai_tpu.models.clip.tiling import (
        OPENAI_CLIP_MEAN,
        OPENAI_CLIP_STD,
        get_patches,
    )

    engine = ClipEngine.tiny()
    # downscaling geometry that qualifies for the fast path (ps >= 224)
    PS, STRIDE = 256, 128
    imgs = RNG.uniform(size=(2, 512, 512, 3)).astype(np.float32)
    out = np.asarray(engine.img_inference_tiled_batch(imgs, PS, STRIDE))

    # slow reference: per-frame unfold -> per-patch resize -> encode
    normed = (imgs - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    feats = []
    for f in range(2):
        p = np.asarray(get_patches(jnp.asarray(normed[f]), PS, STRIDE))
        ny, nx = p.shape[:2]
        flat = jnp.asarray(p.reshape(ny * nx, PS, PS, 3))
        resized = jax.image.resize(
            flat, (ny * nx, 224, 224, 3), method="bilinear", antialias=False
        )
        feats.append(
            np.asarray(
                engine._encode_image(engine.params, resized)
            ).reshape(ny, nx, -1)
        )
    expect = np.stack(feats)
    np.testing.assert_allclose(out, expect, atol=5e-3)


def test_get_patches_cf_matches_channels_last():
    from spatially_aware_ai_tpu.models.clip.tiling import get_patches_cf

    rng = np.random.default_rng(7)
    for H, W, ps, st in [(448, 672, 224, 112), (96, 120, 48, 24),
                         (64, 64, 32, 32)]:
        img = rng.normal(size=(H, W, 3)).astype(np.float32)
        want = np.asarray(get_patches(jnp.asarray(img), ps, st))
        # lead axes (F=2, C=3)
        cf = jnp.asarray(
            np.stack([img, img * 2.0]).transpose(0, 3, 1, 2)
        )  # [2, 3, H, W]
        got = np.asarray(get_patches_cf(cf, ps, st))  # [ny,nx,2,3,ps,ps]
        np.testing.assert_array_equal(
            got[:, :, 0].transpose(0, 1, 3, 4, 2), want
        )
        np.testing.assert_array_equal(
            got[:, :, 1].transpose(0, 1, 3, 4, 2), want * 2.0
        )


def test_fused_conv_stem_matches_unfused():
    """The fused conv stem (dense conv1 at stride gcd + embedding-space
    slicing) must match the materialize-patches path exactly, including the
    non-trivial g=16 case where per-patch token grids step by 2 through the
    dense grid (ViT patch 32, scaled stride 112)."""
    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.models.clip.model import CLIPConfig
    from spatially_aware_ai_tpu.models.clip.tiling import (
        tiled_image_features_batch,
    )

    cfg = CLIPConfig(
        embed_dim=32, image_size=224, patch_size=32, vision_width=64,
        vision_layers=2, vision_heads=4, vocab_size=49408,
        context_length=77, text_width=64, text_heads=4, text_layers=2,
    )
    engine = ClipEngine.random(cfg)  # stem is opt-in (SAI_FUSED_STEM=1);
    # this test drives the fused path explicitly through tiling
    imgs = RNG.uniform(size=(2, 512, 512, 3)).astype(np.float32)
    kw = dict(patch_size=256, patch_stride=128,
              encode_fn=engine._encode_image)
    unfused = np.asarray(
        tiled_image_features_batch(engine.params, jnp.asarray(imgs), **kw)
    )
    fused = np.asarray(
        tiled_image_features_batch(
            engine.params, jnp.asarray(imgs), **kw,
            conv_kernel_fn=engine._conv_kernel,
            encode_tokens_fn=engine._encode_tokens,
            conv_patch=cfg.patch_size,
        )
    )
    assert fused.shape == unfused.shape == (2, 3, 3, 32)
    np.testing.assert_allclose(fused, unfused, atol=2e-4)


def test_get_patches_fast_slices_match_naive():
    """The k^2-slice unfold (patch_size % stride == 0) and the gather
    fallback must both equal a naive python unfold."""
    rng = np.random.default_rng(0)

    def naive(img, ps, st):
        H, W, C = img.shape
        ny = (H - ps) // st + 1
        nx = (W - ps) // st + 1
        out = np.zeros((ny, nx, ps, ps, C), img.dtype)
        for i in range(ny):
            for j in range(nx):
                out[i, j] = img[i * st:i * st + ps, j * st:j * st + ps]
        return out

    cases = [
        (224, 448, 224, 112),  # fast, k=2 (production geometry scaled)
        (96, 120, 48, 24),     # fast, k=2
        (72, 96, 40, 8),       # fast, k=5
        (96, 144, 48, 16),     # fast, k=3
        (60, 80, 40, 20),      # fast, k=2
        (66, 90, 42, 12),      # gather fallback (42 % 12 != 0)
    ]
    for H, W, ps, st in cases:
        img = rng.normal(size=(H, W, 3)).astype(np.float32)
        got = np.asarray(get_patches(jnp.asarray(img), ps, st))
        np.testing.assert_array_equal(
            got, naive(img, ps, st), err_msg=f"{H}x{W} ps={ps} st={st}"
        )
