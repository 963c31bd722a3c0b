import numpy as np
import jax.numpy as jnp
import torch

from spatially_aware_ai_tpu.query import (
    run_query,
    clip_feature_surgery,
    query_relevance_postprocess,
    surgery_relevance_2sigma,
    turbo_colormap,
    PROMPT_TEMPLATES_85,
    CONTROL_OBJECTS,
)

RNG = np.random.default_rng(3)


def test_constants():
    assert len(PROMPT_TEMPLATES_85) == 85
    assert len(CONTROL_OBJECTS) == 63


def test_run_query_matches_torch():
    feats = RNG.normal(size=(100, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    text = RNG.normal(size=(5, 20)).astype(np.float32)  # wider than img feats
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    ours = np.asarray(run_query(jnp.asarray(feats), jnp.asarray(text)))

    t_feats = torch.from_numpy(feats)
    t_text = torch.from_numpy(text)[:, :16]  # reference truncates text dims
    theirs = (100 * t_feats @ t_text.T).softmax(dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_clip_feature_surgery_matches_torch():
    img = RNG.normal(size=(1, 50, 16)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    text = RNG.normal(size=(7, 16)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    ours = np.asarray(clip_feature_surgery(jnp.asarray(img), jnp.asarray(text)))

    # torch oracle implementing the reference math (clipfusion.py:906-934)
    ti = torch.from_numpy(img)
    tt = torch.from_numpy(text)
    prob = ti[:, :1, :] @ tt.t()
    prob = (prob * 2).softmax(-1)
    w = prob / prob.mean(-1, keepdim=True)
    b, n_t, n_i, c = ti.shape[0], tt.shape[0], ti.shape[1], ti.shape[2]
    feats = ti.reshape(b, n_i, 1, c) * tt.reshape(1, 1, n_t, c)
    feats = feats * w.reshape(1, 1, n_t, 1)
    redundant = feats.mean(2, keepdim=True)
    feats = feats - redundant
    theirs = feats.sum(-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_postprocess():
    rel = RNG.normal(size=1000).astype(np.float32)
    out = query_relevance_postprocess(rel)
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6
    assert abs(out.max() - 1.0) < 1e-5

    out2 = surgery_relevance_2sigma(rel)
    med, std = np.median(rel), rel.std(ddof=1)
    np.testing.assert_array_equal(out2 > 0, rel > med + 2 * std)


def test_turbo_colormap():
    x = np.linspace(0, 1, 11)
    rgb = turbo_colormap(x)
    assert rgb.shape == (11, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # turbo: starts blue-ish, mid green-ish, ends red-ish
    assert rgb[0, 2] > rgb[0, 0]
    assert rgb[-1, 0] > rgb[-1, 2]
    assert rgb[5, 1] > 0.5


def test_surgery_fast_matches_reference_shaped():
    """clip_feature_surgery_fast (two matmuls) must equal the
    reference-shaped implementation (materialized [B,N,L,C] tensor)."""
    import jax.numpy as jnp
    from spatially_aware_ai_tpu.query.text import (
        clip_feature_surgery,
        clip_feature_surgery_fast,
    )

    rng = np.random.default_rng(5)
    for B, N, L, C in [(1, 50, 7, 16), (2, 33, 12, 32)]:
        img = rng.normal(size=(B, N, C)).astype(np.float32)
        img /= np.linalg.norm(img, axis=-1, keepdims=True)
        txt = rng.normal(size=(L, C)).astype(np.float32)
        txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
        ref = np.asarray(
            clip_feature_surgery(jnp.asarray(img), jnp.asarray(txt))
        )
        fast = np.asarray(
            clip_feature_surgery_fast(jnp.asarray(img), jnp.asarray(txt))
        )
        np.testing.assert_allclose(fast, ref, atol=1e-5)
