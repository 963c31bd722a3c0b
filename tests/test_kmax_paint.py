"""Parity: the Pallas paint-kernel panoptic path (panoptic_inference_batch
with use_pallas=True) vs the fori_loop reference implementation.

The kernel runs in interpret mode here (CPU mesh); on TPU the same program
compiles through Mosaic. Semantics covered: confidence-sorted pasting,
overlap-threshold skip, stuff-merge ids, thing ids, all-void frames, and
non-tile-aligned map shapes (int8 tiles are (32, 128) — h/w below are
deliberately unaligned).
"""
import jax
import jax.numpy as jnp
import numpy as np

from spatially_aware_ai_tpu.models.kmax.model import (
    KMAX_TINY_TEST,
    panoptic_inference,
    panoptic_inference_batch,
)


def _run_both(cls, masks, cfg):
    cat_ref, seg_ref = jax.vmap(
        lambda c, m: panoptic_inference(c, m, cfg)
    )(jnp.asarray(cls), jnp.asarray(masks))
    cat_k, seg_k = panoptic_inference_batch(
        jnp.asarray(cls), jnp.asarray(masks), cfg,
        use_pallas=True, interpret=True,
    )
    return (
        np.asarray(cat_ref), np.asarray(seg_ref),
        np.asarray(cat_k), np.asarray(seg_k),
    )


def test_paint_kernel_matches_fori_loop_across_seeds():
    cfg = KMAX_TINY_TEST
    F, N, C, h, w = 3, 16, 133, 24, 33
    rng = np.random.default_rng(0)
    cls = rng.normal(size=(F, N, C + 1)).astype(np.float32) * 4.0
    masks = rng.normal(size=(F, h, w, N)).astype(np.float32) * 3.0
    cat_ref, seg_ref, cat_k, seg_k = _run_both(cls, masks, cfg)
    np.testing.assert_array_equal(cat_k, cat_ref)
    np.testing.assert_array_equal(seg_k, seg_ref)


def test_paint_kernel_overlap_and_stuff_merge():
    """Hand-built frame: a dominant thing mask, a mostly-covered weaker
    mask of the same class (must be dropped by overlap_threshold), and two
    disjoint stuff masks of one class (must share a segment id)."""
    cfg = KMAX_TINY_TEST
    N, C = 16, cfg.num_classes
    h, w = 20, 30
    cls = np.full((N, C + 1), -6.0, np.float32)
    masks = np.full((h, w, N), -8.0, np.float32)

    # q0: thing class 3, strong, covers cols [0, 20)
    cls[0, 3] = 8.0
    masks[:, :20, 0] = 6.0
    # q1: same thing class, slightly weaker, covers cols [12, 22). In the
    # contested cols [12, 20) the query-softmax splits ~0.52/0.48 — both
    # clear the 0.4 pixel threshold, so q1's binary mask is all 10 cols,
    # 8 of which q0 claims first -> new/area = 0.2 < overlap_threshold=0.8
    # -> q1 dropped, its exclusive cols [20, 22) stay null
    cls[1, 3] = 7.0
    masks[:, 12:22, 1] = 5.9
    # q2 + q3: stuff class 100 on two disjoint strips -> one shared id
    cls[2, 100] = 8.0
    masks[:5, 22:, 2] = 6.0
    cls[3, 100] = 7.5
    masks[10:15, 22:, 3] = 6.0

    cat_ref, seg_ref, cat_k, seg_k = _run_both(
        cls[None], masks[None], cfg
    )
    np.testing.assert_array_equal(cat_k, cat_ref)
    np.testing.assert_array_equal(seg_k, seg_ref)
    # and the semantic expectations themselves:
    assert (cat_k[0, :, :12] == 3).all()
    assert cat_k[0, 2, 25] == 100 and cat_k[0, 12, 25] == 100
    assert seg_k[0, 2, 25] == seg_k[0, 12, 25]  # stuff merged
    # q1 dropped: the region it alone covers stays null
    assert (cat_k[0, :, 20:22] == 133).all()


def test_paint_kernel_all_void():
    cfg = KMAX_TINY_TEST
    F, N, C, h, w = 2, 16, 133, 16, 17
    cls = np.zeros((F, N, C + 1), np.float32)
    cls[..., -1] = 10.0  # everything predicts void
    masks = np.zeros((F, h, w, N), np.float32)
    cat_ref, seg_ref, cat_k, seg_k = _run_both(cls, masks, cfg)
    np.testing.assert_array_equal(cat_k, cat_ref)
    np.testing.assert_array_equal(seg_k, seg_ref)
    assert (cat_k == 133).all() and (seg_k == 0).all()


def test_batch_dispatch_matches_scalar_path_on_cpu():
    """use_pallas=None on CPU routes to the vmapped fori_loop — the
    production call sites go through panoptic_inference_batch everywhere."""
    cfg = KMAX_TINY_TEST
    rng = np.random.default_rng(7)
    cls = rng.normal(size=(2, 16, 134)).astype(np.float32) * 4.0
    masks = rng.normal(size=(2, 12, 16, 16)).astype(np.float32) * 3.0
    cat_a, seg_a = panoptic_inference_batch(
        jnp.asarray(cls), jnp.asarray(masks), cfg
    )
    cat_b, seg_b = jax.vmap(
        lambda c, m: panoptic_inference(c, m, cfg)
    )(jnp.asarray(cls), jnp.asarray(masks))
    np.testing.assert_array_equal(np.asarray(cat_a), np.asarray(cat_b))
    np.testing.assert_array_equal(np.asarray(seg_a), np.asarray(seg_b))
