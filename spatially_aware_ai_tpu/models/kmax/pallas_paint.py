"""Panoptic mask pasting as a single Pallas TPU kernel.

The reference consumes detectron2's sequential mask pasting
(handy_utils.py:103-133): queries sorted by confidence claim still-unclaimed
pixels, with an overlap-threshold skip rule. `model.panoptic_inference`
reproduces it as a `lax.fori_loop` over the (fixed, 128) query count — exact,
but every iteration re-touches the full [h, w] maps as a separate fused XLA
loop body (~2.5-5 ms/frame at the 1281 operating point).

This kernel streams the query masks through VMEM ONCE, in paint order, with
the claim state resident on-chip:

    grid = (F frames, N queries). The paint order and the class-keep flags
    are SCALAR-PREFETCHED (SMEM): the mask block index_map dereferences
    order[f, j], so the kernel walks the softmaxed mask probabilities
    [F, N, h, w] in confidence order with NO gather/relayout pass in HBM —
    v1 of this kernel pre-sorted + int32-ified the masks in XLA and lost
    2x to those passes (plus a scatter) before the kernel even ran.

    Per step j the kernel binarizes mask order[f, j] in-VMEM
    (prob > pixel_threshold), intersects it with the unclaimed set
    (claim < 0), applies the scalar accept rule, and conditionally stamps
    the PAINT-ORDER index j into the claim map. The claim map lives in
    VMEM scratch across the N steps of a frame; only the final [h, w]
    int32 claim map leaves the kernel.

The per-query accept flags are not a kernel output: whenever
overlap_threshold > 0, "accepted" == "claimed at least one pixel", so
`panoptic_inference_batch` recovers them from the claim map with one
compare-any reduction (and falls back to the fori_loop path for thr <= 0).

The sequential-paint semantics (the accept decision for query j depends on
every earlier accepted mask) are preserved exactly — the grid's minor
dimension iterates in order on TPU. Everything downstream of the paint loop
(segment-id assignment, stuff-merge, category lookup) is order-free and runs
vectorized in XLA (`model.panoptic_inference_batch`).

HBM traffic: one pass over the [N, h, w] f32 probabilities (~55 MB/frame at
241x321) instead of the fori_loop's ~6 map passes per iteration.

Measured outcome (v5e, benchmarks/bench_paint.py, same-run A/B at the 1281
point): 4.3 ms/frame vs 3.9 for the claim-carrying XLA fori — the phase is
NOT bandwidth-bound; the two per-step whole-map scalar reductions (the
sequential accept dependency) dominate either way. The kernel is therefore
OPT-IN (SAI_PAINT_PALLAS=1), kept as the scaling path for larger mask
resolutions where the fori_loop's per-iteration map traffic would grow
quadratically while this kernel stays single-pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _paint_kernel(order_ref, keep_ref, probs_ref, claim_ref, claim_s, *,
                  n_queries, overlap_threshold, pixel_threshold):
    f = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        claim_s[:] = jnp.full_like(claim_s, -1)

    m = probs_ref[0, 0] > pixel_threshold
    new = m & (claim_s[:] < 0)
    # areas as f32 (exact for < 2^24 pixels); the accept ratio uses the
    # same new/max(mask,1) formulation as the fori_loop path so the two
    # implementations agree bit-for-bit at threshold boundaries
    mask_area = jnp.sum(m.astype(jnp.float32))
    new_area = jnp.sum(new.astype(jnp.float32))
    ok = (
        (keep_ref[f, j] > 0)
        & (mask_area > 0)
        & (new_area / jnp.maximum(mask_area, 1.0) >= overlap_threshold)
    )
    claim_s[:] = jnp.where(new & ok, j, claim_s[:])

    @pl.when(j == n_queries - 1)
    def _():
        claim_ref[0] = claim_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("overlap_threshold", "pixel_threshold", "interpret"),
)
def paint_masks(mask_probs, order, keep, *, overlap_threshold,
                pixel_threshold, interpret=False):
    """Sequential-paint claim resolution for a batch of frames.

    Args:
      mask_probs: [F, N, h, w] f32 — query-softmaxed mask probabilities
        (NOT sorted; the kernel walks them via `order`).
      order: [F, N] int32 — paint (confidence) order, most confident first.
      keep: [F, N] int32 — class-confidence keep flags in PAINT order
        (keep[f, j] gates the j-th painted query, i.e. query order[f, j]).
      overlap_threshold: accept rule — a query paints only when
        new_area / mask_area >= overlap_threshold. Must be > 0 for the
        caller's claimed==accepted reconstruction to hold.
      pixel_threshold: mask binarization threshold (must be > 0 so the
        -1 padding below can never binarize as covered).
    Returns:
      claim: [F, h, w] int32 — PAINT-ORDER index of the accepted query
      that claimed each pixel, -1 where unclaimed.
    """
    F, N, h, w = mask_probs.shape
    # f32 VMEM tiles are (8, 128); pad with -1 (below any prob, and below
    # any pixel_threshold > 0) so padded pixels never count as covered
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if (hp, wp) != (h, w):
        mask_probs = jnp.pad(
            mask_probs, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
            constant_values=-1.0,
        )

    kernel = functools.partial(
        _paint_kernel, n_queries=N, overlap_threshold=overlap_threshold,
        pixel_threshold=pixel_threshold,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F, N),
        in_specs=[
            pl.BlockSpec(
                (1, 1, hp, wp),
                lambda f, j, order_ref, keep_ref: (f, order_ref[f, j], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, hp, wp), lambda f, j, *_: (f, 0, 0)),
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.int32)],
    )
    claim = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, hp, wp), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=F * N * hp * wp * 4,
            bytes_accessed=F * N * hp * wp * 4 + F * hp * wp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(order.astype(jnp.int32), keep.astype(jnp.int32),
      mask_probs.astype(jnp.float32))
    return claim[:, :h, :w]
