"""Fused CLIP-feature splatting as a Pallas TPU kernel.

The dominant HBM cost of fusion is the [N, C=512] feat_sum read-modify-write,
once per frame in the XLA scan path (2 x N x C x 4 bytes per frame). This
kernel batches a whole F-frame chunk into ONE pass over the grid by
reformulating the bilinear gather-accumulate as a matmul:

    feat_sum[v] += sum_{f,p} W[v, f*P + p] * feat_imgs[f, p, :]

where W holds each voxel's (<= 4 per frame) bilinear patch weights. W is
never materialized in HBM: each grid step builds its [TILE, F*P] slab in
VMEM registers from the projected patch coordinates (4 compare-selects
against a patch-index iota) and feeds the MXU directly. Per chunk the grid
is read+written once instead of F times — an F-fold HBM traffic reduction —
and the FLOPs land on the systolic array.

Inputs are prepared by the XLA geometry pass (grid/fusion.py): per voxel and
frame the patch-space sampling coordinates and the feature-validity mask.
Bilinear semantics (zero padding out of bounds) match sample_feat_img /
torch grid_sample exactly; parity is covered by tests against the scan path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _splat_kernel(uvw_ref, feat_ref, acc_in_ref, out_ref, *, F, Py, Px, P):
    """uvw_ref [TILE, F*3] = interleaved (px, py, valid) per frame, in patch
    coords; feat_ref [F, P, C] with the patch axis zero-padded to a 128-lane
    multiple; acc_in_ref/out_ref [TILE, C] (aliased feat_sum).

    One [TILE, P] weight slab per frame feeds the MXU. Layout notes
    (hard-won): every VMEM block keeps the minor dim >= 8-ish and slices
    along it — a [TILE, F, 3] block's 3-wide minor dim would be padded to
    128 lanes by Mosaic (a 42x VMEM blow-up that OOMs scoped vmem), and an
    unaligned patch count (e.g. 35) forces pathological relayouts; the
    caller pads P, and the padded one-hot columns simply never match (their
    feature rows are zeros anyway).
    """
    tile = out_ref.shape[0]

    acc = acc_in_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, P), 1)
    for f in range(F):
        px = uvw_ref[:, 3 * f]
        py = uvw_ref[:, 3 * f + 1]
        val = uvw_ref[:, 3 * f + 2]
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        W = jnp.zeros((tile, P), jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0.astype(jnp.int32) + dx
                cy = y0.astype(jnp.int32) + dy
                wx = fx if dx else (1.0 - fx)
                wy = fy if dy else (1.0 - fy)
                w = wx * wy * val
                inb = (cx >= 0) & (cx < Px) & (cy >= 0) & (cy < Py)
                idx = cy * Px + cx
                hit = col == jnp.where(inb, idx, -1)[:, None]
                W = W + jnp.where(hit, w[:, None], 0.0)
        acc = acc + jnp.dot(
            W, feat_ref[f], preferred_element_type=jnp.float32
        )
    out_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("tile", "interpret"),
    donate_argnums=(0,),
)
def fused_feature_splat(
    feat_sum, uvw, feat_imgs, *, tile: int = DEFAULT_TILE, interpret: bool = False
):
    """feat_sum [N, C] += batched bilinear splat of a frame chunk.

    Args:
      feat_sum: [N, C] f32 accumulator (donated; N % tile == 0).
      uvw: [N, F, 3] f32 — patch-space x, y and validity weight per
        (voxel, frame). Validity 0 contributes nothing.
      feat_imgs: [F, Py, Px, C] f32 patch-feature images.
    """
    N, C = feat_sum.shape
    F, Py, Px, C2 = feat_imgs.shape
    assert C == C2, (C, C2)
    assert N % tile == 0, f"{N=} must be a multiple of {tile=}"
    # pad the patch axis to a 128-lane multiple for Mosaic-friendly layouts
    P = ((Py * Px + 127) // 128) * 128
    feat_flat = feat_imgs.reshape(F, Py * Px, C)
    feat_flat = jnp.pad(feat_flat, ((0, 0), (0, P - Py * Px), (0, 0)))

    kernel = functools.partial(_splat_kernel, F=F, Py=Py, Px=Px, P=P)
    flops_per_tile = 2 * tile * F * P * C

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[
            pl.BlockSpec((tile, F * 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, P, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), feat_sum.dtype),
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * (N // tile),
            bytes_accessed=2 * N * C * 4 + N * F * 3 * 4 + F * P * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(uvw.reshape(N, F * 3), feat_flat, feat_sum)
