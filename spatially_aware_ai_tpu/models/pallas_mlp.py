"""Fused LayerNorm -> Dense(4D) -> activation -> Dense(D) residual block
as a Pallas TPU kernel — the transformer/ConvNeXt "MLP sub-block".

Motivation (measured on v5e-1, benchmarks/bench_kmax.py): the ConvNeXt-L
os16 stage runs at 14% MXU utilization because the 4x-expanded hidden
tensor round-trips through HBM in every block (h4 is written by pwconv1,
read+written by gelu, read by pwconv2 — ~0.7 GB per block at the 1281
operating point). XLA cannot fuse elementwise work THROUGH a matmul, so the
round-trip is structural. This kernel keeps the hidden in VMEM: per
(row-tile i, hidden-block j) grid step it computes

    h_j   = act( LN(x)[TM, D] @ W1[:, j*TH:(j+1)*TH] + b1_j )
    acc  += h_j @ W2[j*TH:(j+1)*TH, :]

with LN(x) computed once (cached in VMEM scratch at j==0) and the final

    out = residual + gamma * (acc + b2)

written at the last hidden block. HBM traffic per block drops from
~7 passes over x plus 3 passes over the 4x hidden to: read x + residual,
read the weights once, write out.

Used by models/kmax/convnext.py (ConvNeXtBlock: exact gelu, layer-scale
gamma, eps 1e-6, residual = pre-dwconv input) and models/clip/model.py
(ViT/text MLP: quickgelu, no gamma, eps 1e-5, residual = block input).
Parity vs the unfused Flax modules is covered by tests/test_pallas_mlp.py
(interpret mode on CPU; same tolerances as the models' bf16 paths).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TM = 256
DEFAULT_TH = 512


def use_fused_mlp(dim: int, override=None, default_on: bool = True) -> bool:
    """Fused-kernel gate: 64-multiple channel dims (Mosaic pads the lane
    dim; measured a 32% win even at the os4 stage's dim 192). Resolution
    order: SAI_FUSED_MLP=0 kills it everywhere, explicit module override
    wins next, SAI_FUSED_MLP=1 forces it on, then `default_on` decides
    whether this call site uses it on TPU by default (measured: ConvNeXt
    blocks win 17-32%, the CLIP transformer MLP is neutral-to-slightly-
    negative, so CLIP passes default_on=False)."""
    import os

    env = os.environ.get("SAI_FUSED_MLP")
    if env == "0":
        return False
    if override is not None:  # explicit force bypasses the lane gate too
        return override
    if dim % 64 != 0:
        return False
    if env == "1":
        return True
    if not default_on:
        return False
    return jax.default_backend() == "tpu"


def _erf(z):
    """Abramowitz & Stegun 7.1.26 polynomial erf (|error| < 1.5e-7) — Mosaic
    has no erf lowering; exp is available and 1.5e-7 is far below the bf16
    noise floor of the surrounding matmuls."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * a)
    poly = t * (
        np.float32(0.254829592)
        + t * (
            np.float32(-0.284496736)
            + t * (
                np.float32(1.421413741)
                + t * (
                    np.float32(-1.453152027) + t * np.float32(1.061405429)
                )
            )
        )
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _act(h, kind: str):
    if kind == "gelu":  # exact (erf) gelu — flax approximate=False
        return 0.5 * h * (1.0 + _erf(h * np.float32(0.7071067811865476)))
    if kind == "quick_gelu":  # CLIP: x * sigmoid(1.702 x)
        return h * jax.nn.sigmoid(1.702 * h)
    raise ValueError(f"unknown activation: {kind}")


def _ln_mlp_kernel(
    x_ref, res_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    gamma_ref, o_ref, lnx_ref, acc_ref, *, act, eps, nh, out_dtype,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        lnx = (x - mu) * jax.lax.rsqrt(var + eps)
        lnx = lnx * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(
            jnp.float32
        )
        lnx_ref[:] = lnx.astype(lnx_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = (
        jnp.dot(lnx_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32)
    )
    g = _act(h, act).astype(lnx_ref.dtype)
    acc_ref[:] = acc_ref[:] + jnp.dot(
        g, w2_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(j == nh - 1)
    def _():
        out = acc_ref[:] + b2_ref[:].astype(jnp.float32)
        out = out * gamma_ref[:].astype(jnp.float32)
        o_ref[:] = (res_ref[:].astype(jnp.float32) + out).astype(out_dtype)


def _tile_defaults(D: int):
    """Row-tile / hidden-block sizes by channel width, env-overridable
    (SAI_FUSED_MLP_TM / SAI_FUSED_MLP_TH pin both globally for sweeps).

    Measured on v5e (benchmarks/bench_mlp_tiles.py, same-run A/B at the
    ConvNeXt-L 1281 stage shapes): th=1024 beats 512 at D>=384 (os8
    24.2->29.7, os16 28.0->39.8, os32 41.2->42.7 TFLOP/s) — fewer hidden
    blocks amortize the cached-LN row tile better. tm is VMEM-bound and
    non-monotonic: (512, 1024) wins at D=768 but is 37% SLOWER at D=384
    and OOMs scoped vmem at D=1536, so the table follows the measurements
    rather than a single default. D=1536 keeps th=512: th=1024 passed an
    isolated microbench but hit the 16 MB scoped-vmem limit inside the
    full _infer_fused_labels program (double-buffered 3 MB weight slices;
    th=512 costs 3.5% there and leaves headroom)."""
    import os

    env_tm = os.environ.get("SAI_FUSED_MLP_TM")
    env_th = os.environ.get("SAI_FUSED_MLP_TH")
    if env_tm or env_th:
        return (int(env_tm or DEFAULT_TM), int(env_th or DEFAULT_TH))
    if D < 384:
        return (512, 512)
    if D < 768:
        return (256, 1024)
    if D < 1536:
        return (512, 1024)
    return (256, 512)


@functools.partial(
    jax.jit,
    static_argnames=("act", "eps", "tm", "th", "interpret"),
)
def _fused_ln_mlp_impl(
    x,
    residual,
    ln_scale,
    ln_bias,
    w1,
    b1,
    w2,
    b2,
    gamma=None,
    *,
    act: str = "gelu",
    eps: float = 1e-6,
    tm: int = DEFAULT_TM,
    th: int = DEFAULT_TH,
    interpret: bool = False,
):
    """residual + gamma * (act(LN(x) @ w1 + b1) @ w2 + b2), hidden in VMEM.

    Args:
      x: [M, D] input to normalize (ConvNeXt: the post-dwconv features).
      residual: [M, D] tensor added to the MLP output (ConvNeXt: the
        pre-dwconv block input; transformers: x itself).
      ln_scale, ln_bias: [D] LayerNorm affine.
      w1 [D, H], b1 [H], w2 [H, D], b2 [D]: the two Dense layers.
      gamma: optional [D] layer-scale (None = ones).
      act: "gelu" (exact erf) or "quick_gelu".
    Returns [M, D] in x.dtype. M is padded internally to a tile multiple;
    D and H should be multiples of 128 for efficient Mosaic layouts (the
    caller gates on this).
    """
    M, D = x.shape
    H = w1.shape[1]
    th = min(th, H)
    while H % th != 0 and th > 128:
        th -= 128  # largest 128-multiple block dividing H (H=4D cases)
    if H % th != 0:
        raise ValueError(f"no 128-multiple hidden block divides {H=}")
    nh = H // th
    tm = min(tm, max(8, M))
    tm = -(-tm // 8) * 8  # sublane multiple (Mosaic rejects e.g. (77, D))
    m_pad = (-M) % tm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
        residual = jnp.pad(residual, ((0, m_pad), (0, 0)))
    Mp = M + m_pad
    if gamma is None:
        gamma = jnp.ones((D,), jnp.float32)
    # weights feed the MXU in the activation dtype (same promotion as
    # flax Dense(dtype=...)); LN/bias/gamma params stay f32 in-kernel
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)

    kernel = functools.partial(
        _ln_mlp_kernel, act=act, eps=eps, nh=nh, out_dtype=x.dtype
    )
    row = lambda v: v.reshape(1, -1)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // tm, nh),
        in_specs=[
            pl.BlockSpec((tm, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((tm, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # residual
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln_scale
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln_bias
            pl.BlockSpec((D, th), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec((1, th), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec((th, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # gamma
        ],
        out_specs=pl.BlockSpec((tm, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, D), x.dtype),      # cached LN(x)
            pltpu.VMEM((tm, D), jnp.float32),  # f32 accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * D * H * 2,
            bytes_accessed=(3 * Mp * D + 2 * D * H) * x.dtype.itemsize,
            transcendentals=Mp * H,
        ),
        interpret=interpret,
    )(
        x, residual, row(ln_scale), row(ln_bias), w1, row(b1), w2, row(b2),
        row(gamma),
    )
    return out[:M]


def fused_ln_mlp(
    x, residual, ln_scale, ln_bias, w1, b1, w2, b2, gamma=None, *,
    act: str = "gelu", eps: float = 1e-6, tm: int = None, th: int = None,
    interpret: bool = False,
):
    """residual + gamma * (act(LN(x) @ w1 + b1) @ w2 + b2), hidden in VMEM.
    tm/th default to the measured per-width table in `_tile_defaults`
    (SAI_FUSED_MLP_TM/TH pin them globally); see `_fused_ln_mlp_impl` for
    the full contract."""
    dtm, dth = _tile_defaults(x.shape[1])
    return _fused_ln_mlp_impl(
        x, residual, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        act=act, eps=eps, tm=tm or dtm, th=th or dth, interpret=interpret,
    )
