"""ConvNeXt backbone in Flax (multi-scale features for kMaX-DeepLab).

The reference's panoptic segmenter is kMaX-DeepLab with a ConvNeXt-Large
backbone (README.md:49, kmax_convnext_large.yaml). From-scratch Flax
implementation of ConvNeXt (Liu et al. 2022): 4x4/s4 patchify stem + LN, four
stages of [depthwise 7x7 -> LN -> 4x pointwise -> GELU -> pointwise ->
layer-scale] blocks with LN downsampling between stages. Returns the feature
pyramid {os4, os8, os16, os32}.

TPU notes: depthwise + 1x1 convs map directly onto XLA's fused conv paths;
channels-last layout throughout; bf16-friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


def use_shift_dwconv(override=None) -> bool:
    """Gate for the shift-and-add depthwise-conv formulation (pad once +
    49 static slices, f32 accumulate). Same math as the grouped-conv
    lowering flax emits for `nn.Conv(feature_group_count=C)`; the slice
    form gives XLA a pure elementwise MAC chain it can fuse instead of a
    grouped convolution (whose TPU lowering is the term
    benchmarks/bench_dwconv.py sizes). Resolution: explicit module
    override wins, else SAI_DWCONV=shift opts in, SAI_DWCONV=xla pins the
    conv lowering; default is the conv lowering until the TPU A/B says
    otherwise."""
    import os

    if override is not None:
        return override
    return os.environ.get("SAI_DWCONV") == "shift"


def dwconv7_shift(x, kernel, bias):
    """Depthwise 7x7 SAME conv as pad + 49 static shifted MACs.

    Args:
      x: [B, H, W, C] (any float dtype; products/accumulation in f32).
      kernel: [7, 7, 1, C] — the HWIO param `nn.Conv` registers for a
        depthwise conv (feature_group_count=C), used as-is so checkpoints
        and converters are layout-unaffected.
      bias: [C].
    Returns [B, H, W, C] in x.dtype.
    """
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    acc = jnp.zeros(x.shape, jnp.float32)
    for dy in range(7):
        for dx in range(7):
            acc = acc + (
                xp[:, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
                * kernel[dy, dx, 0].astype(jnp.float32)
            )
    return (acc + bias.astype(jnp.float32)).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (192, 384, 768, 1536)
    layer_scale_init: float = 1e-6


CONVNEXT_LARGE = ConvNeXtConfig()
CONVNEXT_TINY_TEST = ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(16, 32, 48, 64))


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float
    dtype: Any = jnp.float32
    # None = auto (fused LN->MLP Pallas kernel on TPU); True forces the
    # fused path (interpret mode off-TPU, for tests); False forces unfused
    fused_mlp: Any = None
    # None = env (SAI_DWCONV=shift); True/False force the shift-MAC /
    # grouped-conv depthwise formulations (see use_shift_dwconv)
    shift_dwconv: Any = None

    @nn.compact
    def __call__(self, x):
        dwconv = nn.Conv(
            self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )
        if not self.is_initializing() and use_shift_dwconv(self.shift_dwconv):
            # params were registered by the grouped-conv module at init;
            # compute the identical conv as 49 shifted MACs instead
            v = self.variables["params"]["dwconv"]
            h = dwconv7_shift(x.astype(self.dtype),
                              v["kernel"], v["bias"])
        else:
            h = dwconv(x)
        norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        pw1 = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")
        pw2 = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        from ..pallas_mlp import use_fused_mlp

        if (
            not self.is_initializing()
            and use_fused_mlp(self.dim, self.fused_mlp)
        ):
            # fused LN->pw1->gelu->pw2->scale->residual: the 4x hidden
            # tensor stays in VMEM instead of round-tripping HBM (the
            # os16/os32 stages are HBM-bound; see models/pallas_mlp.py).
            # Submodules above registered the params; read them directly.
            import jax as _jax

            from ..pallas_mlp import fused_ln_mlp

            v = self.variables["params"]
            B, H, W, C = h.shape
            out = fused_ln_mlp(
                h.reshape(B * H * W, C),
                x.reshape(B * H * W, C),
                v["norm"]["scale"], v["norm"]["bias"],
                v["pwconv1"]["kernel"], v["pwconv1"]["bias"],
                v["pwconv2"]["kernel"], v["pwconv2"]["bias"],
                gamma,
                act="gelu", eps=1e-6,
                interpret=_jax.default_backend() != "tpu",
            )
            return out.reshape(B, H, W, C)
        h = norm(h)
        h = pw1(h)
        h = nn.gelu(h, approximate=False)
        h = pw2(h)
        return x + h * gamma.astype(h.dtype)


class ConvNeXt(nn.Module):
    cfg: ConvNeXtConfig = CONVNEXT_LARGE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, 3] -> dict os4/os8/os16/os32 feature maps."""
        c = self.cfg
        feats = {}
        # stem: 4x4 stride-4 conv + LN
        x = nn.Conv(c.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"down{stage}_norm"
                )(x)
                x = nn.Conv(
                    c.dims[stage], (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"down{stage}_conv",
                )(x)
            for blk in range(c.depths[stage]):
                x = ConvNeXtBlock(
                    c.dims[stage], c.layer_scale_init, self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            feats[f"os{4 * 2 ** stage}"] = x
        return feats
