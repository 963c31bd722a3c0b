"""Parity of the Flax ConvNeXt vs an independent torch implementation of the
standard ConvNeXt layout (facebookresearch/ConvNeXt state-dict naming),
through the converter — validates kernel transposes, depthwise conv, LN
placement, and layer scale."""
import numpy as np
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from spatially_aware_ai_tpu.models.kmax import ConvNeXt
from spatially_aware_ai_tpu.models.kmax.convnext import ConvNeXtConfig
from spatially_aware_ai_tpu.models.kmax.convert import convert_convnext_state_dict

DEPTHS = (1, 1, 2, 1)
DIMS = (8, 16, 24, 32)


class TorchBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, 4 * dim)
        self.act = tnn.GELU()
        self.pwconv2 = tnn.Linear(4 * dim, dim)
        self.gamma = tnn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):  # x [B, C, H, W]
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv2(self.act(self.pwconv1(x)))
        x = self.gamma * x
        return inp + x.permute(0, 3, 1, 2)


class TorchConvNeXt(tnn.Module):
    def __init__(self, depths=DEPTHS, dims=DIMS):
        super().__init__()
        self.downsample_layers = tnn.ModuleList()
        stem = tnn.Sequential(
            tnn.Conv2d(3, dims[0], 4, stride=4),
            ChannelLN(dims[0]),
        )
        self.downsample_layers.append(stem)
        for i in range(3):
            self.downsample_layers.append(
                tnn.Sequential(
                    ChannelLN(dims[i]),
                    tnn.Conv2d(dims[i], dims[i + 1], 2, stride=2),
                )
            )
        self.stages = tnn.ModuleList(
            tnn.Sequential(*[TorchBlock(dims[i]) for _ in range(depths[i])])
            for i in range(4)
        )

    def forward(self, x):
        outs = []
        for i in range(4):
            x = self.downsample_layers[i](x)
            x = self.stages[i](x)
            outs.append(x)
        return outs


class ChannelLN(tnn.Module):
    """LayerNorm over channels of an NCHW tensor (channels_first variant)."""

    def __init__(self, dim):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(dim))
        self.bias = tnn.Parameter(torch.zeros(dim))

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-6)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def test_convnext_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchConvNeXt().eval()
    # randomize gamma so layer scale is exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, TorchBlock):
                m.gamma.copy_(torch.randn_like(m.gamma) * 0.1)

    params = convert_convnext_state_dict(tmodel.state_dict(), depths=DEPTHS)
    fmodel = ConvNeXt(ConvNeXtConfig(depths=DEPTHS, dims=DIMS))

    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = fmodel.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for level, t in zip(["os4", "os8", "os16", "os32"], theirs):
        np.testing.assert_allclose(
            np.asarray(ours[level]),
            t.permute(0, 2, 3, 1).numpy(),
            atol=3e-5,
            err_msg=level,
        )


def test_shift_dwconv_matches_grouped_conv():
    """The shift-and-add depthwise formulation (SAI_DWCONV=shift,
    convnext.dwconv7_shift) computes the exact same block output as the
    grouped-conv lowering, in f32 and bf16."""
    from spatially_aware_ai_tpu.models.kmax.convnext import ConvNeXtBlock

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 13, 17, 8)).astype(np.float32)
    for dtype, atol in ((jnp.float32, 2e-6), (jnp.bfloat16, 3e-2)):
        ref_blk = ConvNeXtBlock(8, 1e-6, dtype, shift_dwconv=False)
        params = ref_blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ref = ref_blk.apply(params, jnp.asarray(x))
        shift_blk = ConvNeXtBlock(8, 1e-6, dtype, shift_dwconv=True)
        got = shift_blk.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=atol, err_msg=str(dtype),
        )


def test_shift_dwconv_env_gate(monkeypatch):
    """SAI_DWCONV=shift flips the default; explicit overrides win."""
    from spatially_aware_ai_tpu.models.kmax.convnext import use_shift_dwconv

    monkeypatch.delenv("SAI_DWCONV", raising=False)
    assert use_shift_dwconv() is False
    monkeypatch.setenv("SAI_DWCONV", "shift")
    assert use_shift_dwconv() is True
    assert use_shift_dwconv(False) is False
    monkeypatch.setenv("SAI_DWCONV", "xla")
    assert use_shift_dwconv() is False
    assert use_shift_dwconv(True) is True
