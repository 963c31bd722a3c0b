"""kMaX decoder conversion parity: a torch mirror of the full KMaxDeepLab
(in the converter's layout contract) must produce identical logits after
conversion — validates every tensor-layout transform a real checkpoint
conversion needs."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from spatially_aware_ai_tpu.models.kmax import KMaxDeepLab
from spatially_aware_ai_tpu.models.kmax.model import KMAX_TINY_TEST
from spatially_aware_ai_tpu.models.kmax.convert import convert_kmax_state_dict

from test_convnext_parity import TorchConvNeXt


class TorchMHA(tnn.Module):
    """flax MultiHeadDotProductAttention mirror with separate q/k/v/out."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        self.out = tnn.Linear(dim, dim)

    def forward(self, x):
        B, T, D = x.shape
        hd = D // self.heads

        def split(t):
            return t.view(B, T, self.heads, hd).transpose(1, 2)

        q, k, v = split(self.q(x)), split(self.k(x)), split(self.v(x))
        att = (q @ k.transpose(-1, -2)) / (hd ** 0.5)
        att = att.softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(B, T, D)
        return self.out(o)


class TorchKMaxBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.xattn_ln_q = tnn.LayerNorm(dim)
        self.xattn_q = tnn.Linear(dim, dim)
        self.xattn_k = tnn.Linear(dim, dim)
        self.xattn_v = tnn.Linear(dim, dim)
        self.xattn_proj = tnn.Linear(dim, dim)
        self.self_attn = TorchMHA(dim, heads)
        self.sa_ln = tnn.LayerNorm(dim)
        self.ffn_ln = tnn.LayerNorm(dim)
        self.ffn1 = tnn.Linear(dim, dim * 4)
        self.ffn2 = tnn.Linear(dim * 4, dim)

    def forward(self, centers, pixels):
        q = self.xattn_q(self.xattn_ln_q(centers))
        k = self.xattn_k(pixels)
        v = self.xattn_v(pixels)
        logits = torch.einsum("bnd,bpd->bnp", q, k)
        assign = TF.one_hot(
            logits.argmax(dim=1), centers.shape[1]
        ).permute(0, 2, 1).float()
        pooled = torch.einsum("bnp,bpd->bnd", assign, v)
        pooled = pooled / assign.sum(-1, keepdim=True).clamp_min(1.0)
        centers = centers + self.xattn_proj(pooled)
        centers = centers + self.self_attn(self.sa_ln(centers))
        h = self.ffn_ln(centers)
        centers = centers + self.ffn2(TF.gelu(self.ffn1(h)))
        return centers


class TorchPixelDecoder(tnn.Module):
    def __init__(self, dims, dec_dim, mask_dim):
        super().__init__()
        self.levels = ["os32", "os16", "os8", "os4"]
        in_dims = {"os4": dims[0], "os8": dims[1], "os16": dims[2],
                   "os32": dims[3]}
        for lv in self.levels:
            setattr(self, f"lat_{lv}", tnn.Linear(in_dims[lv], dec_dim))
            setattr(self, f"smooth_{lv}",
                    tnn.Conv2d(dec_dim, dec_dim, 3, padding=1))
            setattr(self, f"ln_{lv}", tnn.LayerNorm(dec_dim))
        self.mask_feat = tnn.Linear(dec_dim, mask_dim)

    def forward(self, feats):  # feats: dict of NHWC tensors
        outs = {}
        prev = None
        for lv in self.levels:
            lat = getattr(self, f"lat_{lv}")(feats[lv])
            if prev is not None:
                up = TF.interpolate(
                    prev.permute(0, 3, 1, 2), size=lat.shape[1:3],
                    mode="nearest",
                ).permute(0, 2, 3, 1)
                lat = lat + up
            lat = getattr(self, f"smooth_{lv}")(
                lat.permute(0, 3, 1, 2)
            ).permute(0, 2, 3, 1)
            lat = getattr(self, f"ln_{lv}")(lat)
            lat = TF.gelu(lat)
            outs[lv] = lat
            prev = lat
        return outs, self.mask_feat(outs["os4"])


class TorchKMax(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.backbone = TorchConvNeXt(cfg.backbone.depths,
                                      cfg.backbone.dims)
        self.pixel_decoder = TorchPixelDecoder(
            cfg.backbone.dims, cfg.dec_dim, cfg.mask_dim
        )
        self.cluster_centers = tnn.Parameter(
            torch.randn(cfg.num_queries, cfg.dec_dim)
        )
        n_blocks = sum(cfg.dec_blocks)
        self.blocks = tnn.ModuleList(
            TorchKMaxBlock(cfg.dec_dim, cfg.num_heads) for _ in range(n_blocks)
        )
        self.head_ln = tnn.LayerNorm(cfg.dec_dim)
        self.class_head = tnn.Linear(cfg.dec_dim, cfg.num_classes + 1)
        self.mask_head = tnn.Linear(cfg.dec_dim, cfg.mask_dim)

    def forward(self, images):  # NHWC
        fmaps = self.backbone(images.permute(0, 3, 1, 2))
        feats = {
            lv: f.permute(0, 2, 3, 1)
            for lv, f in zip(["os4", "os8", "os16", "os32"], fmaps)
        }
        dec, mask_feat = self.pixel_decoder(feats)
        B = images.shape[0]
        centers = self.cluster_centers[None].expand(B, -1, -1)
        i = 0
        for lv, n in zip(["os32", "os16", "os8"], self.cfg.dec_blocks):
            pixels = dec[lv].reshape(B, -1, self.cfg.dec_dim)
            for _ in range(n):
                centers = self.blocks[i](centers, pixels)
                i += 1
        h = self.head_ln(centers)
        cls = self.class_head(h)
        emb = self.mask_head(h)
        masks = torch.einsum("bhwd,bnd->bhwn", mask_feat, emb)
        return cls, masks

    def contract_state_dict(self):
        """Rename to the converter's layout contract."""
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("blocks.", "kmax_block")
            # kmax_block0.xattn... already matches after the replace
            sd[k] = v
        return sd


def test_kmax_decoder_conversion_parity():
    torch.manual_seed(0)
    cfg = KMAX_TINY_TEST
    tm = TorchKMax(cfg).eval()

    params = convert_kmax_state_dict(tm.contract_state_dict(), cfg)
    ours = KMaxDeepLab(cfg)

    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(
        np.float32
    )
    cls_j, masks_j = ours.apply(params, jnp.asarray(x))
    with torch.no_grad():
        cls_t, masks_t = tm(torch.from_numpy(x))

    np.testing.assert_allclose(
        np.asarray(cls_j), cls_t.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(masks_j), masks_t.numpy(), atol=2e-3
    )
