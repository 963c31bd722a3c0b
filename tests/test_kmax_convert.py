"""kMaX-DeepLab conversion parity: a torch mirror of the full model whose
state_dict uses the detectron2-style names documented in
models/kmax/convert.py must produce identical logits after
convert_kmax_checkpoint — validating every tensor-layout transform a real
`kmax_convnext_large.pth` conversion needs (reference handy_utils.py:29-45).
"""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF
import jax.numpy as jnp

from spatially_aware_ai_tpu.models.kmax import KMaxDeepLab
from spatially_aware_ai_tpu.models.kmax.model import KMAX_TINY_TEST
from spatially_aware_ai_tpu.models.kmax.convert import convert_kmax_checkpoint

from test_convnext_parity import TorchConvNeXt


def _gelu(x):
    return TF.gelu(x)


class ConvBN(tnn.Module):
    """conv + BatchNorm(eval) + act — 2d (NCHW) or 1d (B,C,N)."""

    def __init__(self, cin, cout, k=1, groups=1, dilation=1, bn=True,
                 act=None, dims=2):
        super().__init__()
        Conv = tnn.Conv2d if dims == 2 else tnn.Conv1d
        Norm = tnn.BatchNorm2d if dims == 2 else tnn.BatchNorm1d
        pad = dilation * (k - 1) // 2
        self.conv = Conv(cin, cout, k, padding=pad, groups=groups,
                         dilation=dilation, bias=not bn)
        self.norm = Norm(cout) if bn else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.act == "gelu":
            x = _gelu(x)
        return x


def randomize_bn_stats(model, gen):
    """Give every BatchNorm non-trivial running stats so the parity test
    actually exercises the frozen-BN conversion."""
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.2, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0, 0.2, generator=gen)


class AxialAttention(tnn.Module):
    def __init__(self, dim, heads, axis, span):
        super().__init__()
        self.dim, self.heads, self.axis, self.span = dim, heads, axis, span
        self._qkv_conv_bn = ConvBN(dim, 3 * dim, 1)
        self.rel_bias = tnn.Parameter(torch.zeros(heads, 2 * span - 1))
        self._out_bn = tnn.BatchNorm2d(dim)

    def forward(self, x):  # NCHW
        B, C, H, W = x.shape
        qkv = self._qkv_conv_bn(x)
        q, k, v = qkv.chunk(3, dim=1)
        hd = self.dim // self.heads
        L = H if self.axis == 1 else W

        def split(t):  # -> [B, h, H, W, hd]
            return t.view(B, self.heads, hd, H, W).permute(0, 1, 3, 4, 2)

        q, k, v = split(q), split(k), split(v)
        if self.axis == 1:  # attend over H -> [B, h, W, H, hd]
            q, k, v = (t.transpose(2, 3) for t in (q, k, v))
        logits = torch.einsum("bhoqd,bhokd->bhoqk", q, k) / math.sqrt(hd)
        idx = (torch.arange(L)[:, None] - torch.arange(L)[None, :]
               + self.span - 1)
        logits = logits + self.rel_bias[:, idx][None, :, None]
        attn = logits.softmax(-1)
        out = torch.einsum("bhoqk,bhokd->bhoqd", attn, v)
        if self.axis == 1:
            out = out.transpose(2, 3)
        out = out.permute(0, 1, 4, 2, 3).reshape(B, self.dim, H, W)
        return self._out_bn(out)


class AxialBlock(tnn.Module):
    def __init__(self, cin, dim, heads, span):
        super().__init__()
        mid = dim // 2
        self._conv1_bn_act = ConvBN(cin, mid, 1, act="gelu")
        self._attn_h = AxialAttention(mid, heads, 1, span)
        self._attn_w = AxialAttention(mid, heads, 2, span)
        self._conv3_bn = ConvBN(mid, dim, 1)
        self._shortcut = ConvBN(cin, dim, 1) if cin != dim else None

    def forward(self, x):
        h = self._conv1_bn_act(x)
        h = self._attn_h(h)
        h = self._attn_w(h)
        h = _gelu(h)
        h = self._conv3_bn(h)
        if self._shortcut is not None:
            x = self._shortcut(x)
        return _gelu(x + h)


class BottleneckBlock(tnn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        mid = dim // 2
        self._conv1_bn_act = ConvBN(cin, mid, 1, act="gelu")
        self._conv2_bn_act = ConvBN(mid, mid, 3, act="gelu")
        self._conv3_bn = ConvBN(mid, dim, 1)
        self._shortcut = ConvBN(cin, dim, 1) if cin != dim else None

    def forward(self, x):
        h = self._conv3_bn(self._conv2_bn_act(self._conv1_bn_act(x)))
        if self._shortcut is not None:
            x = self._shortcut(x)
        return _gelu(x + h)


class ASPP(tnn.Module):
    def __init__(self, cin, dim, rates):
        super().__init__()
        self._conv0 = ConvBN(cin, dim, 1, act="gelu")
        for i, r in enumerate(rates):
            setattr(self, f"_conv{i + 1}",
                    ConvBN(cin, dim, 3, dilation=r, act="gelu"))
        self.n_rates = len(rates)
        self._pool_conv = ConvBN(cin, dim, 1, act="gelu")
        self._proj_conv_bn_act = ConvBN(dim * (2 + len(rates)), dim, 1,
                                        act="gelu")

    def forward(self, x):
        branches = [self._conv0(x)]
        for i in range(self.n_rates):
            branches.append(getattr(self, f"_conv{i + 1}")(x))
        pooled = self._pool_conv(x.mean(dim=(2, 3), keepdim=True))
        pooled = pooled.expand(-1, -1, x.shape[2], x.shape[3])
        return self._proj_conv_bn_act(torch.cat(branches + [pooled], dim=1))


class ResizedFuse(tnn.Module):
    def __init__(self, clo, chi, dim):
        super().__init__()
        self._lowres_conv_bn = ConvBN(clo, dim, 1)
        self._highres_conv_bn = ConvBN(chi, dim, 1)

    def forward(self, lo, hi):
        lo = self._lowres_conv_bn(lo)
        hi = self._highres_conv_bn(hi)
        lo = TF.interpolate(lo, size=hi.shape[2:], mode="bilinear",
                            align_corners=False)
        return _gelu(lo + hi)


class PixelDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        bdims = cfg.backbone.dims  # (os4, os8, os16, os32)
        in_dims = [bdims[3], bdims[2], bdims[1], bdims[0]]  # os32..os4
        self._in_norms = tnn.ModuleList(
            tnn.LayerNorm(d, eps=1e-6) for d in in_dims
        )
        self._aspp = ASPP(bdims[3], cfg.pd_dims[0], cfg.aspp_rates)
        stages = []
        for s in range(4):
            cin = cfg.pd_dims[s]
            blocks = []
            for _ in range(cfg.pd_blocks[s]):
                if s < 2:
                    blocks.append(AxialBlock(cin, cfg.pd_dims[s],
                                             cfg.num_heads, cfg.axial_span))
                else:
                    blocks.append(BottleneckBlock(cin, cfg.pd_dims[s]))
                cin = cfg.pd_dims[s]
            stages.append(tnn.ModuleList(blocks))
        self._stages = tnn.ModuleList(stages)
        self._resized_fuses = tnn.ModuleList([
            ResizedFuse(cfg.pd_dims[0], in_dims[1], cfg.pd_dims[1]),
            ResizedFuse(cfg.pd_dims[1], in_dims[2], cfg.pd_dims[2]),
            ResizedFuse(cfg.pd_dims[2], in_dims[3], cfg.pd_dims[3]),
        ])

    def forward(self, feats):  # dict os4..os32, NCHW
        order = ["os32", "os16", "os8", "os4"]
        normed = {}
        for i, lv in enumerate(order):
            x = feats[lv].permute(0, 2, 3, 1)
            x = self._in_norms[i](x)
            normed[lv] = x.permute(0, 3, 1, 2)
        outs = {}
        x = self._aspp(normed["os32"])
        for blk in self._stages[0]:
            x = blk(x)
        outs["os32"] = x
        for si, lv in enumerate(["os16", "os8", "os4"], start=1):
            x = self._resized_fuses[si - 1](x, normed[lv])
            for blk in self._stages[si]:
                x = blk(x)
            outs[lv] = x
        return outs


class Predictor(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        D, M = cfg.dec_dim, cfg.mask_dim
        self._pixel_space_head_conv0bnact = ConvBN(D, D, 5, groups=D,
                                                   act="gelu")
        self._pixel_space_head_conv1bnact = ConvBN(D, D, 1, act="gelu")
        self._pixel_space_head_last_convbn = ConvBN(D, M, 1)
        self._transformer_mask_head = ConvBN(D, M, 1, dims=1)
        self._transformer_class_head = tnn.Conv1d(D, cfg.num_classes + 1, 1)
        self._pixel_space_mask_batch_norm = tnn.BatchNorm2d(1)

    def pixel_features(self, pixel):  # NCHW -> NCHW, L2-normalized over C
        h = self._pixel_space_head_conv0bnact(pixel)
        h = self._pixel_space_head_conv1bnact(h)
        h = self._pixel_space_head_last_convbn(h)
        return h / h.norm(dim=1, keepdim=True).clamp_min(1e-6)

    def mask_logits(self, mask_emb, pixel_norm):
        # mask_emb [B, D, N]; pixel_norm [B, M, H, W]
        m = self._transformer_mask_head(mask_emb)
        m = m / m.norm(dim=1, keepdim=True).clamp_min(1e-6)
        logits = torch.einsum("bmhw,bmn->bnhw", pixel_norm, m)
        B, N, H, W = logits.shape
        return self._pixel_space_mask_batch_norm(
            logits.reshape(B * N, 1, H, W)
        ).reshape(B, N, H, W)

    def class_logits(self, class_emb):
        return self._transformer_class_head(class_emb)


class KMaxLayer(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        D = cfg.dec_dim
        self.heads = cfg.num_heads
        self._pixel_v_conv_bn = ConvBN(D, D, 1)
        self._kmeans_query_conv3_bn = ConvBN(D, D, 1, dims=1)
        self._query_qkv_conv_bn = ConvBN(D, 3 * D, 1, dims=1)
        self._query_self_attention_out_conv_bn = ConvBN(D, D, 1, dims=1)
        self._query_ffn_conv1_bn_act = ConvBN(D, 2 * D, 1, dims=1, act="gelu")
        self._query_ffn_conv2_bn = ConvBN(2 * D, D, 1, dims=1)

    def forward(self, query, pixel, mask_logits):
        # query [B, D, N]; pixel [B, D, H, W]; mask_logits [B, N, H, W]
        B, D, N = query.shape
        v = self._pixel_v_conv_bn(pixel).flatten(2)  # [B, D, P]
        logits = mask_logits.detach().flatten(2)     # [B, N, P]
        assign = TF.one_hot(logits.argmax(dim=1), N).float()  # [B, P, N]
        pooled = torch.einsum("bpn,bdp->bdn", assign, v)
        query = query + self._kmeans_query_conv3_bn(pooled)

        qkv = self._query_qkv_conv_bn(query)  # [B, 3D, N]
        q, k, v2 = qkv.chunk(3, dim=1)
        hd = D // self.heads

        def split(t):  # [B, D, N] -> [B, h, N, hd]
            return t.view(B, self.heads, hd, N).permute(0, 1, 3, 2)

        att = torch.einsum(
            "bhnd,bhmd->bhnm", split(q), split(k)
        ) / math.sqrt(hd)
        sa = torch.einsum("bhnm,bhmd->bhnd", att.softmax(-1), split(v2))
        sa = sa.permute(0, 1, 3, 2).reshape(B, D, N)
        query = query + self._query_self_attention_out_conv_bn(sa)

        h = self._query_ffn_conv2_bn(self._query_ffn_conv1_bn_act(query))
        return _gelu(query + h)


class TransformerDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        D = cfg.dec_dim
        self.cfg = cfg
        self._cluster_centers = tnn.Embedding(cfg.num_queries, D)
        self._class_embedding_projection = ConvBN(D, D, 1, dims=1, act="gelu")
        self._mask_embedding_projection = ConvBN(D, D, 1, dims=1, act="gelu")
        self._pixel_space_projections = tnn.ModuleList(
            ConvBN(cfg.pd_dims[i], D, 1, act="gelu") for i in range(3)
        )
        self._panoptic_feature_projection = ConvBN(cfg.pd_dims[3], D, 1,
                                                   act="gelu")
        self._kmax_transformer_layers = tnn.ModuleList(
            KMaxLayer(cfg) for _ in range(sum(cfg.dec_blocks))
        )


class SemSegHead(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.pixel_decoder = PixelDecoder(cfg)
        self.predictor = Predictor(cfg)
        self.transformer_decoder = TransformerDecoder(cfg)


class D2KMax(tnn.Module):
    """Torch mirror of KMaxDeepLab with detectron2-contract state_dict keys."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.backbone = TorchConvNeXt(cfg.backbone.depths, cfg.backbone.dims)
        self.sem_seg_head = SemSegHead(cfg)

    def forward(self, images):  # NHWC in, like the flax model
        cfg = self.cfg
        fmaps = self.backbone(images.permute(0, 3, 1, 2))
        feats = dict(zip(["os4", "os8", "os16", "os32"], fmaps))
        dec = self.sem_seg_head.pixel_decoder(feats)
        td = self.sem_seg_head.transformer_decoder
        pred = self.sem_seg_head.predictor

        B = images.shape[0]
        query = td._cluster_centers.weight.T[None].expand(B, -1, -1)  # B,D,N

        i = 0
        for li, (lv, n) in enumerate(zip(["os32", "os16", "os8"],
                                         cfg.dec_blocks)):
            pixel_space = td._pixel_space_projections[li](dec[lv])
            for _ in range(n):
                pnorm = pred.pixel_features(pixel_space)
                mlog = pred.mask_logits(
                    td._mask_embedding_projection(query), pnorm
                )
                query = td._kmax_transformer_layers[i](
                    query, pixel_space, mlog
                )
                i += 1

        panoptic = td._panoptic_feature_projection(dec["os4"])
        pnorm = pred.pixel_features(panoptic)
        mask_logits = pred.mask_logits(
            td._mask_embedding_projection(query), pnorm
        )
        class_logits = pred.class_logits(
            td._class_embedding_projection(query)
        )
        # to the flax layout: cls [B, N, C+1]; masks [B, H, W, N]
        return class_logits.permute(0, 2, 1), mask_logits.permute(0, 2, 3, 1)


def test_kmax_detectron2_conversion_parity():
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    cfg = KMAX_TINY_TEST
    tm = D2KMax(cfg).eval()
    randomize_bn_stats(tm, gen)

    variables = convert_kmax_checkpoint(
        {"model": tm.state_dict()}, cfg
    )
    ours = KMaxDeepLab(cfg)

    x = np.random.default_rng(0).normal(size=(2, 64, 96, 3)).astype(
        np.float32
    )
    cls_j, masks_j = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        cls_t, masks_t = tm(torch.from_numpy(x))

    np.testing.assert_allclose(
        np.asarray(cls_j), cls_t.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(masks_j), masks_t.numpy(), atol=2e-3
    )


def test_convert_kmax_cli_roundtrip(tmp_path, capsys):
    """Full conversion-day rehearsal: torch mirror -> .pth -> CLI convert ->
    KmaxSegmenter.from_checkpoint -> forward parity; --list-missing reports
    zero unconsumed keys (the converter covers the whole checkpoint)."""
    from spatially_aware_ai_tpu.cli import convert_kmax
    from spatially_aware_ai_tpu.models.kmax.model import KmaxSegmenter

    torch.manual_seed(2)
    gen = torch.Generator().manual_seed(3)
    cfg = KMAX_TINY_TEST
    tm = D2KMax(cfg).eval()
    randomize_bn_stats(tm, gen)

    ckpt = tmp_path / "kmax_tiny.pth"
    torch.save({"model": tm.state_dict()}, ckpt)
    out = tmp_path / "kmax_params.pkl"
    convert_kmax.main([str(ckpt), str(out), "--config", "tiny",
                       "--list-missing"])
    printed = capsys.readouterr().out
    assert "unconsumed" not in printed, printed
    seg = KmaxSegmenter.from_checkpoint(str(out), cfg=cfg)
    x = np.random.default_rng(4).normal(size=(1, 64, 64, 3)).astype(
        np.float32
    )
    cls_j, masks_j = seg.model.apply(seg.params, jnp.asarray(x))
    with torch.no_grad():
        cls_t, masks_t = tm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), atol=2e-3)
