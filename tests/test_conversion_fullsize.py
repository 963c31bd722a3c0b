"""FULL-SIZE conversion rehearsal (VERDICT r4 next #5).

The tiny-config rehearsal (tests/test_conversion_rehearsal.py) proves the
conversion-day CHAIN; this module proves it at the REAL shapes — official-
layout random checkpoints with ViT-B/32 full dims (vision 768x12L/12H,
text 512x12L/8H, patch 32, image 224, vocab 49408) and ConvNeXt-L full
dims (192/384/768/1536 x depths 3/3/27/3) plus a real-format gzipped BPE
merges table at the STANDARD merge count — so shape- or naming-drift that
tiny configs cannot catch (per-stage dims, head counts, the 49408-token
embedding, full-depth parameter trees) is rehearsed before conversion day.

Reference contracts: clipfusion.py:769-781 (open_clip ViT-B-32-quickgelu
load), handy_utils.py:29-35 (detectron2 ConvNeXt-L load), clipfusion.py:772
(bpe_simple_vocab_16e6.txt.gz).

Marked heavy: builds ~380M torch params and converts them on the 1-vCPU
host (~minutes, well under the heavy-tier budget).
"""
import gzip
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from spatially_aware_ai_tpu.cli import convert_clip, convert_kmax
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.models.clip.tokenizer import ClipTokenizer
from spatially_aware_ai_tpu.models.kmax.model import (
    KMAX_CONVNEXT_LARGE,
    KmaxSegmenter,
)

import test_kmax_convert as tkc

# the standard table's merge count: vocab 49408 = 256 bytes + 256 </w>
# + N merges + 2 specials
STANDARD_MERGES = 49408 - 256 - 256 - 2


def _write_fullsize_merges_gz(path):
    """Real-format gzipped merges table at the standard merge COUNT:
    version header + 48894 space-separated pairs over the byte vocabulary
    (synthetic pairs — the real table is egress-blocked — but the loader
    path, the 49408 vocab size, and the rank table are full-scale)."""
    from spatially_aware_ai_tpu.models.clip.tokenizer import bytes_to_unicode

    syms = list(bytes_to_unicode().values())
    lines = ["#version: 0.2 (full-size rehearsal, synthetic pairs)"]
    n = 0
    for a in syms:
        for b in syms:
            if n >= STANDARD_MERGES:
                break
            # alternate plain and end-of-word second tokens like the real
            # table does
            lines.append(f"{a} {b}</w>" if n % 2 else f"{a} {b}")
            n += 1
        if n >= STANDARD_MERGES:
            break
    assert n == STANDARD_MERGES
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("conversion_fullsize")

    # --- ViT-B/32 at REAL dims: transformers' CLIPConfig defaults ARE
    # ViT-B/32 (vision 768/12L/12H patch32 image224; text 512/12L/8H,
    # vocab 49408); pin quick_gelu (the -quickgelu variant the reference
    # loads) and the standard EOT id for pooling parity ---
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    hf_cfg = HFCLIPConfig(
        text_config=dict(hidden_act="quick_gelu", eos_token_id=49407),
        vision_config=dict(hidden_act="quick_gelu"),
    )
    torch.manual_seed(21)
    hf = HFCLIPModel(hf_cfg).eval()
    clip_pth = root / "open_clip_pytorch_model.bin"
    torch.save(hf.state_dict(), clip_pth)

    # --- ConvNeXt-L kMaX at REAL dims (the production default config) ---
    torch.manual_seed(22)
    gen = torch.Generator().manual_seed(23)
    d2 = tkc.D2KMax(KMAX_CONVNEXT_LARGE).eval()
    tkc.randomize_bn_stats(d2, gen)
    kmax_pth = root / "kmax_convnext_large.pth"
    torch.save({"model": d2.state_dict()}, kmax_pth)

    bpe_gz = root / "bpe_simple_vocab_16e6.txt.gz"
    _write_fullsize_merges_gz(bpe_gz)

    clip_pkl = root / "clip_params.pkl"
    convert_clip.main([
        str(clip_pth), str(clip_pkl), "--layout", "hf",
        "--vision-heads", "12", "--text-heads", "8",
    ])
    kmax_pkl = root / "kmax_params.pkl"
    convert_kmax.main([str(kmax_pth), str(kmax_pkl), "--config", "large"])

    env = {"SAI_BPE_VOCAB": str(bpe_gz)}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        yield {
            "root": root, "hf": hf, "d2": d2,
            "clip_pkl": str(clip_pkl), "kmax_pkl": str(kmax_pkl),
            "bpe_gz": str(bpe_gz),
        }
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_fullsize_tokenizer_standard_vocab(assets):
    tok = ClipTokenizer(assets["bpe_gz"])
    assert tok.has_standard_vocab
    assert len(tok.bpe_ranks) == STANDARD_MERGES
    assert len(tok.decoder) == 49408
    ids = tok(["a red suitcase on the floor"])
    assert np.asarray(ids).shape == (1, 77)


def test_fullsize_clip_image_parity(assets):
    """Converted ViT-B/32 reproduces the HF tower's image features at the
    real 224x224 operating point."""
    engine = ClipEngine.from_checkpoint(assets["clip_pkl"])
    c = engine.cfg
    assert (c.vision_width, c.vision_layers, c.vision_heads) == (768, 12, 12)
    assert (c.text_width, c.text_layers) == (512, 12)
    assert c.image_size == 224 and c.patch_size == 32
    assert c.embed_dim == 512 and c.vocab_size == 49408

    rng = np.random.default_rng(7)
    imgs = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(engine.encode_image(jnp.asarray(imgs)))
    with torch.no_grad():
        theirs = assets["hf"].get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_fullsize_clip_text_parity(assets):
    """Same token ids through both full-depth text towers (ids from the
    full-size merges table; EOT pooling at the standard position)."""
    engine = ClipEngine.from_checkpoint(assets["clip_pkl"])
    assert engine.tokenizer.has_standard_vocab
    texts = ["a photo of a chair", "hello"]
    ids = np.asarray(engine.tokenizer(texts))
    ours = np.asarray(engine._encode_text(engine.params, jnp.asarray(ids)))
    with torch.no_grad():
        theirs = assets["hf"].get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_fullsize_kmax_parity(assets):
    """Converted ConvNeXt-L kMaX reproduces the detectron2 mirror's class
    and mask logits at full channel dims (spatial kept small — channel
    dims, not resolution, are what tiny configs couldn't rehearse)."""
    seg = KmaxSegmenter.from_checkpoint(assets["kmax_pkl"])
    assert seg.cfg.backbone.dims == (192, 384, 768, 1536)
    assert seg.cfg.backbone.depths == (3, 3, 27, 3)
    assert seg.cfg.num_queries == KMAX_CONVNEXT_LARGE.num_queries

    x = np.random.default_rng(9).normal(size=(1, 64, 64, 3)).astype(
        np.float32
    )
    cls_j, masks_j = seg.model.apply(seg.params, jnp.asarray(x))
    with torch.no_grad():
        cls_t, masks_t = assets["d2"](torch.from_numpy(x))
    # full-depth f32 towers: tolerances scale with the 27-block stage
    np.testing.assert_allclose(
        np.asarray(cls_j), cls_t.numpy(), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(masks_j), masks_t.numpy(), atol=5e-3
    )
