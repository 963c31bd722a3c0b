"""Logit-level parity of our Flax CLIP vs transformers' torch CLIPModel with
randomly initialized weights, through the HF state-dict converter. This proves
the architecture + converter are correct, so a real open_clip / HF checkpoint
converts faithfully (no pretrained weights are downloadable in this sandbox).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from spatially_aware_ai_tpu.models.clip import (
    CLIP,
    CLIPConfig,
    convert_hf_state_dict,
)
from spatially_aware_ai_tpu.models.clip.tokenizer import (
    ClipTokenizer,
    SOT_ID,
    EOT_ID,
    CONTEXT_LENGTH,
)

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def models():
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    hf_cfg = HFCLIPConfig(
        text_config=dict(
            hidden_size=32,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=77,
            vocab_size=100,
            hidden_act="quick_gelu",
            eos_token_id=98,
        ),
        vision_config=dict(
            hidden_size=64,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
            hidden_act="quick_gelu",
        ),
        projection_dim=16,
    )
    torch.manual_seed(0)
    hf = HFCLIPModel(hf_cfg).eval()

    cfg = CLIPConfig(
        embed_dim=16,
        image_size=32,
        patch_size=16,
        vision_width=64,
        vision_layers=2,
        vision_heads=4,
        vocab_size=100,
        context_length=77,
        text_width=32,
        text_heads=4,
        text_layers=2,
        quick_gelu=True,
    )
    ours = CLIP(cfg)
    params = convert_hf_state_dict(
        hf.state_dict(), vision_layers=2, text_layers=2
    )
    return hf, ours, params


def test_image_tower_parity(models):
    hf, ours, params = models
    imgs = RNG.normal(size=(3, 32, 32, 3)).astype(np.float32)
    ours_feats = ours.apply(
        params, jnp.asarray(imgs), method=CLIP.encode_image
    )
    with torch.no_grad():
        hf_feats = hf.get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(np.asarray(ours_feats), hf_feats, atol=2e-5)


def test_text_tower_parity(models):
    hf, ours, params = models
    ids = RNG.integers(1, 90, size=(4, 77)).astype(np.int32)
    # single EOS (=98, max id) per sequence, padding after
    for i, pos in enumerate([5, 20, 76, 40]):
        ids[i, pos] = 98
        ids[i, pos + 1 :] = 0
    ours_feats = ours.apply(params, jnp.asarray(ids), method=CLIP.encode_text)
    with torch.no_grad():
        hf_feats = hf.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64))
        ).numpy()
    np.testing.assert_allclose(np.asarray(ours_feats), hf_feats, atol=2e-5)


def test_tokenizer_fallback_shapes():
    tok = ClipTokenizer()  # no vocab file -> byte-level fallback
    out = tok(["hello world", "a photo of a cat"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert (out[:, 0] == SOT_ID).all()
    # EOT is present and is the max id in each row (argmax pooling contract)
    for row in out:
        assert EOT_ID in row
        assert row.max() == EOT_ID
        eot_pos = int(np.argmax(row))
        assert row[eot_pos] == EOT_ID
        assert (row[eot_pos + 1 :] == 0).all()


def test_tokenizer_truncation():
    tok = ClipTokenizer()
    out = tok(["word " * 200])
    assert out.shape == (1, CONTEXT_LENGTH)
    assert out[0, -1] == EOT_ID


def test_tokenizer_with_merges(tmp_path):
    # tiny merges table exercising the BPE merge loop
    vocab_file = tmp_path / "bpe_vocab.txt"
    lines = ["#version: test"]
    lines.append("h e")
    lines.append("he l")
    lines.append("hel l")
    lines.append("hell o</w>")
    vocab_file.write_text("\n".join(lines) + "\n")
    tok = ClipTokenizer(str(vocab_file))
    assert tok.has_standard_vocab
    ids = tok.encode("hello")
    # fully merged into the single token "hello</w>"
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "hello</w>"


def test_open_clip_converter_roundtrip():
    """Build an open_clip-layout state dict from our own params via the
    inverse mapping, convert it back, and require exact equality — catches
    transpose/naming bugs in the open_clip path (the HF path is covered by
    the parity tests above)."""
    import jax
    from spatially_aware_ai_tpu.models.clip import (
        CLIP as OurCLIP,
        CLIPConfig as OurCfg,
        convert_open_clip_state_dict,
    )

    cfg = OurCfg(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=2, vision_heads=4, vocab_size=64, context_length=12,
        text_width=24, text_heads=4, text_layers=2,
    )
    model = OurCLIP(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 12), jnp.int32),
    )["params"]

    def block_to_sd(sd, prefix, blk):
        sd[f"{prefix}.ln_1.weight"] = np.asarray(blk["ln_1"]["scale"])
        sd[f"{prefix}.ln_1.bias"] = np.asarray(blk["ln_1"]["bias"])
        sd[f"{prefix}.attn.in_proj_weight"] = np.asarray(
            blk["attn"]["in_proj"]["kernel"]
        ).T
        sd[f"{prefix}.attn.in_proj_bias"] = np.asarray(
            blk["attn"]["in_proj"]["bias"]
        )
        sd[f"{prefix}.attn.out_proj.weight"] = np.asarray(
            blk["attn"]["out_proj"]["kernel"]
        ).T
        sd[f"{prefix}.attn.out_proj.bias"] = np.asarray(
            blk["attn"]["out_proj"]["bias"]
        )
        sd[f"{prefix}.ln_2.weight"] = np.asarray(blk["ln_2"]["scale"])
        sd[f"{prefix}.ln_2.bias"] = np.asarray(blk["ln_2"]["bias"])
        sd[f"{prefix}.mlp.c_fc.weight"] = np.asarray(
            blk["mlp"]["c_fc"]["kernel"]
        ).T
        sd[f"{prefix}.mlp.c_fc.bias"] = np.asarray(blk["mlp"]["c_fc"]["bias"])
        sd[f"{prefix}.mlp.c_proj.weight"] = np.asarray(
            blk["mlp"]["c_proj"]["kernel"]
        ).T
        sd[f"{prefix}.mlp.c_proj.bias"] = np.asarray(
            blk["mlp"]["c_proj"]["bias"]
        )

    v = params["visual"]
    t = params["text"]
    sd = {
        "visual.conv1.weight": np.asarray(v["conv1"]["kernel"]).transpose(
            3, 2, 0, 1
        ),
        "visual.class_embedding": np.asarray(v["class_embedding"]),
        "visual.positional_embedding": np.asarray(v["positional_embedding"]),
        "visual.ln_pre.weight": np.asarray(v["ln_pre"]["scale"]),
        "visual.ln_pre.bias": np.asarray(v["ln_pre"]["bias"]),
        "visual.ln_post.weight": np.asarray(v["ln_post"]["scale"]),
        "visual.ln_post.bias": np.asarray(v["ln_post"]["bias"]),
        "visual.proj": np.asarray(v["proj"]),
        "token_embedding.weight": np.asarray(t["token_embedding"]),
        "positional_embedding": np.asarray(t["positional_embedding"]),
        "ln_final.weight": np.asarray(t["ln_final"]["scale"]),
        "ln_final.bias": np.asarray(t["ln_final"]["bias"]),
        "text_projection": np.asarray(t["text_projection"]),
        "logit_scale": np.asarray(params["logit_scale"]),
    }
    for i in range(2):
        block_to_sd(sd, f"visual.transformer.resblocks.{i}",
                    v["transformer"][f"resblock_{i}"])
        block_to_sd(sd, f"transformer.resblocks.{i}",
                    t["transformer"][f"resblock_{i}"])

    converted = convert_open_clip_state_dict(sd, vision_layers=2,
                                             text_layers=2)["params"]

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(converted))
    # same structure
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=0,
            err_msg=str(path),
        )
