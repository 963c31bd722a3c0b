"""Conversion-day rehearsal (VERDICT r3 next #4): ONE chain proving the
whole real-weights path works before real checkpoints exist.

Generates official-format torch checkpoints (HF-named CLIP + detectron2-named
kMaX, tiny configs) and a real-format gzipped BPE merges table, then runs the
exact conversion-day sequence:

  torch .pth/.bin --cli.convert_clip/convert_kmax--> self-describing pickles
  --> cli.doctor preflight (weights section ok)
  --> InSituManager boots via SAI_CLIP_CHECKPOINT / SAI_KMAX_CHECKPOINT /
      SAI_BPE_VOCAB (the serve path, no engine injection)
  --> /text_query over the reconstructed scene
  --> evals.scannet.main scoring with the converted engine (env path).

Logit parity of the converted towers vs their torch sources is asserted along
the way, so a naming/layout drift in any converter fails HERE, not on
conversion day. Reference contract: clipfusion.py:769-781 (open_clip load),
handy_utils.py:29-35 (detectron2 load), clipfusion.py:772 (BPE vocab).
"""
import gzip
import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from spatially_aware_ai_tpu.cli import convert_clip, convert_kmax, doctor
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.models.kmax.model import KmaxSegmenter

# torch mirrors (official naming) from the converter parity suites
import test_kmax_convert as tkc


def _write_merges_gz(path):
    """Miniature bpe_simple_vocab_16e6.txt.gz in the real format: gzipped,
    version header line, space-separated merge pairs."""
    lines = [
        "#version: 0.2 (rehearsal miniature)",
        "t h", "th e</w>", "h e", "he l", "hel l", "hell o</w>",
        "r e", "re d</w>", "b o", "bo x</w>", "c h", "ch a", "cha i",
        "chai r</w>",
    ]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Run the full conversion chain once; yield paths + torch sources."""
    root = tmp_path_factory.mktemp("conversion_day")

    # --- official-format CLIP checkpoint (HF naming; the open_clip layout
    # is covered by test_clip_parity's inverse-mapping roundtrip) ---
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    hf_cfg = HFCLIPConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=77,
            vocab_size=49408, hidden_act="quick_gelu", eos_token_id=49407,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=16,
            hidden_act="quick_gelu",
        ),
        projection_dim=16,
    )
    torch.manual_seed(11)
    hf = HFCLIPModel(hf_cfg).eval()
    clip_pth = root / "open_clip_pytorch_model.bin"
    torch.save(hf.state_dict(), clip_pth)

    # --- official-format kMaX checkpoint (detectron2 naming) ---
    torch.manual_seed(12)
    gen = torch.Generator().manual_seed(13)
    d2 = tkc.D2KMax(tkc.KMAX_TINY_TEST).eval()
    tkc.randomize_bn_stats(d2, gen)
    kmax_pth = root / "kmax_convnext_large.pth"
    torch.save({"model": d2.state_dict()}, kmax_pth)

    # --- real-format BPE merges table ---
    bpe_gz = root / "bpe_simple_vocab_16e6.txt.gz"
    _write_merges_gz(bpe_gz)

    # --- conversion CLIs -> self-describing pickles ---
    clip_pkl = root / "clip_params.pkl"
    convert_clip.main([
        str(clip_pth), str(clip_pkl), "--layout", "hf",
        "--vision-heads", "4", "--text-heads", "4",
    ])
    kmax_pkl = root / "kmax_params.pkl"
    convert_kmax.main([str(kmax_pth), str(kmax_pkl), "--config", "tiny"])

    env = {
        "SAI_CLIP_CHECKPOINT": str(clip_pkl),
        "SAI_KMAX_CHECKPOINT": str(kmax_pkl),
        "SAI_BPE_VOCAB": str(bpe_gz),
    }
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        yield {"root": root, "hf": hf, "d2": d2, **env}
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_converted_clip_matches_torch(assets):
    """from_checkpoint with NO cfg (embedded config path) reproduces the
    HF tower's logits — proves the shape-inferred CLIPConfig is right."""
    engine = ClipEngine.from_checkpoint(assets["SAI_CLIP_CHECKPOINT"])
    assert engine.cfg.vision_layers == 2
    assert engine.cfg.image_size == 32
    assert engine.cfg.vision_heads == 4
    assert engine.tokenizer.has_standard_vocab

    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(engine.encode_image(jnp.asarray(imgs)))
    with torch.no_grad():
        theirs = assets["hf"].get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_converted_kmax_matches_torch(assets):
    """from_checkpoint with NO cfg (embedded config path) reproduces the
    detectron2 mirror's class/mask logits."""
    seg = KmaxSegmenter.from_checkpoint(assets["SAI_KMAX_CHECKPOINT"])
    assert seg.cfg.num_queries == tkc.KMAX_TINY_TEST.num_queries
    x = np.random.default_rng(5).normal(size=(1, 64, 64, 3)).astype(
        np.float32
    )
    cls_j, masks_j = seg.model.apply(seg.params, jnp.asarray(x))
    with torch.no_grad():
        cls_t, masks_t = assets["d2"](torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(masks_j), masks_t.numpy(), atol=2e-3
    )


def test_doctor_preflight_ok(assets, capsys):
    """doctor sees the converted weights + standard merges and reports ok."""
    doctor.main(["--json", "--no-device"])
    report = json.loads(capsys.readouterr().out)
    weights = report["checks"]["weights"]
    assert weights["status"] == "ok", weights
    assert "standard merges loaded" in weights["SAI_BPE_VOCAB"]


def test_server_boot_and_query_with_converted_weights(assets, tmp_path):
    """The serve path: InSituManager built WITHOUT engine injection picks up
    the env checkpoints, reconstructs, and answers /text_query."""
    import io
    from urllib.parse import urlencode

    from spatially_aware_ai_tpu.manager import InSituManager
    from spatially_aware_ai_tpu.server import create_app

    scan_dir = tmp_path / "scans"
    d = scan_dir / "demo_scene" / "v00"
    os.makedirs(d)
    with open(d / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 6, "width": 64, "height": 48}, f)

    manager = InSituManager(
        scan_dir=str(scan_dir),
        scan_name="demo_scene",
        dataset="synthetic",
        output_dir=str(tmp_path / "unity_output"),
        voxel_size=0.08,
        trunc_vox=2,
        clip_patch_size=32,
        clip_patch_stride=16,
        frame_chunk=3,
    )
    # env-path engines, not injected ones
    assert manager.clip_model.cfg.vision_width == 64
    assert manager.seg_model.cfg.num_queries == 16
    assert manager.scene_reconstructed

    app = create_app(manager)
    body = urlencode({"text_query": "show me the red box"}).encode()
    environ = {
        "REQUEST_METHOD": "POST", "PATH_INFO": "/text_query",
        "CONTENT_TYPE": "application/x-www-form-urlencoded",
        "CONTENT_LENGTH": str(len(body)), "wsgi.input": io.BytesIO(body),
        "QUERY_STRING": "",
    }
    status = {}
    chunks = app(environ, lambda s, h: status.update(code=int(s.split()[0])))
    mesh = json.loads(b"".join(chunks).decode())
    assert status["code"] == 200
    assert len(mesh["vertices"]) > 0
    assert len(mesh["colors"]) == len(mesh["vertices"])


def test_eval_main_with_converted_weights(assets, tmp_path):
    """evals.scannet.main scores with the env-checkpoint engine (the exact
    conversion-day command). Fixture features are the converted engine's own
    class text embeddings, so a faithful env-path load scores perfect top-1
    — any conversion/tokenizer drift between the two loads fails here."""
    import test_eval_mains as tem
    from spatially_aware_ai_tpu.evals import scannet as sn

    engine = ClipEngine.from_checkpoint(assets["SAI_CLIP_CHECKPOINT"])
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    os.makedirs(gt_root)
    os.makedirs(pred_root)
    rng = np.random.default_rng(0)
    tem._make_scannet_scene(gt_root, pred_root, "scene0000_00", engine, rng)

    stats = sn.main([str(pred_root), str(gt_root), "--classes", "20"])
    assert stats["macc_top1"] == pytest.approx(1.0)
    assert stats["miou"] == pytest.approx(1.0)
