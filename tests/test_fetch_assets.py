"""Hermetic tests for the conversion-day asset kit (cli/fetch_assets.py) and
its doctor integration. Downloads are exercised through file:// URLs — no
network. Reference context: the assets replace what the reference pulls in
implicitly via open_clip/detectron2 (clipfusion.py:769-781,
clip_seem_fusion.py:78-79)."""
import gzip
import hashlib
import json
import os

import pytest

from spatially_aware_ai_tpu.cli import fetch_assets as fa


@pytest.fixture
def fake_upstream(tmp_path, monkeypatch):
    """A local 'upstream': three asset files served via file:// URLs, with
    the module's manifest repointed at them (same pin semantics)."""
    up = tmp_path / "upstream"
    up.mkdir()
    bpe = up / "bpe_simple_vocab_16e6.txt.gz"
    bpe.write_bytes(gzip.compress(b"a b\nbpe merges fixture\n"))
    bpe_sha = hashlib.sha256(bpe.read_bytes()).hexdigest()

    clip_blob = b"open_clip checkpoint fixture bytes" * 100
    clip_sha = hashlib.sha256(clip_blob).hexdigest()
    clip = up / f"vit_b_32-quickgelu-laion400m_e32-{clip_sha[:8]}.pt"
    clip.write_bytes(clip_blob)

    kmax = up / "kmax_convnext_large.pth"
    kmax.write_bytes(b"kmax checkpoint fixture bytes" * 50)

    assets = {
        "bpe_vocab": {
            "filename": "bpe_simple_vocab_16e6.txt.gz",
            "url": bpe.as_uri(),
            "sha256": bpe_sha,
            "env": "SAI_BPE_VOCAB",
            "what": "test bpe",
        },
        "clip_checkpoint": {
            "filename": clip.name,
            "url": clip.as_uri(),
            "sha256_prefix": clip_sha[:8],
            "env": None,
            "what": "test clip ckpt",
        },
        "kmax_checkpoint": {
            "filename": "kmax_convnext_large.pth",
            "url": None,  # model-zoo asset: manual drop / --kmax-url
            "zoo": "https://example.invalid/zoo",
            "env": None,
            "what": "test kmax ckpt",
        },
    }
    monkeypatch.setattr(fa, "ASSETS", assets)
    dest = tmp_path / "assets"
    return {"dest": str(dest), "upstream": up, "bpe_sha": bpe_sha,
            "clip_sha": clip_sha, "kmax_path": kmax}


def test_check_on_empty_dir_reports_missing(fake_upstream):
    rc = fa.main(["--check", "--dest", fake_upstream["dest"]])
    assert rc == 0  # missing is not a failure for the offline report
    report = fa.check_assets(fake_upstream["dest"])
    assert all(r["status"] == "missing" for r in report.values())


def test_fetch_verify_and_lock(fake_upstream, capsys):
    dest = fake_upstream["dest"]
    # kmax has no URL -> fetch resolves the other two, reports kmax missing
    rc = fa.main(["--dest", dest])
    assert rc == 1
    out = capsys.readouterr().out
    assert "bpe_vocab: fetched + verified" in out
    assert "clip_checkpoint: fetched + verified" in out
    assert "model zoo" in out

    lock = json.load(open(os.path.join(dest, "assets.lock.json")))
    assert lock["bpe_vocab"]["sha256"] == fake_upstream["bpe_sha"]
    assert lock["clip_checkpoint"]["sha256"] == fake_upstream["clip_sha"]

    # supply kmax via --kmax-url (the documented escape hatch) -> all green
    rc = fa.main(["--dest", dest, "--kmax-url",
                  fake_upstream["kmax_path"].as_uri()])
    assert rc == 0
    assert "next steps" in capsys.readouterr().out
    report = fa.check_assets(dest)
    assert all(r["status"] == "ok" for r in report.values())


def test_tampered_asset_fails_until_trusted(fake_upstream, capsys):
    dest = fake_upstream["dest"]
    fa.main(["--dest", dest, "--kmax-url",
             fake_upstream["kmax_path"].as_uri()])
    # tamper with the pinned asset
    path = os.path.join(dest, "bpe_simple_vocab_16e6.txt.gz")
    with open(path, "ab") as f:
        f.write(b"corruption")
    rc = fa.main(["--check", "--dest", dest])
    assert rc == 1
    assert "sha256" in capsys.readouterr().out
    # a kmax re-hash (lockfile mismatch after tamper) is also caught
    kpath = os.path.join(dest, "kmax_convnext_large.pth")
    with open(kpath, "ab") as f:
        f.write(b"swap")
    report = fa.check_assets(dest)
    assert report["bpe_vocab"]["status"] == "mismatch"
    assert report["kmax_checkpoint"]["status"] == "mismatch"
    # --trust-new-hash is the explicit human override: it accepts both the
    # pin mismatch (upstream rotated the file) and the lockfile mismatch,
    # re-recording the new digests in the lock
    rc = fa.main(["--dest", dest, "--trust-new-hash"])
    assert rc == 0
    lock = json.load(open(os.path.join(dest, "assets.lock.json")))
    actual = hashlib.sha256(open(path, "rb").read()).hexdigest()
    assert lock["bpe_vocab"]["sha256"] == actual
    report = fa.check_assets(dest)
    assert report["kmax_checkpoint"]["status"] == "ok"


def test_partial_download_never_left_behind(fake_upstream, monkeypatch):
    """A download that dies mid-stream must not leave a plausible partial
    file at the final path (tmp + os.replace contract)."""
    dest = fake_upstream["dest"]
    os.makedirs(dest, exist_ok=True)

    def boom(url, out_path):
        d = os.path.dirname(out_path)
        with open(os.path.join(d, ".fetch.interrupted.tmp"), "wb") as f:
            f.write(b"partial")
        raise OSError("connection reset")

    monkeypatch.setattr(fa, "_download", boom)
    rc = fa.main(["--dest", dest, "--only", "bpe_vocab"])
    assert rc == 1
    assert not os.path.exists(
        os.path.join(dest, "bpe_simple_vocab_16e6.txt.gz")
    )


def test_doctor_assets_check(fake_upstream, monkeypatch):
    from spatially_aware_ai_tpu.cli.doctor import _check_assets

    monkeypatch.setenv("SAI_ASSET_DIR", fake_upstream["dest"])
    out = _check_assets()
    assert out["status"] == "warn"  # nothing fetched yet
    fa.main(["--dest", fake_upstream["dest"], "--kmax-url",
             fake_upstream["kmax_path"].as_uri()])
    out = _check_assets()
    assert out["status"] == "ok"
    # corrupt one -> doctor FAILs the preflight
    path = os.path.join(fake_upstream["dest"], "kmax_convnext_large.pth")
    with open(path, "ab") as f:
        f.write(b"x")
    out = _check_assets()
    assert out["status"] == "fail"


def test_real_manifest_shape():
    """The production manifest (not the fixture) stays well-formed: pinned
    full sha256 for the BPE table, open_clip's filename-prefix contract for
    the CLIP checkpoint, and an explicit zoo pointer for kMaX."""
    a = fa.ASSETS
    assert set(a) == {"bpe_vocab", "clip_checkpoint", "kmax_checkpoint"}
    assert len(a["bpe_vocab"]["sha256"]) == 64
    assert a["bpe_vocab"]["url"].endswith("bpe_simple_vocab_16e6.txt.gz")
    pfx = a["clip_checkpoint"]["sha256_prefix"]
    assert pfx in a["clip_checkpoint"]["filename"]
    assert a["kmax_checkpoint"]["url"] is None
    assert "kmax-deeplab" in a["kmax_checkpoint"]["zoo"]
