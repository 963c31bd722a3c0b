"""Deployment env hooks: the manager's default engines honor
SAI_CLIP_CHECKPOINT / SAI_KMAX_CHECKPOINT so a connected deployment loads
converted weights without code changes (docs/OPERATIONS.md §1)."""
import pytest

from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
)
from spatially_aware_ai_tpu.manager import InSituManager
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine


def test_manager_loads_kmax_checkpoint_from_env(monkeypatch, tmp_path):
    from spatially_aware_ai_tpu.models import kmax

    calls = {}

    def fake_from_checkpoint(path):
        calls["path"] = path
        return ColorSegmenter(SyntheticScene.demo_room())

    monkeypatch.setattr(
        kmax.KmaxSegmenter, "from_checkpoint",
        staticmethod(fake_from_checkpoint),
    )
    monkeypatch.setenv("SAI_KMAX_CHECKPOINT", "/weights/kmax.pkl")

    manager = InSituManager(
        scan_dir=str(tmp_path / "scans"),
        scan_name="demo",
        dataset="synthetic",
        output_dir=str(tmp_path / "out"),
        clip_engine=ClipEngine.tiny(),
        insitu_model=object(),  # never touched without a reconstruct
        auto_reconstruct=False,
    )
    assert calls["path"] == "/weights/kmax.pkl"
    assert isinstance(manager.seg_model, ColorSegmenter)


def test_manager_label_votes_from_env(monkeypatch, tmp_path):
    """SAI_LABEL_VOTES opts the server pipeline into proximity-weighted
    label voting (grid/fusion.py:label_vote_weights); the key lands in the
    manager config (and thus each version's config.yml)."""
    monkeypatch.setenv("SAI_LABEL_VOTES", "near_surface")
    manager = InSituManager(
        scan_dir=str(tmp_path / "scans"),
        scan_name="demo",
        dataset="synthetic",
        output_dir=str(tmp_path / "out"),
        clip_engine=ClipEngine.tiny(),
        seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        insitu_model=object(),
        auto_reconstruct=False,
    )
    assert manager.config.label_vote_mode == "near_surface"


def test_manager_integrator_and_sharding_from_env(monkeypatch, tmp_path):
    """SAI_INTEGRATOR / SAI_SHARD_VOXELS select the fusion integrator and
    multi-chip voxel sharding for every manager fusion path (scan rebuilds
    AND live sessions go through the shared _fusion_config)."""
    monkeypatch.setenv("SAI_INTEGRATOR", "brick")
    monkeypatch.setenv("SAI_SHARD_VOXELS", "1")
    manager = InSituManager(
        scan_dir=str(tmp_path / "scans"),
        scan_name="demo",
        dataset="synthetic",
        output_dir=str(tmp_path / "out"),
        clip_engine=ClipEngine.tiny(),
        seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        insitu_model=object(),
        auto_reconstruct=False,
    )
    fc = manager._fusion_config()
    assert fc.integrator == "brick"
    assert fc.shard_voxels is True
    # live sessions get the identical semantics plus the per-stream voxel
    # size override
    fc_live = manager._fusion_config(voxel_size=0.02)
    assert fc_live.integrator == "brick"
    assert fc_live.shard_voxels is True
    assert fc_live.voxel_size == 0.02

    monkeypatch.delenv("SAI_INTEGRATOR")
    monkeypatch.delenv("SAI_SHARD_VOXELS")
    manager2 = InSituManager(
        scan_dir=str(tmp_path / "scans"),
        scan_name="demo",
        dataset="synthetic",
        output_dir=str(tmp_path / "out"),
        clip_engine=ClipEngine.tiny(),
        seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        insitu_model=object(),
        auto_reconstruct=False,
    )
    fc2 = manager2._fusion_config()
    assert fc2.integrator is None  # pipeline auto
    assert fc2.shard_voxels is False


def test_kmax_from_checkpoint_roundtrip(tmp_path):
    """from_checkpoint loads a params pickle produced by the converter CLI
    and reproduces the same outputs."""
    import pickle

    import numpy as np

    from spatially_aware_ai_tpu.models.kmax.model import (
        KMAX_TINY_TEST,
        KmaxSegmenter,
    )

    seg = KmaxSegmenter.tiny(seed=3)
    p = tmp_path / "kmax.pkl"
    with open(p, "wb") as f:
        pickle.dump(seg.params, f)
    loaded = KmaxSegmenter.from_checkpoint(str(p), cfg=KMAX_TINY_TEST)

    img = np.random.RandomState(0).rand(40, 56, 3).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(seg.run_on_image(img)), np.asarray(loaded.run_on_image(img))
    )
