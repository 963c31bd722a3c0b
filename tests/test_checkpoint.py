"""Mid-scan checkpoint/resume: interrupting fusion and resuming must produce
the exact same grid as an uninterrupted run."""
import os

import numpy as np
import pytest

from spatially_aware_ai_tpu.data import SyntheticSceneDataset
from spatially_aware_ai_tpu.grid.checkpoint import load_grid, save_grid
from spatially_aware_ai_tpu.grid.voxel_grid import create_grid
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.pipeline import FusionConfig, fuse_scan


def test_grid_roundtrip(tmp_path):
    grid = create_grid(
        np.zeros(3, np.float32), 0.05, (6, 5, 4), 0.1, feature_dim=8,
        with_labels=True,
    )
    grid = grid.replace(tsdf_sum=grid.tsdf_sum + 1.5)
    p = str(tmp_path / "ck.npz")
    save_grid(p, grid, frames_done=12)
    g2, frames_done = load_grid(p)
    assert frames_done == 12
    assert g2.nvox_tuple == grid.nvox_tuple
    assert g2.voxel_size == pytest.approx(grid.voxel_size)
    np.testing.assert_allclose(np.asarray(g2.tsdf_sum), 1.5)
    assert g2.label_hist is not None


def test_resume_equals_uninterrupted(tmp_path):
    ds = SyntheticSceneDataset(num_frames=8, width=48, height=36)
    engine = ClipEngine.tiny()
    ck = str(tmp_path / "scan_ck.npz")
    base = dict(
        voxel_size=0.08, trunc_vox=2.0, clip_patch_size=24,
        clip_patch_stride=12, frame_chunk=2,
    )

    # uninterrupted
    full = fuse_scan(ds, engine, FusionConfig(**base))

    # crash mid-scan: the progress hook raises after the 3rd chunk's
    # integration message (checkpoints for chunks 1-2 are already on disk)
    class Crash(RuntimeError):
        pass

    state = {"integrations": 0}

    def crashing_progress(msg):
        if msg.startswith("integrated"):
            state["integrations"] += 1
            if state["integrations"] == 3:
                raise Crash()

    cfg_ck = FusionConfig(**base, checkpoint_path=ck,
                          checkpoint_every_chunks=1)
    with pytest.raises(Crash):
        fuse_scan(ds, engine, cfg_ck, progress=crashing_progress)
    assert os.path.exists(ck)
    _, frames_done = load_grid(ck)
    assert frames_done == 4  # two 2-frame chunks committed

    # resume and finish; result must match the uninterrupted run
    resumed = fuse_scan(ds, engine, cfg_ck)
    assert not os.path.exists(ck)  # cleaned up on completion
    for k in full.values:
        np.testing.assert_allclose(
            resumed.values[k], full.values[k], atol=1e-5, err_msg=k
        )
