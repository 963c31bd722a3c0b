"""Live-session GRID checkpointing (manager.live_snapshot / /live_snapshot):
a post-crash live_resume restores the snapshotted grid and replays only the
staged frames beyond it — instant recovery for long streams, exact because
the accumulators are order-independent sums (ROADMAP "live-session
checkpointing of the GRID").
"""
import os

import numpy as np
import pytest

from test_live_scan import make_manager, _frames


@pytest.fixture(scope="module")
def manager(tmp_path_factory):
    return make_manager(tmp_path_factory.mktemp("live_snap_scene"))


def test_snapshot_requires_session(manager):
    with pytest.raises(ValueError, match="no live session"):
        manager.live_snapshot()


def test_snapshot_before_first_chunk_reports_no_grid(manager):
    manager.live_begin()
    try:
        out = manager.live_snapshot()
        assert out["snapshotted"] is False
    finally:
        manager.live_abort()


def test_snapshot_resume_is_exact_and_skips_replay(manager):
    """Push 5 frames (chunk=3: 3 integrated, 2 pending), snapshot, crash,
    resume. The resumed session must (a) report the snapshot prefix, (b)
    hold a grid binary-identical to an uninterrupted control session fed
    the same 5 frames, (c) finish the stream like nothing happened."""
    from spatially_aware_ai_tpu.manager.live import LiveScanSession

    rgb, depth, pose, K = _frames(8)
    manager.live_begin(voxel_size=0.1, margin_m=0.5)
    manager.live_push(rgb[:5], depth[:5], pose[:5], K[:5])
    assert manager._live.frames_integrated == 3  # one full chunk of 3

    out = manager.live_snapshot()
    assert out["snapshotted"] is True
    assert out["frames_in_snapshot"] == 3
    assert os.path.exists(out["path"])
    cfg = manager._live.cfg

    manager._live = None  # crash (disk survives)

    st = manager.live_resume()
    assert st["state"] == "live"
    assert st["snapshot_frames"] == 3
    assert st["resumed_frames"] == 5  # 3 restored + 2 replayed
    assert st["frames_integrated"] == 3
    assert st["frames_pending"] == 2

    # control: an uninterrupted session fed the same 5 frames
    control = LiveScanSession(
        manager.clip_model, manager.seg_model, cfg, margin_m=0.5
    )
    control.push(rgb[:5], depth[:5], pose[:5], K[:5])
    got, want = manager._live.grid, control.grid
    np.testing.assert_array_equal(
        np.asarray(got.tsdf_sum), np.asarray(want.tsdf_sum)
    )
    np.testing.assert_array_equal(np.asarray(got.w), np.asarray(want.w))
    np.testing.assert_array_equal(
        np.asarray(got.feat_sum), np.asarray(want.feat_sum)
    )
    np.testing.assert_array_equal(
        np.asarray(got.label_hist), np.asarray(want.label_hist)
    )

    # the stream continues normally and ends with all frames exactly once
    st = manager.live_push(rgb[5:8], depth[5:8], pose[5:8], K[5:8])
    assert st["frames_seen"] == 8
    out = manager.live_end()
    assert out["state"] == "done" and out["n_objects"] > 0

    from spatially_aware_ai_tpu.data.live import LiveScanDataset
    from spatially_aware_ai_tpu.manager.paths import get_path

    ds = LiveScanDataset(
        get_path(manager.config, out["version"], "scene_inputdir")
    )
    assert len(ds) == 8


def test_mismatched_or_inconsistent_snapshot_rejected(manager):
    """Validation: wrong voxel size or frames > staged -> full replay."""
    rgb, depth, pose, K = _frames(4)
    manager.live_begin(voxel_size=0.1)
    manager.live_push(rgb[:4], depth[:4], pose[:4], K[:4])
    assert manager.live_snapshot()["snapshotted"]
    sess = manager._live
    staging = sess.staging_dir
    fusion_cfg = sess.cfg

    ok = manager._load_live_snapshot(staging, fusion_cfg, total_frames=4)
    assert ok is not None

    # claims more frames than are staged -> rejected
    assert manager._load_live_snapshot(
        staging, fusion_cfg, total_frames=2
    ) is None

    # different voxel size -> rejected
    import dataclasses

    other = dataclasses.replace(fusion_cfg, voxel_size=0.07)
    assert manager._load_live_snapshot(staging, other, 4) is None

    # parseable but incomplete meta (version skew / hand edits) ->
    # rejected, never a KeyError that would brick live_resume
    import json

    meta = os.path.join(staging, "grid_snapshot.json")
    with open(meta) as f:
        full_meta = json.load(f)
    with open(meta, "w") as f:
        json.dump({"frames_integrated": full_meta["frames_integrated"]}, f)
    assert manager._load_live_snapshot(staging, fusion_cfg, 4) is None

    # torn meta -> rejected (json removed, npz present)
    os.remove(meta)
    assert manager._load_live_snapshot(staging, fusion_cfg, 4) is None

    manager.live_abort()
    assert not os.path.exists(staging)


def test_unreadable_part_disables_snapshot_fast_path(manager):
    """A torn part BEFORE the snapshot boundary shifts the good-part
    prefix under the snapshot's frame count; trusting it would silently
    drop later parts' frames. The resume must fall back to replaying the
    readable parts only (exact over what is still on disk)."""
    from spatially_aware_ai_tpu.manager.live import LiveScanSession

    rgb, depth, pose, K = _frames(9)
    # three pushes = three staged parts of 3 frames (chunk=3: each
    # integrates immediately); snapshot after part 1 covers 6 frames
    manager.live_begin(voxel_size=0.1, margin_m=0.5)
    manager.live_push(rgb[0:3], depth[0:3], pose[0:3], K[0:3])
    manager.live_push(rgb[3:6], depth[3:6], pose[3:6], K[3:6])
    assert manager.live_snapshot()["frames_in_snapshot"] == 6
    manager.live_push(rgb[6:9], depth[6:9], pose[6:9], K[6:9])
    cfg = manager._live.cfg
    staging = manager._live.staging_dir
    manager._live = None  # crash

    # corrupt part 0 (3 frames, inside the snapshot's prefix): good parts
    # now hold 6 frames, matching the snapshot count — the trap
    part0 = sorted(
        p for p in os.listdir(staging) if p.startswith("part_")
    )[0]
    with open(os.path.join(staging, part0), "wb") as f:
        f.write(b"torn")

    st = manager.live_resume()
    assert st.get("unreadable_parts") == 1
    assert "snapshot_frames" not in st  # fast path must be disabled
    assert st["resumed_frames"] == 6  # parts 1+2 replayed

    # exact over the readable frames: control session fed frames 3..9
    # with the same push granularity (lazy grid bounds derive from the
    # frames seen at allocation time, so pushes must mirror the parts)
    control = LiveScanSession(
        manager.clip_model, manager.seg_model, cfg, margin_m=0.5
    )
    control.push(rgb[3:6], depth[3:6], pose[3:6], K[3:6])
    control.push(rgb[6:9], depth[6:9], pose[6:9], K[6:9])
    got, want = manager._live.grid, control.grid
    np.testing.assert_array_equal(
        np.asarray(got.tsdf_sum), np.asarray(want.tsdf_sum)
    )
    np.testing.assert_array_equal(np.asarray(got.w), np.asarray(want.w))
    manager.live_abort()


def test_live_begin_clears_stale_snapshot(manager):
    rgb, depth, pose, K = _frames(4)
    manager.live_begin()
    manager.live_push(rgb[:4], depth[:4], pose[:4], K[:4])
    assert manager.live_snapshot()["snapshotted"]
    staging = manager._live.staging_dir
    manager._live = None  # crash
    st = manager.live_begin(discard_staged=True)
    assert st["state"] == "live"
    assert not os.path.exists(os.path.join(staging, "grid_snapshot.npz"))
    manager.live_abort()


def test_auto_snapshot_cadence(manager, monkeypatch):
    """SAI_LIVE_SNAPSHOT_S>0 makes the server checkpoint the grid on its
    own cadence (background executor; pushes never wait on the transfer).
    Resume then restores from the auto snapshot like a client-driven one."""
    monkeypatch.setenv("SAI_LIVE_SNAPSHOT_S", "0.01")
    rgb, depth, pose, K = _frames(6)
    manager.live_begin(voxel_size=0.1, margin_m=0.5)
    try:
        manager.live_push(rgb[:3], depth[:3], pose[:3], K[:3])
        assert manager._live.frames_integrated == 3
        fut = getattr(manager, "_auto_snap_future", None)
        assert fut is not None, "auto snapshot was not scheduled"
        fut.result(timeout=60)
        npz = os.path.join(manager._live.staging_dir, "grid_snapshot.npz")
        assert os.path.exists(npz)

        manager._live = None  # crash
        st = manager.live_resume()
        assert st["snapshot_frames"] == 3
        assert st["frames_integrated"] == 3
    finally:
        manager.live_abort()


def test_auto_snapshot_off_by_default(manager, monkeypatch):
    monkeypatch.delenv("SAI_LIVE_SNAPSHOT_S", raising=False)
    manager._auto_snap_future = None
    rgb, depth, pose, K = _frames(3)
    manager.live_begin(voxel_size=0.1, margin_m=0.5)
    try:
        manager.live_push(rgb, depth, pose, K)
        assert getattr(manager, "_auto_snap_future", None) is None
    finally:
        manager.live_abort()


def test_snapshot_and_preview_copy_grid_buffers(manager):
    """Donation-safety regression: all four integrators are jitted with
    donate_argnums=(0,), so the next push invalidates the buffers behind
    the session's current grid. Any grid handed out for reading OUTSIDE
    the session lock (snapshot serialization, preview meshing) must be a
    copy — on TPU a bare reference raises "Array has been deleted" mid
    device_get, and the auto-snapshot path would swallow that error and
    silently never checkpoint. CPU doesn't donate, so assert buffer
    independence directly."""
    import jax

    rgb, depth, pose, K = _frames(3)
    manager.live_begin(voxel_size=0.1, margin_m=0.5)
    try:
        manager.live_push(rgb, depth, pose, K)
        sess = manager._live
        assert sess.frames_integrated == 3

        state = sess.snapshot_state()
        assert state is not None
        live_leaves = jax.tree_util.tree_leaves(sess.grid)
        for a, b in zip(live_leaves,
                        jax.tree_util.tree_leaves(state["grid"])):
            assert a is not b, "snapshot must not alias the live grid"
        np.testing.assert_array_equal(
            np.asarray(state["grid"].tsdf_sum), np.asarray(sess.grid.tsdf_sum)
        )
        np.testing.assert_array_equal(
            np.asarray(state["grid"].feat_sum), np.asarray(sess.grid.feat_sum)
        )

        prev = sess.preview_grid()
        for a, b in zip(live_leaves, jax.tree_util.tree_leaves(prev)):
            assert a is not b, "preview must not alias the live grid"
    finally:
        manager.live_abort()


def test_auto_snapshot_failure_is_surfaced(manager, monkeypatch):
    """A failing auto-snapshot must not stay invisible: the cadence once
    silently ate the grid-donation race. live_status carries the latest
    failure, and a later success clears it."""
    monkeypatch.setenv("SAI_LIVE_SNAPSHOT_S", "0.01")
    rgb, depth, pose, K = _frames(3)
    manager.live_begin(voxel_size=0.1, margin_m=0.5)
    try:
        real = manager.live_snapshot
        calls = {"n": 0}

        def boom():
            calls["n"] += 1
            raise RuntimeError("disk on fire")

        manager.live_snapshot = boom
        manager.live_push(rgb, depth, pose, K)
        manager._auto_snap_future.result(timeout=60)
        assert calls["n"] == 1
        assert "disk on fire" in manager.live_status()["auto_snapshot_error"]

        # next successful cadence clears the error
        manager.live_snapshot = real
        manager._auto_snap_last = 0.0
        manager._maybe_auto_snapshot(manager._live)
        manager._auto_snap_future.result(timeout=60)
        assert "auto_snapshot_error" not in manager.live_status()
    finally:
        manager.live_snapshot = real
        manager._auto_snap_error = None
        manager.live_abort()
