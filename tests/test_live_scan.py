"""Live streaming scan ingestion (manager/live.py) — beyond-parity
capability: frames integrate the moment they arrive (the sum-form grid is
order-independent), the scene previews mid-stream, and live_end turns the
stream into a regular scan version that reprocesses like a disk scan."""
import json
import os

import numpy as np
import pytest

from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
    SyntheticSceneDataset,
)
from spatially_aware_ai_tpu.manager import InSituManager
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine


def make_manager(root, frame_chunk=3):
    d = root / "scans" / "demo" / "v00"
    os.makedirs(d, exist_ok=True)
    with open(d / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 6, "width": 64, "height": 48}, f)
    return InSituManager(
        scan_dir=str(root / "scans"),
        scan_name="demo",
        dataset="synthetic",
        output_dir=str(root / "out"),
        voxel_size=0.08,
        trunc_vox=2,
        clip_patch_size=32,
        clip_patch_stride=16,
        clip_engine=ClipEngine.tiny(),
        seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        frame_chunk=frame_chunk,
    )


@pytest.fixture(scope="module")
def manager(tmp_path_factory):
    return make_manager(tmp_path_factory.mktemp("live_scene"))


def _frames(n=8):
    ds = SyntheticSceneDataset(num_frames=n, width=64, height=48)
    stack = ds.stacked(range(n))
    return stack["rgb"], stack["depth"], stack["pose"], stack["K"]


def test_live_push_without_begin_raises(manager):
    with pytest.raises(ValueError):
        manager.live_push(*[x[:1] for x in _frames(1)])


def test_live_scan_full_lifecycle(manager, tmp_path):
    rgb, depth, pose, K = _frames(8)
    before_ver = manager.curr_ver

    st = manager.live_begin()
    assert st["state"] == "live" and st["frames_seen"] == 0
    # double-begin reports the active session instead of clobbering it
    st2 = manager.live_begin()
    assert st2.get("already_live")

    # push one frame: buffered, no grid yet (chunk = 3)
    st = manager.live_push(rgb[0], depth[0], pose[0], K[0])
    assert st["frames_pending"] == 1 and not st["grid_allocated"]
    assert manager.live_preview()["mesh"] is None

    # push a batch crossing the chunk boundary: grid allocates + integrates
    st = manager.live_push(rgb[1:5], depth[1:5], pose[1:5], K[1:5])
    assert st["grid_allocated"]
    assert st["frames_integrated"] == 3
    assert st["frames_pending"] == 2
    pv = manager.live_preview()
    assert pv["mesh"] is not None and len(pv["mesh"]["vertices"]) > 0

    # quantized inputs are accepted too (u8 rgb / u16 mm depth)
    rgb_u8 = np.clip(np.rint(rgb[5:] * 255), 0, 255).astype(np.uint8)
    d_u16 = np.clip(np.rint(depth[5:] * 1000), 0, 65535).astype(np.uint16)
    st = manager.live_push(rgb_u8, d_u16, pose[5:], K[5:])
    assert st["frames_seen"] == 8
    assert st["clipped_fraction"] < 0.05  # margin covers the room

    out = manager.live_end()
    assert out["state"] == "done"
    ver = out["version"]
    assert ver == before_ver + 1
    assert out["n_objects"] > 0 and out["n_vertices"] > 0

    # the live scan became the installed, queryable version
    assert manager.curr_ver == ver
    assert manager.scene_knowledge["scan_version"] == ver
    mesh = manager.clip_text_query("the table")
    assert mesh is not None and len(mesh["vertices"]) > 0

    # frames persisted as a regular version: the live dataset loads them
    from spatially_aware_ai_tpu.data.live import LiveScanDataset
    from spatially_aware_ai_tpu.manager.paths import get_path

    inputdir = get_path(manager.config, ver, "scene_inputdir")
    ds = LiveScanDataset(inputdir)
    assert len(ds) == 8
    f = ds[0]
    assert f.rgb.dtype == np.float32 and f.rgb.max() <= 1.0
    np.testing.assert_allclose(f.pose, pose[0], atol=1e-6)
    u8 = ds.stacked_u8([0, 1])
    assert u8["rgb"].dtype == np.uint8 and u8["depth"].dtype == np.uint16

    # session is closed
    with pytest.raises(ValueError):
        manager.live_push(rgb[0], depth[0], pose[0], K[0])
    assert manager.live_status()["state"] == "idle"


def test_live_version_reprocesses_like_disk_scan(manager):
    """The persisted live version rebuilds through the STANDARD path
    (autodetected live_frames.npz), producing an equivalent scene."""
    ver = manager.curr_ver
    assert ver >= 1  # the live version from the lifecycle test
    job = manager.reprocess_scan_async(ver)
    assert not job.get("already_running")
    st = manager.wait_for_reprocess(timeout=240)
    assert st["state"] == "done", st
    assert manager.scene_knowledge["scan_version"] == ver
    assert len(manager.scene_knowledge["unique_objects"]) > 0


def test_queries_serve_during_live_stream(manager):
    """Text queries keep answering from the installed scene while a live
    stream integrates concurrently (live_push holds only the session lock,
    not the manager lock)."""
    import threading

    rgb, depth, pose, K = _frames(6)
    manager.live_begin()
    errors = []

    def pusher():
        try:
            for i in range(6):
                manager.live_push(rgb[i], depth[i], pose[i], K[i])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def querier():
        try:
            for _ in range(4):
                mesh = manager.clip_text_query("the table")
                assert mesh is not None and len(mesh["vertices"]) > 0
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=pusher)] + [
        threading.Thread(target=querier) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    out = manager.live_end()
    assert out["state"] == "done" and out["n_objects"] > 0


def test_live_end_without_frames_raises(manager):
    manager.live_begin()
    with pytest.raises(ValueError):
        manager.live_end()
    # the failed end leaves the session usable; abort releases it
    rgb, depth, pose, K = _frames(1)
    st = manager.live_push(rgb[0], depth[0], pose[0], K[0])
    assert st["frames_seen"] == 1
    out = manager.live_abort()
    assert out["aborted"]
    assert manager.live_status()["state"] == "idle"


def test_reprocess_refused_during_live(manager):
    manager.live_begin()
    try:
        job = manager.reprocess_scan_async(0)
        assert job["state"] == "refused" and job.get("already_running")
    finally:
        manager.live_abort()


def test_invalid_depth_defers_integration(manager):
    """All-invalid depth at stream start (sensor warm-up) must not fail the
    push or drop frames: integration defers until bounds exist."""
    rgb, depth, pose, K = _frames(6)
    manager.live_begin()
    try:
        st = manager.live_push(
            rgb[:3], np.zeros_like(depth[:3]), pose[:3], K[:3]
        )
        assert "warning" in st
        assert st["frames_integrated"] == 0 and st["frames_pending"] == 3
        st = manager.live_push(rgb[3:6], depth[3:6], pose[3:6], K[3:6])
        assert st["frames_integrated"] == 6 and "warning" not in st
        out = manager.live_end()
        assert out["state"] == "done" and out["n_objects"] > 0
    finally:
        if manager.live_status()["state"] != "idle":
            manager.live_abort()


def test_live_crash_recovery_from_staged_frames(manager):
    """Every push stages frames to disk before returning; after a 'crash'
    (session object lost), live_begin refuses until live_recover persists
    the staged frames as a rebuildable version."""
    rgb, depth, pose, K = _frames(5)
    manager.live_begin()
    manager.live_push(rgb[:3], depth[:3], pose[:3], K[:3])
    manager.live_push(rgb[3:5], depth[3:5], pose[3:5], K[3:5])
    staging = manager._live_staging_dir()
    parts = [f for f in os.listdir(staging) if f.startswith("part_")]
    assert len(parts) == 2  # one part per push

    manager._live = None  # simulate a server crash (disk state survives)

    with pytest.raises(ValueError, match="staged frames"):
        manager.live_begin()

    out = manager.live_recover()
    assert out["state"] == "recovered" and out["frames"] == 5
    ver = out["version"]
    assert not os.path.exists(staging)

    # the recovered version rebuilds through the standard path
    job = manager.reprocess_scan_async(ver)
    assert not job.get("already_running")
    st = manager.wait_for_reprocess(timeout=240)
    assert st["state"] == "done", st
    assert manager.scene_knowledge["scan_version"] == ver
    assert len(manager.scene_knowledge["unique_objects"]) > 0

    # discard_staged path: stage again, then drop
    manager.live_begin()
    manager.live_push(rgb[0], depth[0], pose[0], K[0])
    manager._live = None
    st = manager.live_begin(discard_staged=True)
    assert st["state"] == "live"
    assert not [f for f in os.listdir(staging) if f.startswith("part_")]
    manager.live_abort()
    assert not os.path.exists(staging)


def test_live_resume_continues_crashed_stream(manager):
    """live_resume replays the staged frames into a fresh session and the
    stream continues; the final version carries ALL frames."""
    rgb, depth, pose, K = _frames(8)
    manager.live_begin(voxel_size=0.1, margin_m=0.5)
    manager.live_push(rgb[:5], depth[:5], pose[:5], K[:5])

    manager._live = None  # crash (disk survives)

    st = manager.live_resume()
    assert st["state"] == "live" and st["resumed_frames"] == 5
    # session params came back from session.json
    assert manager._live.cfg.voxel_size == pytest.approx(0.1)
    assert manager._live.margin_m == pytest.approx(0.5)

    st = manager.live_push(rgb[5:8], depth[5:8], pose[5:8], K[5:8])
    assert st["frames_seen"] == 8
    out = manager.live_end()
    assert out["state"] == "done" and out["n_objects"] > 0

    from spatially_aware_ai_tpu.data.live import LiveScanDataset
    from spatially_aware_ai_tpu.manager.paths import get_path

    ds = LiveScanDataset(
        get_path(manager.config, out["version"], "scene_inputdir")
    )
    assert len(ds) == 8  # resumed frames + post-resume frames, once each


def test_live_push_shape_mismatch_rejected(manager):
    rgb, depth, pose, K = _frames(2)
    manager.live_begin()
    try:
        with pytest.raises(ValueError):
            manager.live_push(rgb[:2], depth[:1], pose[:2], K[:2])
        with pytest.raises(ValueError):
            manager.live_push(rgb[0], depth[0], pose[0][:3, :3], K[0])
    finally:
        manager.live_abort()


def test_live_integrator_override_matches_default(tmp_path, monkeypatch):
    """SAI_INTEGRATOR routes the live session through the sparse/brick
    compact integrators (manager/live.py:_integrate_compact) — the fused
    grid must match the default path bit-for-bit on integer channels
    (both are exact; only dispatch differs)."""
    rgb, depth, pose, K = _frames(8)

    def run(env_val, root):
        if env_val:
            monkeypatch.setenv("SAI_INTEGRATOR", env_val)
        else:
            monkeypatch.delenv("SAI_INTEGRATOR", raising=False)
        m = make_manager(root)
        m.live_begin()
        for i in range(8):
            m.live_push(rgb[i], depth[i], pose[i], K[i])
        sess = m._live
        caps = (
            sess._brick_cap.value if sess._brick_cap else 0,
            sess._sparse_cap.value if sess._sparse_cap else 0,
        )
        out = m.live_end()
        from spatially_aware_ai_tpu.manager.paths import get_path

        # artifact persistence is async (manager._save_executor): direct
        # disk readers must wait like production readers do, or under host
        # contention the npy may not exist yet
        m._wait_for_save()
        sk = get_path(m.config, out["version"], "scene_knowledge")
        w = np.load(os.path.join(os.path.dirname(sk), "voxel_rgb.npy"))
        return caps, w

    caps0, w0 = run(None, tmp_path / "a")
    caps1, w1 = run("brick", tmp_path / "b")
    caps2, w2 = run("sparse", tmp_path / "c")
    assert caps1[0] > 0 and caps1[1] > 0  # brick compact path ran
    assert caps2[1] > 0                   # sparse compact path ran
    assert caps0 == (0, 0)                # default path untouched
    np.testing.assert_allclose(w1, w0, atol=1e-5)
    np.testing.assert_allclose(w2, w0, atol=1e-5)


def test_live_shard_voxels_matches_single_device(tmp_path, monkeypatch):
    """SAI_SHARD_VOXELS=1 routes live streams through the voxel-sharded
    shard_map step (manager/live.py) on the virtual 8-device mesh — same
    fused scene as the single-device stream."""
    import jax

    assert len(jax.devices()) > 1
    rgb, depth, pose, K = _frames(8)

    def run(shard, root):
        if shard:
            monkeypatch.setenv("SAI_SHARD_VOXELS", "1")
        else:
            monkeypatch.delenv("SAI_SHARD_VOXELS", raising=False)
        # frame_chunk == mesh size: the live inference forwards frame-shard
        # over the mesh too (manager/live.py:_integrate)
        m = make_manager(root, frame_chunk=8)
        m.live_begin()
        for i in range(8):
            m.live_push(rgb[i], depth[i], pose[i], K[i])
        sess = m._live
        sharded = sess._mesh is not None
        out = m.live_end()
        from spatially_aware_ai_tpu.manager.paths import get_path

        m._wait_for_save()  # async persistence; see note above
        sk = get_path(m.config, out["version"], "scene_knowledge")
        w = np.load(os.path.join(os.path.dirname(sk), "voxel_rgb.npy"))
        return sharded, w

    s0, w0 = run(False, tmp_path / "a")
    s1, w1 = run(True, tmp_path / "b")
    assert not s0 and s1
    np.testing.assert_allclose(w1, w0, atol=1e-5)


def test_live_objects_mid_stream(tmp_path):
    """/live_objects returns the object inventory of the grid streamed SO
    FAR (beyond parity: the reference only knows objects after a completed
    scan + rebuild). Read-only: the stream continues and live_end still
    installs normally afterwards."""
    rgb, depth, pose, K = _frames(8)
    m = make_manager(tmp_path)
    assert m.live_objects()["state"] == "idle"

    m.live_begin()
    m.live_push(rgb[0], depth[0], pose[0], K[0])
    assert m.live_objects()["objects"] is None  # no grid before one chunk

    for i in range(1, 6):
        m.live_push(rgb[i], depth[i], pose[i], K[i])
    out = m.live_objects()
    assert out["state"] == "live"
    objs = out["objects"]
    assert objs, "no objects discovered mid-stream"
    assert all(o["n_voxels"] >= 3 for o in objs)
    labels = {o["class_label"] for o in objs}
    assert labels & {"table", "chair", "suitcase"}, labels
    # centroids land inside the live grid's world bounds
    sess = m._live
    lo = np.asarray(sess.origin) - 1e-3
    hi = np.asarray(sess.maxbound) + 1e-3
    for o in objs:
        c = np.asarray(o["centroid_world"])
        assert (c >= lo).all() and (c <= hi).all(), (o, lo, hi)

    for i in range(6, 8):
        m.live_push(rgb[i], depth[i], pose[i], K[i])
    out = m.live_end()
    assert "version" in out


def test_live_objects_recognizes_trained_objects(tmp_path):
    """The flagship in-situ story, mid-stream: after the user names and
    memorizes an object and the DGCNN trains, a NEW live scan reports that
    object as recognized in /live_objects while frames are still arriving
    (exercises the feature-grid finalize path: re-identification gathers
    per-object CLIP features from the device-resident live grid)."""
    from spatially_aware_ai_tpu.scene.objects import (
        mark_object_of_interest,
        merge_objects,
    )

    m = make_manager(tmp_path)  # auto-reconstructs v00
    box_key = next(
        k for k in m.scene_knowledge["unique_objects"]
        if k.startswith("suitcase")
    )
    with m.lock:
        new_name, m.scene_knowledge = merge_objects(
            m.scene_knowledge, m.vertex_obj_idx, m.insitu_model,
            [box_key], "my_box",
        )
        m.scene_knowledge = mark_object_of_interest(
            m.scene_knowledge, m.insitu_model, [new_name]
        )
        stats = m.insitu_prepare_and_train()
    assert stats["trained"], stats

    rgb, depth, pose, K = _frames(8)
    m.live_begin()
    try:
        for i in range(8):
            m.live_push(rgb[i], depth[i], pose[i], K[i])
        out = m.live_objects()
        recognized = [o for o in out["objects"] if o["recognized"]]
        # merge_objects keys the renamed object "my_box:1"; the in-situ
        # prediction re-assigns that user label mid-stream
        assert any(o["object_key"] == new_name for o in recognized), (
            out["objects"]
        )
    finally:
        m.live_abort()


def test_live_pallas_shard_grid_alignment(tmp_path, monkeypatch):
    """pallas in-shard integrator + voxel sharding: the live grid's buffer
    must keep per-SHARD tile alignment (sharded_grid_bucket — lcm'ing the
    tile and device count separately produced 8640-row shards that crashed
    fused_feature_splat's N % tile assert on the first chunk)."""
    import jax

    assert len(jax.devices()) > 1
    monkeypatch.setenv("SAI_SHARD_VOXELS", "1")
    monkeypatch.setenv("SAI_INTEGRATOR", "pallas")
    rgb, depth, pose, K = _frames(8)
    m = make_manager(tmp_path, frame_chunk=8)
    m.live_begin()
    try:
        st = m.live_push(rgb, depth, pose, K)
        assert st["frames_integrated"] == 8, st
        sess = m._live
        n_dev = sess._mesh.devices.size
        n_buf = sess.grid.tsdf_sum.shape[0]
        assert n_buf % (n_dev * sess.cfg.pallas_tile) == 0, n_buf
    finally:
        m.live_abort()


def test_live_mutations_refused_while_finalizing(manager):
    """Review r5: live_end marks the session ended BEFORE consolidating the
    staged frames; in that window live_begin(discard_staged)/live_abort/
    live_recover used to be able to rmtree the completed scan's frames.
    The _live_finalizing flag closes the window."""
    if manager.live_status()["state"] != "idle":
        manager.live_abort()
    manager._live_finalizing = True
    try:
        with pytest.raises(ValueError, match="finalizing"):
            manager.live_begin(discard_staged=True)
        with pytest.raises(ValueError, match="finalizing"):
            manager.live_abort()
        with pytest.raises(ValueError, match="finalizing"):
            manager.live_recover()
    finally:
        manager._live_finalizing = False


def test_blocking_rebuild_refused_during_live_stream(manager):
    """Review r5: the async reprocess refuses during a live stream; the
    blocking run_clipfusion path now has the same guard (it would compete
    for the chip and install-over the stream)."""
    rgb, depth, pose, K = _frames(2)
    manager.live_begin()
    try:
        manager.live_push(rgb[:1], depth[:1], pose[:1], K[:1])
        with pytest.raises(ValueError, match="live scan session is active"):
            manager.run_clipfusion(curr_ver=0)
    finally:
        manager.live_abort()
