"""i420 packed-plane pass-through on the live-push path (ADVICE r4).

A yuv420-transfer session pushed the camera's native packed 4:2:0 planes
used to decode them on the host in the HTTP handler and RE-encode them for
the device transfer — paying a float32 decode on the 1-vCPU host plus a
second round of chroma rounding. Now the planes stay packed end-to-end:
staged verbatim (half the staging bytes), uploaded verbatim, decoded on
DEVICE (core/yuv.py:i420_to_rgb_device). u8-transfer sessions decode once
at the session boundary, exactly like the old server behavior.

No reference equivalent (the reference ingests completed scan directories
only, clip_seem_fusion.py:247-437); the contract under test is internal.
"""
import json
import os

import numpy as np
import pytest

from spatially_aware_ai_tpu.core.yuv import i420_to_rgb_u8, rgb_u8_to_i420
from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
    SyntheticSceneDataset,
)
from spatially_aware_ai_tpu.manager import InSituManager
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine


def make_manager(root, rgb_transfer="yuv420", frame_chunk=3):
    d = root / "scans" / "demo" / "v00"
    os.makedirs(d, exist_ok=True)
    with open(d / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 6, "width": 64, "height": 48}, f)
    os.environ["SAI_RGB_TRANSFER"] = rgb_transfer
    try:
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
    finally:
        os.environ.pop("SAI_RGB_TRANSFER", None)


def _frames(n=6):
    ds = SyntheticSceneDataset(num_frames=n, width=64, height=48)
    stack = ds.stacked(range(n))
    rgb_u8 = np.clip(
        np.rint(stack["rgb"] * 255.0), 0, 255
    ).astype(np.uint8)
    return rgb_u8, stack["depth"], stack["pose"], stack["K"]


def _staged_keys(manager):
    staging = manager._live_staging_dir()
    keys = []
    for p in sorted(os.listdir(staging)):
        if p.startswith("part_"):
            with np.load(os.path.join(staging, p)) as z:
                keys.append(set(z.files))
    return keys


def test_yuv_session_keeps_planes_packed_and_matches_u8_push(tmp_path):
    """In a yuv420 session: an i420 push stages the PLANES verbatim, and
    the fused grid is bit-identical to pushing the decoded u8 frames (the
    u8 path re-encodes with the same rgb_u8_to_i420 — same planes, same
    device program)."""
    rgb_u8, depth, pose, K = _frames(3)
    planes = rgb_u8_to_i420(rgb_u8)

    m_u8 = make_manager(tmp_path / "a")
    m_u8.live_begin()
    m_u8.live_push(rgb_u8, depth, pose, K)
    assert _staged_keys(m_u8) == [{"rgb", "depth", "pose", "K"}]
    grid_u8 = m_u8._live.grid

    m_pk = make_manager(tmp_path / "b")
    m_pk.live_begin()
    st = m_pk.live_push(planes, depth, pose, K, rgb_i420_height=48)
    assert st["frames_seen"] == 3 and st["frames_integrated"] == 3
    # staged verbatim: the part holds the packed planes, half the bytes
    assert _staged_keys(m_pk) == [{"rgb_i420", "depth", "pose", "K"}]
    grid_pk = m_pk._live.grid

    for field in ("tsdf_sum", "tsdf_w", "rgb_sum", "w"):
        np.testing.assert_array_equal(
            np.asarray(getattr(grid_u8, field)),
            np.asarray(getattr(grid_pk, field)),
            err_msg=field,
        )
    m_u8.live_abort()
    m_pk.live_abort()


def test_u8_session_decodes_i420_at_boundary(tmp_path):
    """A u8-transfer session pushed planes decodes ONCE at the session
    boundary: staged part holds decoded u8 rgb, grid matches pushing the
    decoded frames directly."""
    rgb_u8, depth, pose, K = _frames(3)
    planes = rgb_u8_to_i420(rgb_u8)
    decoded = i420_to_rgb_u8(planes)

    m = make_manager(tmp_path / "a", rgb_transfer="u8")
    m.live_begin()
    m.live_push(planes, depth, pose, K, rgb_i420_height=48)
    assert _staged_keys(m) == [{"rgb", "depth", "pose", "K"}]
    grid_i420 = m._live.grid

    m2 = make_manager(tmp_path / "b", rgb_transfer="u8")
    m2.live_begin()
    m2.live_push(decoded, depth, pose, K)
    np.testing.assert_array_equal(
        np.asarray(grid_i420.rgb_sum), np.asarray(m2._live.grid.rgb_sum)
    )
    m.live_abort()
    m2.live_abort()


def test_bad_plane_shapes_rejected(tmp_path):
    rgb_u8, depth, pose, K = _frames(3)
    planes = rgb_u8_to_i420(rgb_u8)
    m = make_manager(tmp_path)
    m.live_begin()
    with pytest.raises(ValueError, match="rgb_i420"):
        m.live_push(planes[:, :-1], depth, pose, K, rgb_i420_height=48)
    with pytest.raises(ValueError, match="rgb_i420"):  # H not mult of 4
        m.live_push(planes, depth, pose, K, rgb_i420_height=46)
    with pytest.raises(ValueError, match="rgb_i420"):  # not u8
        m.live_push(planes.astype(np.float32), depth, pose, K,
                    rgb_i420_height=48)
    assert m.live_status()["frames_seen"] == 0
    m.live_abort()


def test_resume_replays_i420_parts_and_recover_decodes(tmp_path):
    """Crash durability with packed parts: live_resume replays the planes
    verbatim (no decode), live_recover consolidates them into the durable
    u8 live_frames.npz format."""
    rgb_u8, depth, pose, K = _frames(6)
    planes = rgb_u8_to_i420(rgb_u8)

    m = make_manager(tmp_path)
    m.live_begin()
    m.live_push(planes[:3], depth[:3], pose[:3], K[:3],
                rgb_i420_height=48)
    m._live = None  # crash (disk survives)

    st = m.live_resume()
    assert st["resumed_frames"] == 3
    # the replayed chunk re-integrated from the staged planes
    assert m.live_status()["frames_integrated"] == 3
    # stream continues with more packed pushes, then crash again and
    # recover into a regular version
    m.live_push(planes[3:], depth[3:], pose[3:], K[3:],
                rgb_i420_height=48)
    m._live = None
    out = m.live_recover()
    assert out["frames"] == 6

    from spatially_aware_ai_tpu.data.live import LiveScanDataset
    from spatially_aware_ai_tpu.manager.paths import get_path

    ds = LiveScanDataset(
        get_path(m.config, out["version"], "scene_inputdir")
    )
    assert len(ds) == 6
    stack = ds.stacked_u8()
    # the durable format is decoded u8 — exactly the boundary decoder's
    # output for the client's planes (single chroma rounding, the client's)
    np.testing.assert_array_equal(stack["rgb"], i420_to_rgb_u8(planes))


def test_sessionless_push_decodes_at_end():
    """No staging dir (direct-session mode): planes ride the hot path
    packed; live-end persistence decodes once."""
    from spatially_aware_ai_tpu.manager.live import LiveScanSession
    from spatially_aware_ai_tpu.pipeline import FusionConfig

    rgb_u8, depth, pose, K = _frames(4)
    planes = rgb_u8_to_i420(rgb_u8)
    cfg = FusionConfig(
        voxel_size=0.08, trunc_vox=2, clip_patch_size=32,
        clip_patch_stride=16, frame_chunk=2, with_labels=False,
        rgb_transfer="yuv420",
    )
    sess = LiveScanSession(ClipEngine.tiny(), None, cfg, staging_dir=None)
    sess.push(planes, depth, pose, K, rgb_i420_height=48)
    result, persist = sess.end()
    assert persist["rgb"].shape == rgb_u8.shape
    np.testing.assert_array_equal(persist["rgb"], i420_to_rgb_u8(planes))


def test_single_frame_i420_push(tmp_path):
    """Single frames may omit the leading axis (push's contract) — the
    i420 form included: review r5 caught the server lifting ONLY the rgb
    planes to batched, desyncing them from depth/pose/K."""
    rgb_u8, depth, pose, K = _frames(3)
    planes = rgb_u8_to_i420(rgb_u8)
    m = make_manager(tmp_path)
    m.live_begin()
    st = m.live_push(planes[0], depth[0], pose[0], K[0],
                     rgb_i420_height=48)
    assert st["frames_seen"] == 1
    m.live_abort()


def test_server_single_frame_i420_body(tmp_path):
    """The HTTP route passes unbatched i420 bodies through unmodified so
    push promotes all four arrays together."""
    import io

    from spatially_aware_ai_tpu.server import create_app

    m = make_manager(tmp_path)
    app = create_app(m)

    def post_npz(path, **arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        body = buf.getvalue()
        environ = {
            "REQUEST_METHOD": "POST", "PATH_INFO": path,
            "CONTENT_TYPE": "application/octet-stream",
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body), "QUERY_STRING": "",
        }
        status = {}
        chunks = app(environ,
                     lambda s, h: status.update(code=int(s.split()[0])))
        return status["code"], json.loads(b"".join(chunks).decode())

    rgb_u8, depth, pose, K = _frames(2)
    planes = rgb_u8_to_i420(rgb_u8)
    code, st = post_npz("/live_begin")
    assert code == 200
    code, st = post_npz("/live_push", rgb_i420=planes[0], depth=depth[0],
                        pose=pose[0], K=K[0])
    assert code == 200 and st["frames_seen"] == 1
    code, st = post_npz("/live_push", rgb_i420=planes[1:], depth=depth[1:],
                        pose=pose[1:], K=K[1:])
    assert code == 200 and st["frames_seen"] == 2
    post_npz("/live_abort")


def test_server_malformed_i420_ndim_is_400(tmp_path):
    """A 1-D rgb_i420 body must be a clean 400, not an IndexError 500."""
    import io

    from spatially_aware_ai_tpu.server import create_app

    m = make_manager(tmp_path)
    app = create_app(m)

    def post_npz(path, **arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        body = buf.getvalue()
        environ = {
            "REQUEST_METHOD": "POST", "PATH_INFO": path,
            "CONTENT_TYPE": "application/octet-stream",
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body), "QUERY_STRING": "",
        }
        status = {}
        chunks = app(environ,
                     lambda s, h: status.update(code=int(s.split()[0])))
        return status["code"], json.loads(b"".join(chunks).decode())

    rgb_u8, depth, pose, K = _frames(1)
    post_npz("/live_begin")
    code, err = post_npz("/live_push", rgb_i420=np.zeros(64, np.uint8),
                         depth=depth, pose=pose, K=K)
    assert code == 400 and "rgb_i420" in err["error"]
    post_npz("/live_abort")


def test_snapshot_resume_partial_i420_part_replay(tmp_path):
    """Snapshot fast path with PACKED parts: one 5-frame i420 part, 3
    frames in the snapshot -> resume must slice the part's planes at the
    prefix (lo=3) and replay only the tail, landing on a grid identical
    to an uninterrupted session fed the same planes."""
    from spatially_aware_ai_tpu.manager.live import LiveScanSession

    rgb_u8, depth, pose, K = _frames(6)
    planes = rgb_u8_to_i420(rgb_u8)

    m = make_manager(tmp_path)
    m.live_begin(voxel_size=0.1, margin_m=0.5)
    m.live_push(planes[:5], depth[:5], pose[:5], K[:5],
                rgb_i420_height=48)
    assert m._live.frames_integrated == 3  # one full chunk of 3
    out = m.live_snapshot()
    assert out["snapshotted"] and out["frames_in_snapshot"] == 3
    cfg = m._live.cfg

    m._live = None  # crash (disk survives)

    st = m.live_resume()
    assert st["snapshot_frames"] == 3
    assert st["resumed_frames"] == 5  # 3 restored + 2 replayed from planes
    assert st["frames_pending"] == 2

    control = LiveScanSession(m.clip_model, m.seg_model, cfg, margin_m=0.5)
    control.push(planes[:5], depth[:5], pose[:5], K[:5],
                 rgb_i420_height=48)
    for field in ("tsdf_sum", "w", "rgb_sum", "label_hist"):
        np.testing.assert_array_equal(
            np.asarray(getattr(m._live.grid, field)),
            np.asarray(getattr(control.grid, field)),
            err_msg=field,
        )
    # stream continues and ends with every frame exactly once
    st = m.live_push(planes[5:], depth[5:], pose[5:], K[5:],
                     rgb_i420_height=48)
    assert st["frames_seen"] == 6
    out = m.live_end()
    assert out["state"] == "done"
