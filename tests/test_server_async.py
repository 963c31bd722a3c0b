"""Background (non-blocking) reprocess: the rebuild runs off-lock on a
worker thread while queries keep serving the installed version, then the new
scene swaps in atomically. Beyond parity — the reference's /reprocess_scan
blocks every request for the whole fusion (app_unity.py:27-51 under Flask's
shared singleton); ours offers both the blocking contract endpoint and
/reprocess_scan_async + /scan_status."""
import json
import os
import threading
import urllib.parse
import urllib.request
import time

import numpy as np
import pytest

from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
)
from spatially_aware_ai_tpu.manager import InSituManager
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine


def make_manager(root, versions=(0, 1)):
    for v in versions:
        d = root / "scans" / "demo" / f"v{v:02d}"
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
        frame_chunk=3,
    )


@pytest.fixture(scope="module")
def manager(tmp_path_factory):
    return make_manager(tmp_path_factory.mktemp("async_scene"))


def test_async_reprocess_serves_old_version_meanwhile(manager):
    """While the background rebuild runs, queries answer from the installed
    scene; when it finishes, the new version is live."""
    gate = threading.Event()
    built = threading.Event()
    orig = manager._build_scene

    def gated_build(*a, **k):
        state = orig(*a, **k)
        built.set()
        assert gate.wait(timeout=60), "test gate never opened"
        return state

    manager._build_scene = gated_build
    try:
        job = manager.reprocess_scan_async(1, preview_every_chunks=1)
        assert job["state"] == "running"
        assert not job.get("already_running")

        # a second start while running is rejected
        again = manager.reprocess_scan_async(1)
        assert again.get("already_running")

        assert built.wait(timeout=120)
        # job is still running (holding the gate): the manager must answer
        # queries from the previous (v0) scene without blocking
        assert manager.curr_ver == 0
        t0 = time.time()
        mesh = manager.clip_text_query("the table")
        assert mesh is not None and len(mesh["vertices"]) > 0
        assert time.time() - t0 < 30
        st = manager.scan_status()
        assert st["state"] == "running"
        assert st["version"] == 1
        assert st["frames_total"] == 6
        assert st["frames_done"] == 6  # all chunks dispatched before gate
        # mid-scan preview: coarse geometry mesh, status stays lightweight
        assert st["has_preview"] and "preview" not in st
        pv = manager.scan_preview()
        assert pv["state"] == "running"
        assert len(pv["mesh"]["vertices"]) > 0
        assert len(pv["mesh"]["colors"]) == len(pv["mesh"]["vertices"])
    finally:
        manager._build_scene = orig
        gate.set()

    st = manager.wait_for_reprocess(timeout=120)
    assert st["state"] == "done", st
    assert manager.curr_ver == 1
    assert manager.scene_knowledge["scan_version"] == 1
    # the new version's artifacts exist on disk
    from spatially_aware_ai_tpu.manager.paths import get_path

    manager._wait_for_save()
    assert os.path.exists(get_path(manager.config, 1, "scene_knowledge"))
    assert os.path.exists(get_path(manager.config, 1, "mesh_rgb"))
    # and queries now hit the new scene
    mesh = manager.clip_text_query("the table")
    assert mesh is not None and len(mesh["vertices"]) > 0


def test_preview_fires_even_on_short_scans(manager):
    """With the DEFAULT preview cadence (every 4 chunks) a 2-chunk scan
    must still produce a preview: the pipeline always fires on_chunk at the
    last chunk."""
    manager.wait_for_reprocess(timeout=120)
    job = manager.reprocess_scan_async(0)  # 6 frames / chunk 3 = 2 chunks
    assert not job.get("already_running")
    st = manager.wait_for_reprocess(timeout=120)
    assert st["state"] == "done", st
    pv = manager.scan_preview()
    assert pv["mesh"] is not None and len(pv["mesh"]["vertices"]) > 0


def test_async_reprocess_error_keeps_old_scene(manager):
    """A failed rebuild reports state=error and leaves the installed scene
    untouched (the job thread must never die silently)."""
    manager.wait_for_reprocess(timeout=120)
    before_ver = manager.curr_ver
    orig = manager._build_scene

    def boom(*a, **k):
        raise RuntimeError("synthetic build failure")

    manager._build_scene = boom
    try:
        job = manager.reprocess_scan_async(0)
        assert job["state"] in ("running", "error")
        st = manager.wait_for_reprocess(timeout=120)
    finally:
        manager._build_scene = orig
    assert st["state"] == "error"
    assert "synthetic build failure" in st["error"]
    assert manager.curr_ver == before_ver
    assert manager.clip_text_query("the table") is not None
    # a new job can start after an error
    job = manager.reprocess_scan_async(0)
    assert not job.get("already_running")
    st = manager.wait_for_reprocess(timeout=120)
    assert st["state"] == "done", st


@pytest.fixture(scope="module")
def server_url(manager):
    import socketserver
    from wsgiref.simple_server import WSGIServer, make_server

    from spatially_aware_ai_tpu.server import create_app

    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True

    httpd = make_server(
        "127.0.0.1", 0, create_app(manager), server_class=ThreadingWSGIServer
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def post(url, path, data):
    body = urllib.parse.urlencode(data).encode()
    req = urllib.request.Request(url + path, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read().decode())


def get(url, path):
    with urllib.request.urlopen(url + path, timeout=120) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_http_async_reprocess_and_status(manager, server_url):
    manager.wait_for_reprocess(timeout=120)
    status, job = post(server_url, "/reprocess_scan_async", {"version": 0})
    assert status == 200
    assert job["state"] == "running"
    deadline = time.time() + 120
    while time.time() < deadline:
        status, st = get(server_url, "/scan_status")
        assert status == 200
        if st["state"] != "running":
            break
        time.sleep(0.1)
    assert st["state"] == "done", st
    assert st["current_version"] == 0
    assert st["frames_done"] == st["frames_total"] == 6


def test_http_spelled_aliases_match_typo_endpoints(manager, server_url):
    manager.wait_for_reprocess(timeout=120)
    manager._wait_for_save()
    ver = manager.curr_ver
    s1, typo = post(server_url, "/requset_scene_knowledge",
                    {"scan_version": ver})
    s2, spelled = post(server_url, "/request_scene_knowledge",
                       {"scan_version": ver})
    assert s1 == s2 == 200
    assert typo == spelled

    s1, typo = post(
        server_url, "/requset_scene_mesh",
        {"scan_version": ver, "obj_key": "scene", "color": "rgb"},
    )
    s2, spelled = post(
        server_url, "/request_scene_mesh",
        {"scan_version": ver, "obj_key": "scene", "color": "rgb"},
    )
    assert s1 == s2 == 200
    assert typo == spelled
