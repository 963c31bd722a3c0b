"""Multi-scene serving (manager/registry.py + the `scene` routing field):
one process serves several scan directories with shared model towers and
fully isolated per-scene state."""
import json
import os
import socketserver
import threading
import urllib.parse
import urllib.request
from wsgiref.simple_server import WSGIServer, make_server

import pytest

from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
)
from spatially_aware_ai_tpu.manager.registry import SceneRegistry
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.server import create_app


@pytest.fixture(scope="module")
def registry(tmp_path_factory):
    root = tmp_path_factory.mktemp("multi")
    for scene, spec in [
        ("roomA", {"num_frames": 6, "width": 64, "height": 48}),
        ("roomB", {"num_frames": 6, "width": 64, "height": 48,
                   "remove": ["red_box"]}),
    ]:
        d = root / "scans" / scene / "v00"
        os.makedirs(d)
        with open(d / "synthetic_scene.json", "w") as f:
            json.dump(spec, f)
    # a non-scene directory must not be listed
    os.makedirs(root / "scans" / "not_a_scene")
    return SceneRegistry(
        scan_dir=str(root / "scans"),
        output_dir=str(root / "out"),
        default_scene="roomA",
        manager_kwargs=dict(
            dataset="synthetic",
            voxel_size=0.08,
            trunc_vox=2,
            clip_patch_size=32,
            clip_patch_stride=16,
            frame_chunk=3,
            clip_engine=ClipEngine.tiny(),
            seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        ),
    )


def test_discovery_and_lazy_build(registry):
    assert registry.scene_names() == ["roomA", "roomB"]
    assert registry.status()["loaded"] == {}  # nothing built yet

    a = registry.get()  # default scene
    assert a.config.scan_name == "roomA"
    assert registry.get("roomA") is a  # cached
    st = registry.status()
    assert list(st["loaded"]) == ["roomA"]
    assert st["loaded"]["roomA"]["reconstructed"]


def test_engines_shared_state_isolated(registry):
    a, b = registry.get("roomA"), registry.get("roomB")
    assert a is not b
    # towers shared (one set of weights/compiled programs per process)
    assert a.clip_model is b.clip_model
    assert a.seg_model is b.seg_model
    # stateful parts are NOT shared
    assert a.insitu_model is not b.insitu_model
    assert a.scene_knowledge is not b.scene_knowledge
    # roomB was generated without the red box -> no suitcase instance
    labels_a = {v["class_label"]
                for v in a.scene_knowledge["unique_objects"].values()}
    labels_b = {v["class_label"]
                for v in b.scene_knowledge["unique_objects"].values()}
    assert "suitcase" in labels_a
    assert "suitcase" not in labels_b


def test_unknown_scene_raises(registry):
    with pytest.raises(ValueError, match="unknown scene"):
        registry.get("cellar")


def test_shared_insitu_model_rejected(tmp_path):
    with pytest.raises(ValueError, match="insitu_model"):
        SceneRegistry(
            scan_dir=str(tmp_path),
            output_dir=str(tmp_path / "out"),
            default_scene="x",
            manager_kwargs={"insitu_model": object()},
        )


@pytest.fixture(scope="module")
def server_url(registry):
    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True

    httpd = make_server(
        "127.0.0.1", 0, create_app(registry),
        server_class=ThreadingWSGIServer,
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, path, data):
    body = urllib.parse.urlencode(data).encode()
    req = urllib.request.Request(url + path, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        payload = resp.read().decode()
        try:
            return resp.status, json.loads(payload)
        except json.JSONDecodeError:  # /rename_object returns plain text
            return resp.status, payload


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=120) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_http_scenes_endpoint(server_url):
    status, out = _get(server_url, "/scenes")
    assert status == 200
    assert out["scenes"] == ["roomA", "roomB"]
    assert out["default"] == "roomA"
    assert "roomA" in out["loaded"]


def test_http_scene_routing(server_url):
    # default (no scene field) -> roomA, which has the box
    _, ka = _post(server_url, "/requset_scene_knowledge",
                  {"scan_version": 0})
    labels_a = {v["class_label"] for v in ka["unique_objects"].values()}
    assert "suitcase" in labels_a

    # explicit scene field -> roomB (no box); form field and query
    # parameter are equivalent
    _, kb = _post(server_url, "/requset_scene_knowledge",
                  {"scan_version": 0, "scene": "roomB"})
    labels_b = {v["class_label"] for v in kb["unique_objects"].values()}
    assert "suitcase" not in labels_b
    _, kb2 = _post(server_url, "/requset_scene_knowledge?scene=roomB",
                   {"scan_version": 0})
    assert kb2["unique_objects"].keys() == kb["unique_objects"].keys()


def test_http_mutations_are_scene_isolated(server_url):
    # rename the chair in roomB only
    status, new_name = _post(
        server_url, "/rename_object",
        {"object_key": "chair:1", "new_name": "b_chair",
         "scene": "roomB"},
    )
    assert status == 200 and new_name == "b_chair:1"
    _, kb = _post(server_url, "/requset_scene_knowledge",
                  {"scan_version": 0, "scene": "roomB"})
    assert "b_chair:1" in kb["unique_objects"]
    _, ka = _post(server_url, "/requset_scene_knowledge",
                  {"scan_version": 0})
    assert "b_chair:1" not in ka["unique_objects"]
    assert "chair:1" in ka["unique_objects"]


def test_http_unknown_scene_is_400(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server_url, "/text_query",
              {"text_query": "a box", "scene": "cellar"})
    assert exc.value.code == 400
    assert "unknown scene" in json.loads(exc.value.read().decode())["error"]


def test_client_scene_flag(server_url, capsys):
    from spatially_aware_ai_tpu.cli import client

    client.main(["--server", server_url, "--scene", "roomB",
                 "objects", "a chair", "--top-k", "1"])
    out = capsys.readouterr().out
    assert "status 200" in out


def test_insitu_factory_builds_per_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("factory")
    for scene in ["r1", "r2"]:
        d = root / "scans" / scene / "v00"
        os.makedirs(d)
        with open(d / "synthetic_scene.json", "w") as f:
            json.dump({"num_frames": 4, "width": 64, "height": 48}, f)

    from spatially_aware_ai_tpu.models.dgcnn import InSituLearning

    built = []

    def factory(scene_name):
        built.append(scene_name)
        return InSituLearning(
            emb_dims=32, k_neighbors=4, num_points=16, batch_size=8,
            epochs=10, feature_dim=16,
        )

    reg = SceneRegistry(
        scan_dir=str(root / "scans"),
        output_dir=str(root / "out"),
        default_scene="r1",
        manager_kwargs=dict(
            dataset="synthetic", voxel_size=0.1, trunc_vox=2,
            clip_patch_size=32, clip_patch_stride=16, frame_chunk=2,
            clip_engine=ClipEngine.tiny(),
            seg_model=ColorSegmenter(SyntheticScene.demo_room()),
            insitu_factory=factory,
        ),
    )
    m1, m2 = reg.get("r1"), reg.get("r2")
    assert built == ["r1", "r2"]
    assert m1.insitu_model is not m2.insitu_model
    assert m1.insitu_model.cfg.emb_dims == 32  # the factory's tiny model


def test_single_manager_rejects_foreign_scene(tmp_path_factory):
    """A plain (non --multi-scene) server must 400 a request routed to a
    scene it does not host — silently serving its own scene's data would
    hide the client misconfiguration."""
    from spatially_aware_ai_tpu.manager import InSituManager

    root = tmp_path_factory.mktemp("single")
    d = root / "scans" / "solo" / "v00"
    os.makedirs(d)
    with open(d / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 4, "width": 64, "height": 48}, f)
    manager = InSituManager(
        scan_dir=str(root / "scans"), scan_name="solo",
        dataset="synthetic", output_dir=str(root / "out"),
        voxel_size=0.1, trunc_vox=2, clip_patch_size=32,
        clip_patch_stride=16, frame_chunk=2,
        clip_engine=ClipEngine.tiny(),
        seg_model=ColorSegmenter(SyntheticScene.demo_room()),
    )

    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True

    httpd = make_server("127.0.0.1", 0, create_app(manager),
                        server_class=ThreadingWSGIServer)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        # naming ITS scene works
        status, _ = _post(url, "/requset_scene_knowledge",
                          {"scan_version": 0, "scene": "solo"})
        assert status == 200
        # a foreign scene is a 400, not wrong-scene data with a 200
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(url, "/requset_scene_knowledge",
                  {"scan_version": 0, "scene": "other"})
        assert exc.value.code == 400
        assert "--multi-scene" in json.loads(
            exc.value.read().decode())["error"]
    finally:
        httpd.shutdown()


def _mini_registry(root, n_scenes, **extra):
    for i in range(n_scenes):
        d = root / "scans" / f"s{i}" / "v00"
        os.makedirs(d)
        with open(d / "synthetic_scene.json", "w") as f:
            json.dump({"num_frames": 4, "width": 64, "height": 48}, f)
    return SceneRegistry(
        scan_dir=str(root / "scans"),
        output_dir=str(root / "out"),
        default_scene="s0",
        manager_kwargs=dict(
            dataset="synthetic", voxel_size=0.1, trunc_vox=2,
            clip_patch_size=32, clip_patch_stride=16, frame_chunk=2,
            clip_engine=ClipEngine.tiny(),
            seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        ),
        **extra,
    )


def test_lru_eviction_bounds_loaded_scenes(tmp_path_factory):
    reg = _mini_registry(tmp_path_factory.mktemp("lru"), 3, max_loaded=2)
    reg.get("s0")
    reg.get("s1")
    assert sorted(reg.status()["loaded"]) == ["s0", "s1"]

    reg.get("s0")  # refresh s0 -> s1 becomes the LRU victim
    reg.get("s2")
    assert sorted(reg.status()["loaded"]) == ["s0", "s2"]

    # the evicted scene reloads from its artifacts on next touch (fast
    # path: it was processed) and evicts the current LRU (s0 — refreshed
    # before s2 was built, so now the oldest)
    m1 = reg.get("s1")
    assert m1.scene_reconstructed
    assert sorted(reg.status()["loaded"]) == ["s1", "s2"]


def test_eviction_skips_scene_with_live_session(tmp_path_factory):
    reg = _mini_registry(tmp_path_factory.mktemp("lru2"), 3, max_loaded=1)
    m0 = reg.get("s0")
    m0.live_begin(voxel_size=0.1, margin_m=0.5)
    try:
        # s0 is mid-stream: it must survive; the cap is best-effort
        reg.get("s1")
        assert "s0" in reg.status()["loaded"]
    finally:
        m0.live_abort()


def test_live_sessions_route_per_scene(registry):
    """Live streaming state must attach to the routed scene's manager:
    a stream opened on roomB leaves roomA's live state idle, and both
    managers report their own sessions."""
    import numpy as np

    from spatially_aware_ai_tpu.data.synthetic import SyntheticSceneDataset

    a, b = registry.get("roomA"), registry.get("roomB")
    st = b.live_begin(voxel_size=0.1, margin_m=0.5)
    assert st["state"] == "live"
    try:
        assert a.live_status() == {"state": "idle"}
        ds = SyntheticSceneDataset(num_frames=3, width=64, height=48)
        stack = ds.stacked(range(3))
        b.live_push(stack["rgb"], stack["depth"], stack["pose"],
                    stack["K"])
        assert b.live_status()["frames_seen"] == 3
        assert a.live_status() == {"state": "idle"}
    finally:
        b.live_abort()


def test_concurrent_cross_scene_requests(server_url):
    """Hammer both scenes concurrently (queries + knowledge + /scenes):
    no deadlock between the registry build lock and the manager RLocks,
    no 500s, and every response routes to the right scene."""
    errors = []

    def worker(i):
        try:
            scene = ["roomA", "roomB"][i % 2]
            _, k = _post(server_url, "/requset_scene_knowledge",
                         {"scan_version": 0, "scene": scene})
            labels = {v["class_label"]
                      for v in k["unique_objects"].values()}
            assert ("suitcase" in labels) == (scene == "roomA"), scene
            status, _ = _post(server_url, "/text_query",
                              {"text_query": "a chair", "scene": scene})
            assert status == 200
            status, s = _get(server_url, "/scenes")
            assert status == 200 and s["default"] == "roomA"
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not any(t.is_alive() for t in threads), "request deadlocked"
    assert not errors, errors
