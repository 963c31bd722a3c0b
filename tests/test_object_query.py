"""Object-level text query (/object_query, manager.object_text_query):
rank scene object instances by CLIP relevance to a query — the product
extension over the reference's per-vertex heatmap (clip_seem_fusion.py:
482-561), which forces clients to eyeball which object lit up.
"""
import json
import os
import socketserver
import threading
import urllib.parse
import urllib.request
from wsgiref.simple_server import WSGIServer, make_server

import numpy as np
import pytest

from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
)
from spatially_aware_ai_tpu.manager import InSituManager
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.server import create_app


@pytest.fixture(scope="module")
def manager(tmp_path_factory):
    root = tmp_path_factory.mktemp("objq_scene")
    d = root / "scans" / "demo" / "v00"
    os.makedirs(d)
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


def test_object_query_ranks_all_meshed_objects(manager):
    ranked = manager.object_text_query("a red box")
    assert ranked is not None and len(ranked) >= 3
    ids = [o["object_id"] for o in ranked]
    # every entry maps to a real scene object and carries its label
    uo = manager.scene_knowledge["unique_objects"]
    for o in ranked:
        assert o["object_id"] in uo
        assert o["class_label"] == uo[o["object_id"]]["class_label"]
        assert 0.0 <= o["score"] <= 1.0
        assert o["n_vertices"] > 0
    # sorted best-first, no duplicates
    scores = [o["score"] for o in ranked]
    assert scores == sorted(scores, reverse=True)
    assert len(set(ids)) == len(ids)
    # vertex counts + centroids agree with the per-object mesh convention
    obj_idx = np.asarray(manager.vertex_obj_idx)
    verts = np.asarray(manager.verts, np.float32)
    for o in ranked:
        oi = uo[o["object_id"]]["object_index"]
        sel = obj_idx == oi
        assert o["n_vertices"] == int(sel.sum())
        np.testing.assert_allclose(
            o["centroid_m"], verts[sel].mean(axis=0), atol=1e-3
        )


def test_object_query_top_k(manager):
    all_ = manager.object_text_query("a chair")
    top2 = manager.object_text_query("a chair", top_k=2)
    assert len(top2) == 2
    assert [o["object_id"] for o in top2] == [
        o["object_id"] for o in all_[:2]
    ]


def test_object_query_finds_the_described_object(manager):
    """Semantic ranking check with controlled embeddings: text encoding is
    stubbed to orthogonal per-phrase directions (the tiny random tower's
    outputs are too correlated across phrases to carry semantics — the
    real tower has its own parity tests), every object's vertices carry
    their own class label's direction, and one target object carries the
    probe phrase's direction instead. The full production path — dynamic
    bank build, on-device segment-sum pooling, run_query softmax, ranking
    — must surface the target first with a dominant score."""
    probe = "the glowing artifact"
    uo = manager.scene_knowledge["unique_objects"]
    target = max(
        uo, key=lambda k: np.sum(
            np.asarray(manager.vertex_obj_idx) == uo[k]["object_index"]
        )
    )

    C = np.asarray(manager.vert_clip_feat).shape[-1]
    dirs = {}

    def direction(phrase):
        j = dirs.setdefault(phrase, len(dirs))
        v = np.zeros(C, np.float32)
        v[j] = 1.0
        return v

    def fake_encode(texts, prompt_templates=None):
        return np.stack([direction(t) for t in texts])

    saved_feats = manager.vert_clip_feat
    saved_dev = manager._vert_feat_dev
    saved_encode = manager.clip_model.encode_text_with_prompt_ensemble
    saved_bank = (manager.control_objects, manager.control_text_features)
    try:
        n = len(manager.verts)
        feats = np.zeros((n, C), np.float32)
        obj_idx = np.asarray(manager.vertex_obj_idx)
        for k, info in uo.items():
            phrase = probe if k == target else info["class_label"]
            feats[obj_idx == info["object_index"]] = direction(phrase)
        manager.vert_clip_feat = feats
        manager._vert_feat_dev = None
        manager.clip_model.encode_text_with_prompt_ensemble = fake_encode
        manager.control_objects = None
        manager.control_text_features = None

        ranked = manager.object_text_query(probe)
        assert ranked[0]["object_id"] == target
        assert ranked[0]["score"] > 0.9
        assert all(o["score"] < 0.5 for o in ranked[1:])
    finally:
        manager.vert_clip_feat = saved_feats
        manager._vert_feat_dev = saved_dev
        manager.clip_model.encode_text_with_prompt_ensemble = saved_encode
        manager.control_objects, manager.control_text_features = saved_bank


def test_object_query_none_before_scene(manager):
    saved = manager.scene_knowledge
    try:
        manager.scene_knowledge = None
        assert manager.object_text_query("anything") is None
    finally:
        manager.scene_knowledge = saved


@pytest.fixture(scope="module")
def server_url(manager):
    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True

    httpd = make_server(
        "127.0.0.1", 0, create_app(manager),
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
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_http_object_query(server_url):
    status, out = _post(
        server_url, "/object_query",
        {"text_query": "show me the red box", "top_k": 3},
    )
    assert status == 200
    assert out["query"] == "the red box"  # "show me " stripped like /text_query
    assert 1 <= len(out["objects"]) <= 3
    assert {"object_id", "class_label", "score", "n_vertices"} <= set(
        out["objects"][0]
    )


def test_http_object_query_missing_field_is_400(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server_url, "/object_query", {"wrong": "field"})
    assert exc.value.code == 400


def test_client_objects_subcommand(server_url, capsys):
    from spatially_aware_ai_tpu.cli import client

    client.main(
        ["--server", server_url, "objects", "a chair", "--top-k", "2"]
    )
    out = capsys.readouterr().out
    assert "status 200" in out
    # two ranked lines with score + id
    lines = [ln for ln in out.splitlines() if ln.startswith("  0.")]
    assert len(lines) == 2


def test_http_object_query_negative_top_k_is_400(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server_url, "/object_query",
              {"text_query": "a box", "top_k": "-1"})
    assert exc.value.code == 400


def test_object_query_finds_renamed_object(manager):
    """Review r5 regression: rename used to strand the object's vertices on
    its old object_index (the remap the reference commented out), so the
    renamed object silently vanished from the ranked results."""
    from spatially_aware_ai_tpu.scene.objects import merge_objects

    ranked = manager.object_text_query("anything")
    assert ranked, "scene has queryable objects"
    victim = ranked[0]["object_id"]
    n_verts = ranked[0]["n_vertices"]

    with manager.lock:
        new_name, manager.scene_knowledge = merge_objects(
            manager.scene_knowledge, manager.vertex_obj_idx,
            manager.insitu_model, [victim], "my_renamed_thing",
        )
    ranked2 = manager.object_text_query("anything")
    by_id = {r["object_id"]: r for r in ranked2}
    assert victim not in by_id
    assert new_name in by_id, (new_name, list(by_id))
    assert by_id[new_name]["n_vertices"] == n_verts
