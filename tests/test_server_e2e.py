"""Full server lifecycle test — the scenario the reference only exercises by
hand with test_client_requests.py: reconstruct v00, query it with language,
rename + memorize an object, train the in-situ model, reprocess a v01 scan
where that object was removed, and see it reported missing.
"""
import io
import json
import os
from urllib.parse import urlencode

import numpy as np
import pytest

from spatially_aware_ai_tpu.data.synthetic import (
    ColorSegmenter,
    SyntheticScene,
)
from spatially_aware_ai_tpu.manager import InSituManager
from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
from spatially_aware_ai_tpu.models.dgcnn import InSituLearning
from spatially_aware_ai_tpu.server import create_app


class Client:
    """Tiny WSGI test client (requests.post(data=...) semantics)."""

    def __init__(self, app):
        self.app = app

    def request(self, method, path, data=None):
        body = urlencode(data or {}).encode()
        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "CONTENT_TYPE": "application/x-www-form-urlencoded",
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
            "QUERY_STRING": "",
        }
        out = {}

        def start_response(status, headers):
            out["status"] = int(status.split()[0])

        chunks = self.app(environ, start_response)
        payload = b"".join(chunks).decode()
        try:
            payload = json.loads(payload)
        except json.JSONDecodeError:
            pass
        return out["status"], payload

    def post(self, path, data=None):
        return self.request("POST", path, data)

    def get(self, path):
        return self.request("GET", path)


SCENE_PARAMS = {"num_frames": 10, "width": 80, "height": 60}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("server_scene")
    scan_dir = root / "scans"
    out_dir = root / "unity_output"
    for ver, remove in [("v00", []), ("v01", ["red_box"])]:
        d = scan_dir / "demo_scene" / ver
        os.makedirs(d)
        with open(d / "synthetic_scene.json", "w") as f:
            json.dump({**SCENE_PARAMS, "remove": remove}, f)

    engine = ClipEngine.tiny()
    segmenter = ColorSegmenter(SyntheticScene.demo_room())
    insitu = InSituLearning(
        emb_dims=64, k_neighbors=8, num_points=30, batch_size=32,
        epochs=120, lr=0.003, feature_dim=engine.feature_dim,
        model_path=str(out_dir / "demo_scene" / "insitu_model.pth"),
        label_path=str(out_dir / "demo_scene" / "insitu_labels.json"),
        confidence_threshold=0.5,
    )
    manager = InSituManager(
        scan_dir=str(scan_dir),
        scan_name="demo_scene",
        dataset="synthetic",
        output_dir=str(out_dir),
        voxel_size=0.06,
        trunc_vox=2,
        clip_patch_size=40,
        clip_patch_stride=20,
        clip_engine=engine,
        seg_model=segmenter,
        insitu_model=insitu,
        frame_chunk=5,
    )
    client = Client(create_app(manager))
    return manager, client, out_dir


def test_v00_reconstructed(env):
    manager, client, out_dir = env
    assert manager.scene_reconstructed
    # artifact persistence runs on a background thread after fusion; disk
    # assertions (and out-of-process readers) synchronize explicitly
    manager._wait_for_save()
    uo = manager.scene_knowledge["unique_objects"]
    labels = {v["class_label"] for v in uo.values()}
    assert {"chair", "suitcase", "table", "floor-wood"} <= labels
    # artifacts on disk with the reference's names
    vdir = out_dir / "demo_scene" / "v00"
    for name in [
        "scene_knowledge.json", "vertex_clip_feats.npy", "vertex_obj_idx.npy",
        "voxel_clip_feats.npy", "voxel_rgb.npy", "mesh_rgb.ply",
        "mesh_segmentation.ply", "config.yml",
    ]:
        assert (vdir / name).exists(), name


def test_text_query_endpoint(env):
    _, client, _ = env
    status, mesh = client.post(
        "/text_query", {"text_query": "show me the red box"}
    )
    assert status == 200
    assert set(mesh) == {"vertices", "faces", "colors"}
    assert len(mesh["colors"]) == len(mesh["vertices"])
    assert len(mesh["colors"][0]) == 4  # rgba with relevance alpha


def test_scene_knowledge_endpoint(env):
    _, client, _ = env
    status, sk = client.post("/requset_scene_knowledge", {"scan_version": 0})
    assert status == 200
    assert "unique_objects" in sk
    assert sk["scan_version"] == 0


def test_scene_mesh_endpoint(env):
    _, client, _ = env
    status, mesh = client.post(
        "/requset_scene_mesh",
        {"scan_version": 0, "obj_key": "scene", "color": "rgb"},
    )
    assert status == 200
    assert len(mesh["vertices"]) > 100

    status, objs = client.post(
        "/requset_scene_mesh",
        {"scan_version": 0, "obj_key": "all_objects", "color": "rgb"},
    )
    assert status == 200
    assert len(objs) >= 1


def test_full_insitu_lifecycle(env):
    manager, client, _ = env

    # find the suitcase (red box) object id
    uo = manager.scene_knowledge["unique_objects"]
    box_id = next(k for k, v in uo.items() if v["class_label"] == "suitcase")

    # rename it
    status, new_name = client.post(
        "/rename_object", {"object_key": box_id, "new_name": "my_box"}
    )
    assert status == 200
    assert new_name.startswith("my_box")
    assert new_name in manager.scene_knowledge["unique_objects"]

    # memorize for training
    status, _ = client.post(
        "/memorize_objects",
        {"object_list": json.dumps({"items": [new_name]})},
    )
    assert status == 200
    assert new_name in manager.insitu_model.labels

    # train
    status, resp = client.get("/insitu_learn")
    assert status == 200
    assert resp.get("trained")

    # copy_object endpoint (fixed vs reference)
    status, mesh = client.post("/copy_object", {"obj_id": new_name})
    assert status in (200, 404)  # mesh may be None for tiny objects
    if status == 200:
        assert "vertices" in mesh

    # reprocess v01 where the red box was removed from the scene
    status, resp = client.post("/reprocess_scan", {"version": 1})
    assert status == 200

    sk1 = manager.scene_knowledge
    assert sk1["scan_version"] == 1
    assert new_name in sk1["missing_objects"], (
        f"expected {new_name} missing; got missing="
        f"{list(sk1['missing_objects'])}, unique="
        f"{list(sk1['unique_objects'])}"
    )

    # missing-object mesh comes from v0
    status, objs = client.post(
        "/requset_scene_mesh",
        {"scan_version": 1, "obj_key": "missing", "color": "rgb"},
    )
    assert status == 200

    # reset in-situ model
    status, _ = client.post("/reset_insitu_model", {})
    assert status == 200
    assert not manager.insitu_model.model_trained


def test_query_label_bank_tracks_current_scene(env):
    """Regression (round-1 VERDICT weak #4): the query contrast bank must be
    rebuilt from the CURRENT scene after a reprocess, like the reference does
    per query (clip_seem_fusion.py:486-494) — not frozen at first query.

    Runs after test_full_insitu_lifecycle, so the manager sits on v01 where
    the red box ("suitcase") was removed; earlier queries on v00 put
    "suitcase" in the bank and it must now be gone.
    """
    manager, client, _ = env
    assert manager.scene_knowledge["scan_version"] == 1
    status, _ = client.post("/text_query", {"text_query": "a green window"})
    assert status == 200
    current = {
        v["class_label"]
        for v in manager.scene_knowledge["unique_objects"].values()
    }
    assert set(manager.control_objects) == current | {"a green window"}
    assert "suitcase" not in manager.control_objects
    # repeat query with an in-bank label must not grow the bank
    bank_before = list(manager.control_objects)
    status, _ = client.post("/text_query", {"text_query": "a green window"})
    assert status == 200
    assert manager.control_objects == bank_before


def test_unknown_route_404(env):
    _, client, _ = env
    status, _ = client.post("/nope", {})
    assert status == 404


def test_processed_scene_reloads_from_artifacts(env):
    """A fresh manager over the same output dir must reload the processed
    scene from disk without recomputing (reference clip_seem_fusion.py:202-244
    lazy reload)."""
    manager, _, out_dir = env
    manager._wait_for_save()  # m2 reads this manager's artifacts from disk
    engine2 = ClipEngine.tiny()
    m2 = InSituManager(
        scan_dir=manager.config.scan_dir,
        scan_name="demo_scene",
        dataset="synthetic",
        output_dir=str(out_dir),
        voxel_size=0.06,
        trunc_vox=2,
        clip_patch_size=40,
        clip_patch_stride=20,
        clip_engine=engine2,
        seg_model=ColorSegmenter(SyntheticScene.demo_room()),
        insitu_model=manager.insitu_model,
        curr_ver=manager.curr_ver,
        auto_reconstruct=True,  # must be a no-op because artifacts exist
    )
    assert m2.scene_reconstructed
    assert not hasattr(m2, "last_fusion_seconds")  # never ran fusion
    assert len(m2.verts) == len(manager.verts)
    assert m2.scene_knowledge["unique_objects"].keys() == (
        manager.scene_knowledge["unique_objects"].keys()
    )
    # the live manager keeps vertex feats as a bucket-padded DEVICE array
    # (extract_mesh feats_on_device); the artifact holds the exact [V, C]
    np.testing.assert_allclose(
        np.asarray(m2.vert_clip_feat),
        np.asarray(manager.vert_clip_feat)[: len(m2.verts)],
        atol=1e-6,
    )
    # text query works off the reloaded artifacts
    mesh = m2.clip_text_query("the table")
    assert mesh is not None and len(mesh["vertices"]) == len(m2.verts)
    # ... and so does the object ranking (same reloaded state: knowledge
    # json + vertex feats npy + vertex_obj_idx npy)
    ranked = m2.object_text_query("the table")
    assert ranked and {o["object_id"] for o in ranked} == set(
        m2.scene_knowledge["unique_objects"]
    )
