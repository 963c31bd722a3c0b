"""The Unity-facing HTTP API: the same 10 endpoints (same spellings,
including the historical `requset_*` typos that are part of the client
contract) as the reference's Flask app (app_unity.py).

Endpoint map (reference app_unity.py:27-194):
  POST /reprocess_scan          {version}
  POST /text_query              {text_query}  ("show me " prefix stripped)
  POST /requset_scene_mesh      {scan_version, obj_key, color}
  POST /requset_scene_knowledge {scan_version}
  POST /merge_objects           {object_list: '{"items": [...]}', new_name}
  POST /rename_object           {object_key, new_name}
  POST /memorize_objects        {object_list}
  GET  /insitu_learn
  POST /copy_object             {obj_id}   (implemented here; broken upstream)
  POST /reset_insitu_model

Beyond parity:
  POST /reprocess_scan_async    {version}  non-blocking rebuild; the previous
                                           version stays queryable meanwhile
  GET  /scan_status                        background-job progress
  GET  /scan_preview                       coarse mid-scan preview mesh
  POST /live_begin              streaming scan: frames integrate on arrival
  POST /live_push               (npz body) push frames to the live session
  GET  /live_status, /live_preview         live progress / growing mesh
  POST /live_end                finish: persist + post-process + install
  POST /live_abort              discard the live session (incl. staged frames)
  POST /live_recover            crashed-session staged frames -> new version
  POST /live_resume             crashed-session staged frames -> continue live
  POST /live_snapshot           checkpoint the live grid for instant resume
  POST /request_scene_mesh, /request_scene_knowledge — correctly-spelled
       aliases for the typo'd contract endpoints

Default port 3291 like the reference (app_unity.py:198).
"""
from __future__ import annotations

import json
import time

from ..manager.paths import get_path
from ..scene.objects import mark_object_of_interest, merge_objects
from .http import App


def create_app(manager_or_registry) -> App:
    """Build the WSGI app over a single InSituManager (the reference's
    shape) or a manager.registry.SceneRegistry (multi-scene serving: every
    endpoint accepts an optional `scene` form/query field; requests
    without it hit the registry's default scene, so single-scene clients
    work unchanged)."""
    from ..manager.registry import SceneRegistry

    registry = (
        manager_or_registry
        if isinstance(manager_or_registry, SceneRegistry) else None
    )
    single = None if registry is not None else manager_or_registry

    def _m(req):
        """Per-request manager. With a registry the optional `scene` field
        routes (unknown scene -> ValueError -> 400 with the scene list).
        A bare manager accepts requests without the field (reference
        contract) or naming ITS scene; any other scene is a 400 — silently
        serving the wrong scene's data would hide a misconfigured client."""
        scene = req.form.get("scene")
        if registry is None:
            if scene and scene != single.config.scan_name:
                raise ValueError(
                    f"this server hosts only scene "
                    f"{single.config.scan_name!r} (started without "
                    f"--multi-scene); cannot route to {scene!r}"
                )
            return single
        return registry.get(scene)

    app = App()

    @app.route("/scenes", methods=["GET"])
    def scenes(req):
        """Multi-scene discovery: scenes on disk + loaded serving state.
        Single-manager deployments report their one scene."""
        if registry is None:
            return {
                "scenes": [single.config.scan_name],
                "default": single.config.scan_name,
                "loaded": {
                    single.config.scan_name: {
                        "version": single.curr_ver,
                        "reconstructed": bool(single.scene_reconstructed),
                        "objects": len(
                            (single.scene_knowledge or {}).get(
                                "unique_objects", {}
                            )
                        ),
                    }
                },
            }, 200
        return registry.status(), 200

    @app.route("/reprocess_scan", methods=["POST"])
    def reprocess_scan(req):
        manager = _m(req)
        start = time.time()
        version = int(req.form["version"])
        manager.update_config(version)
        manager.run_clipfusion(
            scan_dir=manager.config.scene_inputdir, curr_ver=version
        )
        manager.save_files_and_broadcast(new_scene=True)
        return {"message": "success",
                "processing_time_s": round(time.time() - start, 3)}, 200

    @app.route("/reprocess_scan_async", methods=["POST"])
    def reprocess_scan_async(req):
        """Non-blocking reprocess (beyond parity): starts the rebuild on a
        background thread; the previous version stays queryable until the new
        scene is swapped in. Poll GET /scan_status."""
        manager = _m(req)
        version = int(req.form["version"])
        job = manager.reprocess_scan_async(version)
        return job, (409 if job.get("already_running") else 200)

    @app.route("/scan_status", methods=["GET"])
    def scan_status(req):
        manager = _m(req)
        return manager.scan_status(), 200

    @app.route("/scan_preview", methods=["GET"])
    def scan_preview(req):
        """Coarse mid-scan preview mesh of a running background rebuild."""
        manager = _m(req)
        return manager.scan_preview(), 200

    # -- live streaming scans (beyond parity; manager/live.py) ------------

    @app.route("/live_begin", methods=["POST"])
    def live_begin(req):
        """Open a streaming-scan session (optional form: voxel_size,
        margin_m, discard_staged=1 to drop a crashed session's staged
        frames)."""
        manager = _m(req)
        vs = req.form.get("voxel_size")
        margin = req.form.get("margin_m")
        return manager.live_begin(
            float(vs) if vs else None,
            float(margin) if margin else 1.0,
            discard_staged=req.form.get("discard_staged") == "1",
        ), 200

    @app.route("/live_recover", methods=["POST"])
    def live_recover(req):
        """Persist a crashed live session's staged frames as a new scan
        version (then POST /reprocess_scan with that version)."""
        manager = _m(req)
        return manager.live_recover(), 200

    @app.route("/live_resume", methods=["POST"])
    def live_resume(req):
        """Rebuild a crashed live session from its staged frames and keep
        streaming (exact replay — the fusion is order-independent)."""
        manager = _m(req)
        return manager.live_resume(), 200

    @app.route("/live_push", methods=["POST"])
    def live_push(req):
        """Stream frames: body = npz bytes with rgb [F,H,W,3] u8 (or f32
        [0,1]), depth [F,H,W] u16 mm (or f32 m), pose [F,4,4], K [F,3,3].
        Depth may instead be the sensor's NATIVE low-res frame
        [F, H/s, W/s] for an integer s (iPhone: 256x192): the cubic
        enlarge runs on device and the push body shrinks ~16x on the
        depth term (manager/live.py:push). RGB may instead arrive as
        `rgb_i420` [F, H + H//2, W] u8 packed 4:2:0 in rgb_u8_to_i420's
        convention (cv2 analog-scaled BT.601 full-range, core/yuv.py —
        what cli.client --i420 produces; camera-native video-range YUV
        must be transcoded client-side) — HALF the rgb bytes on the
        client uplink. yuv420-transfer sessions keep the planes packed
        end-to-end (staged + uploaded verbatim, decoded on device); u8
        sessions decode once at the session boundary. Send QUANTIZED
        frames and small chunks: bodies over the 64 MB cap are rejected
        (u8/u16 keeps even large chunks far under it)."""
        manager = _m(req)
        import io

        import numpy as np

        if not req.body:
            raise ValueError("empty body; expected an npz of frames")
        if req.truncated:
            raise ValueError(
                "body exceeds the 64 MB cap; push fewer frames per "
                "request or send quantized (uint8 rgb / uint16 mm depth) "
                "arrays"
            )
        try:
            z = np.load(io.BytesIO(req.body))
        except Exception:
            raise ValueError(
                "body is not a readable npz archive of "
                "rgb/depth/pose/K arrays"
            )
        with z:
            if "rgb_i420" in z.files:
                if "rgb" in z.files:
                    raise ValueError(
                        "send either rgb or rgb_i420, not both"
                    )
                # no decode in the HTTP handler (1-vCPU host, serialized
                # with the device client's RPC work): the session decides —
                # yuv420-transfer sessions keep the planes packed all the
                # way to the device (stage + upload verbatim, decode on
                # device), u8 sessions decode once at the session boundary
                planes = z["rgb_i420"]
                if planes.ndim not in (2, 3):
                    # malformed body must be a 400, not an IndexError 500
                    raise ValueError(
                        f"rgb_i420 expects [F, H + H//2, W] u8 planes "
                        f"(or a single [H + H//2, W] frame), got shape "
                        f"{planes.shape}"
                    )
                # pass through UNBATCHED: push promotes all four arrays
                # together when the planes are a single frame (lifting
                # only rgb here would desync it from depth/pose/K)
                return manager.live_push(
                    planes, z["depth"], z["pose"], z["K"],
                    rgb_i420_height=planes.shape[-2] * 2 // 3,
                ), 200
            return manager.live_push(
                z["rgb"], z["depth"], z["pose"], z["K"]
            ), 200

    @app.route("/live_abort", methods=["POST"])
    def live_abort(req):
        """Discard the live session without installing anything."""
        manager = _m(req)
        return manager.live_abort(), 200

    @app.route("/live_snapshot", methods=["POST"])
    def live_snapshot(req):
        """Checkpoint the live GRID so a post-crash /live_resume restores
        it directly instead of re-integrating every staged frame. Costs one
        device->host grid transfer; call at natural pauses of long scans."""
        manager = _m(req)
        return manager.live_snapshot(), 200

    @app.route("/live_status", methods=["GET"])
    def live_status(req):
        manager = _m(req)
        return manager.live_status(), 200

    @app.route("/live_preview", methods=["GET"])
    def live_preview(req):
        """Coarse geometry mesh of the scan streamed so far."""
        manager = _m(req)
        return manager.live_preview(), 200

    @app.route("/live_objects", methods=["GET"])
    def live_objects(req):
        """Mid-stream object inventory: instances discovered in the grid so
        far (class, voxel count, world centroid, in-situ recognitions) —
        objects appear while the user is still scanning."""
        manager = _m(req)
        return manager.live_objects(), 200

    @app.route("/live_end", methods=["POST"])
    def live_end(req):
        """Finish the stream: the scan becomes a regular version (persisted
        frames + full post-processing) and is installed atomically."""
        manager = _m(req)
        return manager.live_end(), 200

    @app.route("/text_query", methods=["POST"])
    def text_query(req):
        manager = _m(req)
        text = req.form["text_query"]
        if text.startswith("show me "):
            text = text[8:]
        mesh_json = manager.clip_text_query(text)
        if mesh_json is None:
            return {"error": "no object found"}, 404
        return mesh_json, 200

    @app.route("/object_query", methods=["POST"])
    def object_query(req):
        """Rank the scene's object instances by a text query (extension
        beyond the reference's /text_query heatmap): returns object ids +
        class labels + softmax scores, best first, so clients can jump
        straight to the matching object (then fetch its mesh via
        /requset_scene_mesh or /copy_object)."""
        manager = _m(req)
        text = req.form["text_query"]
        if text.startswith("show me "):
            text = text[8:]
        top_k = int(req.form.get("top_k", 0))
        ranked = manager.object_text_query(text, top_k=top_k)
        if ranked is None:
            return {"error": "no scene reconstructed yet"}, 404
        return {"query": text, "objects": ranked}, 200

    @app.route("/requset_scene_mesh", methods=["POST"])
    @app.route("/request_scene_mesh", methods=["POST"])  # spelled alias
    def requset_scene_mesh(req):
        manager = _m(req)
        scan_version = int(req.form["scan_version"])
        obj_key = req.form["obj_key"]
        mesh_type = req.form["color"]
        mesh_dict = manager.request_mesh(scan_version, obj_key, mesh_type)
        if mesh_dict is None:
            return {"error": "no object found"}, 404
        return mesh_dict, 200

    @app.route("/requset_scene_knowledge", methods=["POST"])
    @app.route("/request_scene_knowledge", methods=["POST"])  # spelled alias
    def requset_scene_knowledge(req):
        manager = _m(req)
        scan_version = int(req.form["scan_version"])
        json_path = get_path(manager.config, scan_version, "scene_knowledge")
        with open(json_path) as f:
            scene_knowledge = json.load(f)
        manager.update_config(scan_version)
        return scene_knowledge, 200

    @app.route("/merge_objects", methods=["POST"])
    def client_merge_objects(req):
        manager = _m(req)
        object_list = json.loads(req.form["object_list"])["items"]
        new_name = req.form["new_name"]
        with manager.lock:
            new_name, manager.scene_knowledge = merge_objects(
                manager.scene_knowledge,
                manager.vertex_obj_idx,
                manager.insitu_model,
                object_list,
                new_name,
            )
            manager.save_files_and_broadcast(new_scene=False)
        return new_name, 200

    @app.route("/rename_object", methods=["POST"])
    def client_rename_object(req):
        manager = _m(req)
        object_key = req.form["object_key"]
        new_name = req.form["new_name"]
        with manager.lock:
            new_name, manager.scene_knowledge = merge_objects(
                manager.scene_knowledge,
                manager.vertex_obj_idx,
                manager.insitu_model,
                [object_key],
                new_name,
            )
            manager.save_files_and_broadcast(new_scene=False)
        return new_name, 200

    @app.route("/memorize_objects", methods=["POST"])
    def memorize_objects(req):
        manager = _m(req)
        object_list = json.loads(req.form["object_list"])["items"]
        with manager.lock:
            manager.scene_knowledge = mark_object_of_interest(
                manager.scene_knowledge, manager.insitu_model, object_list
            )
            manager.save_files_and_broadcast(new_scene=False)
        return {"message": "success"}, 200

    @app.route("/insitu_learn", methods=["GET"])
    def insitu_learn(req):
        manager = _m(req)
        with manager.lock:
            manager.save_files_and_broadcast(new_scene=False)
            stats = manager.insitu_prepare_and_train()
        return {"message": "success", **stats}, 200

    @app.route("/copy_object", methods=["POST"])
    def copy_object(req):
        manager = _m(req)
        obj_id = req.form["obj_id"]
        mesh_json = manager.unity_copy_object(obj_id)
        if mesh_json is None:
            return {"error": "no object found"}, 404
        return mesh_json, 200

    @app.route("/reset_insitu_model", methods=["POST"])
    def reset_insitu_model(req):
        manager = _m(req)
        manager.insitu_model.reset_model(delete_weights=True)
        return {"message": "success"}, 200

    return app


def serve(manager, host: str = "0.0.0.0", port: int = 3291):
    """Threaded WSGI server (the manager serializes scene mutation with its
    own lock, unlike the reference's unguarded shared singleton)."""
    import socketserver
    from wsgiref.simple_server import WSGIServer, make_server

    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True

    app = create_app(manager)
    httpd = make_server(host, port, app, server_class=ThreadingWSGIServer)
    print(f"serving on {host}:{port}")
    httpd.serve_forever()
