"""The WSGI app served over a real loopback socket, hit concurrently — the
reference shares a mutable singleton across Flask threads unguarded; ours
must stay consistent under concurrent queries."""
import json
import os
import threading
import urllib.error
import urllib.parse
import urllib.request
from wsgiref.simple_server import WSGIServer, make_server
import socketserver

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
def server_url(tmp_path_factory):
    root = tmp_path_factory.mktemp("http_scene")
    d = root / "scans" / "demo" / "v00"
    os.makedirs(d)
    with open(d / "synthetic_scene.json", "w") as f:
        json.dump({"num_frames": 6, "width": 64, "height": 48}, f)

    manager = InSituManager(
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
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_http_text_query(server_url):
    status, mesh = post(server_url, "/text_query",
                        {"text_query": "show me the table"})
    assert status == 200
    assert len(mesh["vertices"]) > 0


def test_http_knowledge(server_url):
    status, sk = post(server_url, "/requset_scene_knowledge",
                      {"scan_version": 0})
    assert status == 200
    assert len(sk["unique_objects"]) >= 3


def test_http_404_on_missing_object(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        post(server_url, "/copy_object", {"obj_id": "nope:99"})
    assert exc.value.code == 404


def test_http_concurrent_queries(server_url):
    errors = []

    def worker(q):
        try:
            status, mesh = post(server_url, "/text_query", {"text_query": q})
            assert status == 200
            nv = len(mesh["vertices"])
            assert nv > 0 and len(mesh["colors"]) == nv
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(q,))
        for q in ["a chair", "the floor", "a red box", "a table"] * 2
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors


def test_http_malformed_input_is_400(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        post(server_url, "/text_query", {})  # missing text_query field
    assert exc.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as exc:
        post(server_url, "/reprocess_scan", {"version": "notanint"})
    assert exc.value.code == 400


def test_http_live_scan_lifecycle(server_url):
    """The live streaming endpoints over a real socket: begin -> npz pushes
    -> preview -> end installs a new queryable version."""
    import io
    import urllib.error

    from spatially_aware_ai_tpu.data.synthetic import SyntheticSceneDataset

    ds = SyntheticSceneDataset(num_frames=6, width=64, height=48)
    status, st = post(server_url, "/live_begin", {})
    assert status == 200 and st["state"] == "live"

    for start in (0, 3):
        stack = ds.stacked(range(start, start + 3))
        buf = io.BytesIO()
        np.savez(buf, rgb=stack["rgb"], depth=stack["depth"],
                 pose=stack["pose"], K=stack["K"])
        req = urllib.request.Request(
            server_url + "/live_push", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            st = json.loads(resp.read().decode())
    assert st["frames_seen"] == 6 and st["frames_integrated"] >= 3

    with urllib.request.urlopen(server_url + "/live_preview",
                                timeout=120) as resp:
        pv = json.loads(resp.read().decode())
    assert pv["mesh"] and len(pv["mesh"]["vertices"]) > 0

    status, out = post(server_url, "/live_end", {})
    assert status == 200 and out["state"] == "done"
    assert out["n_objects"] > 0

    # the new version is immediately queryable
    status, mesh = post(server_url, "/text_query",
                        {"text_query": "show me the table"})
    assert status == 200 and len(mesh["vertices"]) > 0

    # empty body -> clean 400
    req = urllib.request.Request(
        server_url + "/live_push", data=b"", method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def _multipart_body(fields, files=None):
    """Build a multipart/form-data body the way Unity's WWWForm / curl -F
    do (the reference's Flask parses these; ours must too)."""
    boundary = "----saiTestBoundary7MA4YWxkTrZu0gW"
    parts = []
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
            f"\r\n\r\n{v}\r\n".encode()
        )
    for k, (fname, blob) in (files or {}).items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"; '
            f'filename="{fname}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n".encode()
            + blob + b"\r\n"
        )
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def test_http_multipart_form(server_url):
    """POSTing forms as multipart/form-data (Unity WWWForm, curl -F) must
    behave identically to urlencoded — the reference's Flask accepts both."""
    body, ctype = _multipart_body({"text_query": "show me the table"})
    req = urllib.request.Request(
        server_url + "/text_query", data=body, method="POST",
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 200
        mesh = json.loads(resp.read().decode())
    assert len(mesh["vertices"]) > 0


def test_multipart_parser_unit():
    from spatially_aware_ai_tpu.server.http import _parse_multipart

    blob = bytes(range(256)) + b"\r\n--not-the-boundary\r\n" + b"\x00" * 64
    body, ctype = _multipart_body(
        {"a": "hello world", "b": "späces & =signs"},
        files={"payload": ("f.bin", blob)},
    )
    form, files = _parse_multipart(body, ctype)
    assert form == {"a": "hello world", "b": "späces & =signs"}
    assert files["payload"] == blob  # binary-exact, CRLF framing stripped

    # quoted boundary spelling (some clients quote it)
    ctype_q = ctype.replace("boundary=", 'boundary="') + '"'
    form2, files2 = _parse_multipart(body, ctype_q)
    assert form2 == form and files2 == files

    # garbage: no boundary param, or truncated body -> empty, no raise
    assert _parse_multipart(body, "multipart/form-data") == ({}, {})
    form3, _ = _parse_multipart(body[: len(body) // 2], ctype)
    assert form3.get("a") == "hello world"


def test_http_live_push_malformed_bodies_are_400(server_url):
    """Fuzz the binary live_push surface: garbage bytes, a valid npz with
    missing keys, and wrong-shape arrays must all be clean 400s (client
    bugs), never 500s (which a headset client would retry forever)."""
    import io

    def post_raw(path, body):
        req = urllib.request.Request(
            server_url + path, data=body, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    # the first three fail body validation before touching session state;
    # the last reaches manager.live_push which rejects it ("no live
    # session") — every malformed path must end as a 400
    assert post_raw("/live_push", b"") == 400
    assert post_raw("/live_push", b"\x89not-an-npz\x00" * 64) == 400
    buf = io.BytesIO()
    np.savez(buf, rgb=np.zeros((2, 8, 8, 3), np.uint8))  # missing keys
    assert post_raw("/live_push", buf.getvalue()) == 400
    buf = io.BytesIO()
    np.savez(buf, rgb=np.zeros((2, 8, 8, 3), np.uint8),
             depth=np.zeros((3, 8, 8), np.uint16),  # frame-count mismatch
             pose=np.stack([np.eye(4, dtype=np.float32)] * 2),
             K=np.stack([np.eye(3, dtype=np.float32)] * 2))
    assert post_raw("/live_push", buf.getvalue()) == 400


def test_multipart_filename_before_name():
    """RFC 7578 mandates no attribute order: a part whose Content-Disposition
    lists filename BEFORE name must still be stored under its field name
    (the unanchored name=\"...\" regex used to match inside filename=...)."""
    from spatially_aware_ai_tpu.server.http import _parse_multipart

    b = "xBOUNDx"
    body = (
        f"--{b}\r\n"
        'Content-Disposition: form-data; filename="payload.bin"; '
        'name="file"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n"
        "DATA\r\n"
        f"--{b}\r\n"
        'Content-Disposition: form-data; filename="x.txt"; name="note"; '
        'dummy="name=\\"decoy\\""\r\n\r\n'
        "hi\r\n"
        f"--{b}--\r\n"
    ).encode()
    form, files = _parse_multipart(body, f"multipart/form-data; boundary={b}")
    assert files == {"file": b"DATA", "note": b"hi"}
    assert form == {}


def test_http_live_push_i420_body(server_url):
    """rgb_i420 push bodies (half the client uplink bytes) must behave
    exactly like pushing the decoded u8 frames: frames are accepted and
    an abort leaves the session clean. Sending both rgb keys, or a
    malformed plane shape, is a clean 400."""
    import io

    from spatially_aware_ai_tpu.core.yuv import rgb_u8_to_i420
    from spatially_aware_ai_tpu.data.synthetic import SyntheticSceneDataset

    def post_npz(path, **arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        req = urllib.request.Request(
            server_url + path, data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read().decode())

    ds = SyntheticSceneDataset(num_frames=3, width=64, height=48)
    stack = ds.stacked(range(3))
    rgb_u8 = np.clip(np.rint(stack["rgb"] * 255.0), 0, 255).astype(np.uint8)
    packed = rgb_u8_to_i420(rgb_u8)
    assert packed.nbytes * 2 == rgb_u8.nbytes  # the uplink win

    status, st = post(server_url, "/live_begin", {})
    assert status == 200 and st["state"] == "live"
    try:
        status, st = post_npz(
            "/live_push", rgb_i420=packed, depth=stack["depth"],
            pose=stack["pose"], K=stack["K"],
        )
        assert status == 200 and st["frames_seen"] == 3

        # both keys -> 400; bad plane height -> 400; session is untouched
        status, err = post_npz(
            "/live_push", rgb=rgb_u8, rgb_i420=packed,
            depth=stack["depth"], pose=stack["pose"], K=stack["K"],
        )
        assert status == 400 and "not both" in err["error"]
        status, err = post_npz(
            "/live_push", rgb_i420=packed[:, :-1], depth=stack["depth"],
            pose=stack["pose"], K=stack["K"],
        )
        assert status == 400
        with urllib.request.urlopen(
            server_url + "/live_status", timeout=60
        ) as resp:
            st = json.loads(resp.read().decode())
        assert st["frames_seen"] == 3
    finally:
        post(server_url, "/live_abort", {})
