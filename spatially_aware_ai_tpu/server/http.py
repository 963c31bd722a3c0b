"""Minimal WSGI micro-framework (stdlib only).

The reference serves through Flask (app_unity.py); Flask is not part of this
framework's dependency set, so this module provides the tiny slice of it the
API needs: routing by (method, path), form parsing (urlencoded, JSON, and
multipart/form-data — Unity's WWWForm posts multipart, and the reference's
Flask accepts it), and JSON responses. The WSGI app composes with any server
(wsgiref's ThreadingWSGIServer in serve(), or gunicorn etc. in production).
"""
from __future__ import annotations

import json
import re
import traceback
from typing import Callable, Dict, Tuple
from urllib.parse import parse_qs


MAX_BODY_BYTES = 64 * 1024 * 1024  # mesh JSON payloads are large; cap abuse

# `name=` must be anchored at a parameter boundary: a bare name="..." match
# also hits the substring inside `filename="..."`, so a part whose
# Content-Disposition lists filename BEFORE name (RFC 7578 mandates no
# attribute order) would be stored under its filename instead of its field
# name.
_DISP_NAME = re.compile(r'(?:^|;\s*)name="([^"]*)"')
_DISP_FILENAME = re.compile(r'(?:^|;\s*)filename="([^"]*)"')


def _parse_multipart(body: bytes, ctype: str):
    """multipart/form-data -> (text fields dict, file parts dict).

    The tiny subset Flask's request.form/request.files covers for this API:
    boundary split, per-part Content-Disposition name/filename, text fields
    utf-8-decoded, file parts kept as raw bytes. Python 3.13 dropped the
    stdlib `cgi` parser, so this is hand-rolled (RFC 7578 framing:
    `--boundary\\r\\n headers \\r\\n\\r\\n payload \\r\\n ... --boundary--`).
    """
    m = re.search(r'boundary="?([^";]+)"?', ctype)
    if not m:
        return {}, {}
    delim = b"--" + m.group(1).encode("latin-1")
    form: Dict[str, str] = {}
    files: Dict[str, bytes] = {}
    for chunk in body.split(delim)[1:]:
        if chunk[:2] == b"--":  # closing delimiter
            break
        part = chunk[2:] if chunk[:2] == b"\r\n" else chunk
        head, sep, payload = part.partition(b"\r\n\r\n")
        if not sep:
            continue
        payload = payload[:-2] if payload[-2:] == b"\r\n" else payload
        disp = ""
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"content-disposition"):
                disp = line.decode("utf-8", "replace")
        name_m = _DISP_NAME.search(disp)
        if not name_m:
            continue
        name = name_m.group(1)
        if _DISP_FILENAME.search(disp):
            files[name] = payload
        else:
            form[name] = payload.decode("utf-8", "replace")
    return form, files


class Request:
    def __init__(self, environ):
        self.environ = environ
        self.method = environ.get("REQUEST_METHOD", "GET").upper()
        self.path = environ.get("PATH_INFO", "/")
        try:
            declared = int(environ.get("CONTENT_LENGTH") or 0)
        except ValueError:
            declared = 0
        length = min(declared, MAX_BODY_BYTES)
        # handlers consuming raw bodies must check this: a silently
        # truncated binary payload would otherwise surface as an opaque
        # parse failure deep inside the handler
        self.truncated = declared > MAX_BODY_BYTES
        body = environ["wsgi.input"].read(length) if length else b""
        self.body = body
        self.form: Dict[str, str] = {}
        self.files: Dict[str, bytes] = {}
        ctype = environ.get("CONTENT_TYPE", "")
        if ctype.lstrip().lower().startswith("multipart/form-data"):
            self.form, self.files = _parse_multipart(body, ctype)
        elif "json" in ctype:
            try:
                data = json.loads(body.decode("utf-8") or "{}")
                if isinstance(data, dict):
                    self.form = {
                        k: v if isinstance(v, str) else json.dumps(v)
                        for k, v in data.items()
                    }
            except json.JSONDecodeError:
                pass
        elif "octet-stream" not in ctype:  # binary bodies stay raw in .body
            parsed = parse_qs(body.decode("utf-8", "replace"),
                              keep_blank_values=True)
            self.form = {k: v[0] for k, v in parsed.items()}
        qs = parse_qs(environ.get("QUERY_STRING", ""), keep_blank_values=True)
        for k, v in qs.items():
            self.form.setdefault(k, v[0])


_STATUS = {
    200: "200 OK",
    201: "201 Created",
    400: "400 Bad Request",
    404: "404 Not Found",
    405: "405 Method Not Allowed",
    409: "409 Conflict",
    500: "500 Internal Server Error",
}


class App:
    def __init__(self):
        self.routes: Dict[Tuple[str, str], Callable] = {}

    def route(self, path: str, methods=("GET",)):
        def deco(fn):
            for m in methods:
                self.routes[(m.upper(), path)] = fn
            return fn

        return deco

    def __call__(self, environ, start_response):
        req = Request(environ)
        handler = self.routes.get((req.method, req.path))
        if handler is None:
            if any(p == req.path for (_, p) in self.routes):
                payload, status = {"error": "method not allowed"}, 405
            else:
                payload, status = {"error": "not found"}, 404
        else:
            try:
                result = handler(req)
                payload, status = (
                    result if isinstance(result, tuple) else (result, 200)
                )
            except (KeyError, ValueError) as e:
                # malformed client input (missing form field, bad int...)
                payload, status = {"error": f"{type(e).__name__}: {e}"}, 400
            except Exception as e:  # surface as a 500 JSON error
                traceback.print_exc()
                payload, status = {"error": f"{type(e).__name__}: {e}"}, 500

        if isinstance(payload, (dict, list)):
            body = json.dumps(payload).encode("utf-8")
            ctype = "application/json"
        else:
            body = str(payload).encode("utf-8")
            ctype = "text/plain; charset=utf-8"
        start_response(
            _STATUS.get(status, f"{status} Unknown"),
            [("Content-Type", ctype), ("Content-Length", str(len(body)))],
        )
        return [body]
