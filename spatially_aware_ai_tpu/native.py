"""Native (C++) runtime components: build-on-demand + ctypes bindings.

The reference gets its host-side performance from third-party native code
(skimage's Cython marching cubes, scipy C kernels; SURVEY.md §2.1). This
framework ships its own: meshing/_native/marching.cpp holds a
marching-tetrahedra extractor and a one-pass union-find connected-components
labeler, built here with g++ -O3 into the package directory and loaded via
ctypes. Everything has a pure-Python fallback (meshing/marching.py,
scene/objects.py), so the native path is an optimization, never a
requirement.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "meshing", "_native",
                    "marching.cpp")
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    # hash every native source (the .cpp includes mc_table.h) so header
    # changes invalidate the cached .so too
    h = hashlib.sha256()
    for src in (_SRC, os.path.join(os.path.dirname(_SRC), "mc_table.h")):
        with open(src, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    so_path = os.path.join(
        os.path.dirname(_SRC), f"libsai_native_{digest}.so"
    )
    if not os.path.exists(so_path):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", so_path,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(so_path)
    extract_sig = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mt_extract.restype = ctypes.c_int
    lib.mt_extract.argtypes = extract_sig
    lib.mc_extract.restype = ctypes.c_int
    lib.mc_extract.argtypes = extract_sig
    lib.mt_free.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)
    ]
    lib.cc_label.restype = ctypes.c_int64
    lib.cc_label.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _LIB_FAILED:
            _LIB = _build_lib()
            _LIB_FAILED = _LIB is None
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _run_extract(fn, lib, vol, level):
    vol = np.ascontiguousarray(vol, np.float32)
    X, Y, Z = vol.shape
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = fn(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        X, Y, Z, ctypes.c_float(level),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(fp), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    try:
        if nv.value == 0:
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
        faces = (
            np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy()
            if nf.value
            else np.zeros((0, 3), np.int64)
        )
        return verts.astype(np.float32), faces.astype(np.int64)
    finally:
        lib.mt_free(vp, fp)


def marching_tetrahedra_native(
    vol: np.ndarray, level: float = 0.0
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ marching tetrahedra; returns None when the library is
    unavailable. Output matches meshing.marching.marching_tetrahedra up to
    vertex/face ordering (both deduplicate by grid edge)."""
    lib = get_lib()
    if lib is None:
        return None
    return _run_extract(lib.mt_extract, lib, vol, level)


def marching_cubes_native(
    vol: np.ndarray, level: float = 0.0
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ classic marching cubes (generated case table, mc_table.h);
    returns None when the library is unavailable. Output matches
    meshing.marching.marching_cubes up to vertex/face ordering."""
    lib = get_lib()
    if lib is None:
        return None
    return _run_extract(lib.mc_extract, lib, vol, level)


def connected_components_native(
    class_grid: np.ndarray, null_id: int = 133
) -> Optional[Tuple[np.ndarray, int]]:
    """One-pass 26-connected union-find labeling of a class-id grid.
    Returns (component-id grid with -1 for null/empty, count) or None."""
    lib = get_lib()
    if lib is None:
        return None
    grid = np.ascontiguousarray(class_grid, np.int32)
    X, Y, Z = grid.shape
    out = np.empty_like(grid)
    count = lib.cc_label(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        X, Y, Z, ctypes.c_int32(null_id),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, int(count)
