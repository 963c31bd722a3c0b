"""Pure-numpy PLY I/O (binary little-endian + ascii), replacing the
reference's open3d/trimesh dependency (it only used them for mesh containers
and PLY read/write, e.g. clipfusion.py:1172-1177, handy_utils.py:224-241).
"""
from __future__ import annotations

import io
from typing import Optional, Tuple

import numpy as np


def write_ply(
    path: str,
    vertices: np.ndarray,
    faces: Optional[np.ndarray] = None,
    vertex_colors: Optional[np.ndarray] = None,
    binary: bool = True,
):
    """Write a triangle mesh (or point cloud if faces is None).

    vertex_colors: float in [0, 1] ([V, 3] or [V, 4]) or uint8; written as
    uchar red/green/blue[/alpha] like trimesh/open3d do.
    """
    vertices = np.asarray(vertices, np.float32)
    V = len(vertices)
    has_color = vertex_colors is not None
    if has_color:
        c = np.asarray(vertex_colors)
        if c.dtype != np.uint8:
            c = np.clip(np.asarray(c, np.float64) * 255.0, 0, 255).astype(np.uint8)
        if c.ndim != 2 or c.shape[0] != V:
            raise ValueError("vertex_colors must be [V, 3] or [V, 4]")
        nchan = c.shape[1]
    else:
        c = None
        nchan = 0

    F = 0 if faces is None else len(faces)

    header = ["ply"]
    header.append("format binary_little_endian 1.0" if binary else "format ascii 1.0")
    header.append(f"element vertex {V}")
    header += ["property float x", "property float y", "property float z"]
    if has_color:
        names = ["red", "green", "blue", "alpha"][:nchan]
        header += [f"property uchar {n}" for n in names]
    if faces is not None:
        header.append(f"element face {F}")
        header.append("property list uchar int vertex_indices")
    header.append("end_header")

    # atomic: meshes are served to live clients while reprocess rewrites
    # them; a reader must never see a torn PLY (utils/atomic.py)
    from ..utils.atomic import atomic_path

    with atomic_path(path) as tmp, open(tmp, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            if has_color:
                vert_dtype = np.dtype(
                    [("xyz", "<f4", 3), ("c", "u1", nchan)]
                )
                rec = np.empty(V, vert_dtype)
                rec["xyz"] = vertices
                rec["c"] = c
            else:
                rec = vertices.astype("<f4")
            f.write(rec.tobytes())
            if faces is not None:
                face_dtype = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
                frec = np.empty(F, face_dtype)
                frec["n"] = 3
                frec["idx"] = np.asarray(faces, np.int32)
                f.write(frec.tobytes())
        else:
            buf = io.StringIO()
            for i in range(V):
                row = " ".join(f"{x:.6f}" for x in vertices[i])
                if has_color:
                    row += " " + " ".join(str(int(x)) for x in c[i])
                buf.write(row + "\n")
            if faces is not None:
                for face in np.asarray(faces, np.int64):
                    buf.write("3 " + " ".join(str(int(v)) for v in face) + "\n")
            f.write(buf.getvalue().encode("ascii"))


_PLY_TYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Read a PLY mesh -> (vertices [V,3] f32, faces [F,3] i64,
    vertex_colors [V, 3|4] f32 in [0,1] or None).

    Supports binary little-endian and ascii files with the property layouts
    this framework (and trimesh/open3d defaults) produce.
    """
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header")
    if header_end < 0:
        raise ValueError("not a PLY file (no end_header)")
    header_end = data.find(b"\n", header_end) + 1
    header_lines = data[:header_end].decode("ascii", "replace").splitlines()

    fmt = None
    elements = []  # (name, count, [(prop_name, dtype) or ('__list__', ...)])
    for line in header_lines:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append([parts[1], int(parts[2]), []])
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("__list__", _PLY_TYPES[parts[2]],
                                        _PLY_TYPES[parts[3]], parts[4]))
            else:
                elements[-1][2].append((parts[-1], _PLY_TYPES[parts[1]]))

    verts = np.zeros((0, 3), np.float32)
    faces = np.zeros((0, 3), np.int64)
    colors = None

    if fmt == "ascii":
        text = data[header_end:].decode("ascii").split("\n")
        cursor = 0
        for name, count, props in elements:
            rows = text[cursor : cursor + count]
            cursor += count
            if name == "vertex":
                arr = np.loadtxt(io.StringIO("\n".join(rows)), ndmin=2)
                cols = [p[0] for p in props]
                verts = arr[:, [cols.index("x"), cols.index("y"), cols.index("z")]]
                verts = verts.astype(np.float32)
                if "red" in cols:
                    idx = [cols.index(k) for k in ("red", "green", "blue")]
                    if "alpha" in cols:
                        idx.append(cols.index("alpha"))
                    colors = arr[:, idx].astype(np.float32) / 255.0
            elif name == "face":
                arr = np.loadtxt(io.StringIO("\n".join(rows)), ndmin=2)
                faces = arr[:, 1:4].astype(np.int64)
        return verts, faces, colors

    if fmt != "binary_little_endian":
        raise ValueError(f"unsupported PLY format: {fmt}")

    offset = header_end
    for name, count, props in elements:
        if any(p[0] == "__list__" for p in props):
            if len(props) != 1:
                raise ValueError("mixed list/scalar properties unsupported")
            _, cnt_t, idx_t, _ = props[0]
            cnt_size = np.dtype(cnt_t).itemsize
            idx_size = np.dtype(idx_t).itemsize
            if count > 0:
                n0 = int(np.frombuffer(data, f"<{cnt_t}", 1, offset)[0])
                stride = cnt_size + n0 * idx_size
                rec = np.frombuffer(
                    data, np.dtype(
                        [("n", f"<{cnt_t}"), ("idx", f"<{idx_t}", n0)]
                    ), count, offset,
                )
                if not (rec["n"] == n0).all():
                    raise ValueError("variable-length face lists unsupported")
                offset += count * stride
                if name == "face":
                    faces = rec["idx"][:, :3].astype(np.int64)
        else:
            dt = np.dtype([(p[0], f"<{p[1]}") for p in props])
            rec = np.frombuffer(data, dt, count, offset)
            offset += count * dt.itemsize
            if name == "vertex":
                verts = np.stack(
                    [rec["x"], rec["y"], rec["z"]], axis=-1
                ).astype(np.float32)
                names = [p[0] for p in props]
                if "red" in names:
                    chans = ["red", "green", "blue"]
                    if "alpha" in names:
                        chans.append("alpha")
                    cols = np.stack([rec[k] for k in chans], axis=-1)
                    colors = (
                        cols.astype(np.float32) / 255.0
                        if cols.dtype == np.uint8
                        else cols.astype(np.float32)
                    )
    return verts, faces, colors
