"""Atomic artifact writes (tmp + os.replace) for every on-disk artifact.

The reference writes artifacts in place (np.save / o3d write at the final
path, reference handy_utils.py:178-211 names the files); with any
concurrent reader — a second manager instance, a lazy reload racing an
async save, a crashed writer — that leaves torn files. Observed in round 2
as a half-written .npy read (`ValueError: cannot reshape array of size
...` from numpy's format reader). Every writer in this framework goes
through these helpers: the artifact either doesn't exist yet or is a
complete previous/next version, never a partial one.

os.replace is atomic on POSIX when src and dst are on the same filesystem,
which `atomic_path` guarantees by creating the temp file in the
destination directory.
"""
from __future__ import annotations

import contextlib
import json
import os
import pickle
import tempfile


@contextlib.contextmanager
def atomic_path(path: str):
    """Yield a same-directory temp path; os.replace it onto `path` on
    success, unlink it on failure. Readers of `path` can never observe a
    partial write."""
    path = os.fspath(path)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=d, prefix=os.path.basename(path) + ".", suffix=".tmp"
    )
    os.close(fd)
    # mkstemp creates 0600 and os.replace preserves it; artifacts written
    # through plain open() were umask-default (typically 0644). Restore the
    # umask-default mode so a different unix user (file server, second
    # manager) can still read the artifacts.
    umask = os.umask(0)
    os.umask(umask)
    with contextlib.suppress(OSError):
        os.chmod(tmp, 0o666 & ~umask)
    try:
        yield tmp
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(OSError):
            os.remove(tmp)
        raise


def atomic_save_npy(path: str, arr):
    import numpy as np

    with atomic_path(path) as tmp:
        with open(tmp, "wb") as f:  # file handle: np.save can't append .npy
            np.save(f, np.asarray(arr))


def atomic_savez(path: str, compressed: bool = False, durable: bool = False,
                 **arrays):
    import numpy as np

    saver = np.savez_compressed if compressed else np.savez
    with atomic_path(path) as tmp:
        with open(tmp, "wb") as f:
            saver(f, **arrays)
            if durable:  # fsync before the rename (OS-crash durability)
                f.flush()
                os.fsync(f.fileno())


def atomic_json_dump(path: str, obj, **kwargs):
    with atomic_path(path) as tmp:
        with open(tmp, "w") as f:
            json.dump(obj, f, **kwargs)


def atomic_pickle_dump(path: str, obj):
    with atomic_path(path) as tmp:
        with open(tmp, "wb") as f:
            pickle.dump(obj, f)
