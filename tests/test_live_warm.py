"""Live-session executable pre-warm (manager/live.py:_warm_end_programs,
r2 VERDICT next #7): the end()-path programs (finalize, preview finalize,
vertex samplers, query normalizer) compile in the background right after
the first integrated chunk, overlapped with the scanning period."""
import time

import pytest

from tests.test_live_scan import _frames, make_manager


@pytest.fixture()
def manager(tmp_path):
    return make_manager(tmp_path)


def test_warm_runs_after_first_chunk(manager):
    rgb, depth, pose, K = _frames(6)
    st = manager.live_begin()
    assert st["warm"] == "pending"

    # buffered frame only: no grid, no warm yet
    st = manager.live_push(rgb[0], depth[0], pose[0], K[0])
    sess = manager._live
    assert sess._warm_thread is None

    # crossing the chunk boundary allocates the grid and kicks the warm
    st = manager.live_push(rgb[1:4], depth[1:4], pose[1:4], K[1:4])
    assert st["grid_allocated"]
    assert sess._warm_thread is not None
    deadline = time.time() + 120
    while sess.warm_state == "pending" and time.time() < deadline:
        time.sleep(0.05)
    assert sess.warm_state == "done", sess.warm_state
    assert manager.live_status()["warm"] == "done"

    # end() joins cleanly and the lifecycle completes as usual
    out = manager.live_end()
    assert out["state"] == "done" and out["n_vertices"] > 0


def test_warm_disabled_by_env(manager, monkeypatch):
    monkeypatch.setenv("SAI_LIVE_WARM", "0")
    rgb, depth, pose, K = _frames(4)
    st = manager.live_begin()
    assert st["warm"] == "off"
    manager.live_push(rgb, depth, pose, K)
    sess = manager._live
    assert sess._warm_thread is None and sess.warm_state == "off"
    out = manager.live_end()
    assert out["state"] == "done"


def test_quick_end_before_warm_finishes(manager):
    """end() immediately after the first chunk must not deadlock on the
    warm join (the thread never takes the session lock)."""
    rgb, depth, pose, K = _frames(4)
    manager.live_begin()
    manager.live_push(rgb[:3], depth[:3], pose[:3], K[:3])
    out = manager.live_end()
    assert out["state"] == "done"
