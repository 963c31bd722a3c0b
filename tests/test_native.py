"""Native C++ components vs their Python reference implementations."""
import numpy as np
import pytest

from spatially_aware_ai_tpu import native
from spatially_aware_ai_tpu.meshing.marching import marching_tetrahedra
from spatially_aware_ai_tpu.scene.objects import connected_components_3d
from spatially_aware_ai_tpu.scene.colors import NULL_CLASS_ID

from test_meshing import sphere_sdf

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native build unavailable"
)

RNG = np.random.default_rng(77)


def mesh_edge_set(verts, faces):
    """Geometry signature independent of vertex ordering: the set of
    rounded triangle centroids."""
    tri = verts[faces]  # [F, 3, 3]
    cent = tri.mean(axis=1)
    return {tuple(np.round(c, 4)) for c in cent}


def test_native_marching_matches_numpy_sphere():
    vol = sphere_sdf()
    v_np, f_np = marching_tetrahedra(vol)
    out = native.marching_tetrahedra_native(vol)
    assert out is not None
    v_cc, f_cc = out
    assert len(v_cc) == len(v_np)
    assert len(f_cc) == len(f_np)
    assert mesh_edge_set(v_cc, f_cc) == mesh_edge_set(v_np, f_np)


def test_native_marching_nan_and_random():
    vol = RNG.normal(size=(12, 11, 10)).astype(np.float32)
    vol[5:8, 5:8, 5:8] = np.nan
    v_np, f_np = marching_tetrahedra(vol)
    v_cc, f_cc = native.marching_tetrahedra_native(vol)
    assert len(v_cc) == len(v_np)
    assert len(f_cc) == len(f_np)
    assert mesh_edge_set(v_cc, f_cc) == mesh_edge_set(v_np, f_np)
    assert np.isfinite(v_cc).all()


def test_native_marching_empty():
    v, f = native.marching_tetrahedra_native(
        np.ones((5, 5, 5), np.float32)
    )
    assert len(v) == 0 and len(f) == 0


def test_native_cc_matches_scipy_path():
    grid = np.full((14, 13, 12), NULL_CLASS_ID, np.int32)
    grid[1:4, 1:4, 1:4] = 5
    grid[6:9, 1:3, 1:3] = 5
    grid[2:5, 5:8, 2:6] = 20
    grid[10, 10, 10] = 7
    grid[0, 0, 11] = -1

    native_out = native.connected_components_native(grid, NULL_CLASS_ID)
    assert native_out is not None
    comp_grid, count = native_out
    assert count == 4
    assert comp_grid[0, 0, 11] == -1
    assert (comp_grid[grid == NULL_CLASS_ID] == -1).all()

    # full path equality (connected_components_3d prefers native; compare
    # against the scipy implementation by membership + order)
    comps = connected_components_3d(grid)
    import scipy.ndimage

    expected = []
    for cid in np.unique(grid):
        if cid in (NULL_CLASS_ID, -1):
            continue
        lab, n = scipy.ndimage.label(grid == cid, structure=np.ones((3, 3, 3)))
        for k in range(1, n + 1):
            vox = np.nonzero(lab == k)
            first = np.ravel_multi_index(
                (vox[0][0], vox[1][0], vox[2][0]), grid.shape
            )
            expected.append((int(cid), vox, first))
    expected.sort(key=lambda e: e[2])

    assert len(comps) == len(expected)
    for (c1, v1), (c2, v2, _) in zip(comps, expected):
        assert c1 == c2
        np.testing.assert_array_equal(np.sort(np.stack(v1).T, axis=0),
                                      np.sort(np.stack(v2).T, axis=0))


def test_native_cc_random_fuzz():
    grid = RNG.integers(0, 4, size=(10, 10, 10)).astype(np.int32)
    grid[grid == 3] = NULL_CLASS_ID
    comp_grid, count = native.connected_components_native(grid, NULL_CLASS_ID)
    # every component must be uniform in class and internally 26-connected
    for cid in range(count):
        vox = np.argwhere(comp_grid == cid)
        classes = {int(grid[tuple(v)]) for v in vox}
        assert len(classes) == 1
