import numpy as np

from spatially_aware_ai_tpu.scene import (
    PREDEFINED_CLASSES,
    NULL_CLASS_ID,
    connected_components_3d,
    flood_fill_3d,
    get_obj_counts,
    mark_object_of_interest,
    merge_objects,
)

RNG = np.random.default_rng(11)


def python_flood_fill_oracle(grid):
    """Direct port of the reference's scan-order flood fill (the slow way),
    as a test oracle for component membership + discovery order."""
    X, Y, Z = grid.shape
    visited = np.zeros(grid.shape, bool)
    comps = []
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                if visited[x, y, z]:
                    continue
                visited[x, y, z] = True
                cid = int(grid[x, y, z])
                if cid == NULL_CLASS_ID or cid == -1:
                    continue
                stack = [(x, y, z)]
                vox = []
                seen = {(x, y, z)}
                while stack:
                    cx, cy, cz = stack.pop()
                    if grid[cx, cy, cz] != cid:
                        continue
                    vox.append((cx, cy, cz))
                    visited[cx, cy, cz] = True
                    for dx in (-1, 0, 1):
                        for dy in (-1, 0, 1):
                            for dz in (-1, 0, 1):
                                nx, ny, nz_ = cx + dx, cy + dy, cz + dz
                                if (
                                    0 <= nx < X and 0 <= ny < Y and 0 <= nz_ < Z
                                    and (nx, ny, nz_) not in seen
                                ):
                                    seen.add((nx, ny, nz_))
                                    stack.append((nx, ny, nz_))
                comps.append((cid, sorted(vox)))
    return comps


def test_components_match_python_oracle():
    grid = np.full((10, 9, 8), NULL_CLASS_ID, np.int32)
    # sprinkle blobs of several classes
    grid[1:4, 1:4, 1:4] = 5
    grid[6:9, 1:3, 1:3] = 5  # disconnected same class
    grid[2:5, 5:8, 2:6] = 20
    grid[0, 0, 7] = 7  # single voxel
    grid[5:7, 5:7, 5:7] = -1  # empty region stays ignored

    ours = [
        (cid, sorted(zip(*[v.tolist() for v in vox])))
        for cid, vox in connected_components_3d(grid)
    ]
    oracle = python_flood_fill_oracle(grid)
    assert len(ours) == len(oracle)
    for (c1, v1), (c2, v2) in zip(ours, oracle):
        assert c1 == c2
        assert v1 == v2


def test_components_ordering_is_scan_order():
    grid = np.full((6, 6, 6), NULL_CLASS_ID, np.int32)
    grid[4, 4, 4] = 3  # later in scan order, smaller class id
    grid[0, 0, 0] = 9  # first in scan order
    comps = connected_components_3d(grid)
    assert comps[0][0] == 9
    assert comps[1][0] == 3


class FakeInsitu:
    def __init__(self, labels=None, trained=False, mapping=None):
        self.labels = labels or [None]
        self.model_trained = trained
        self.mapping = mapping or {}

    def predict_object(self, clip_feats, rgb, voxels):
        # identify by mean position bucket
        key = tuple(np.round(voxels.mean(axis=0)).astype(int) // 100)
        return self.mapping.get(len(voxels), 0)


def make_grid():
    grid = np.full((12, 10, 10), NULL_CLASS_ID, np.int32)
    grid[1:4, 1:4, 1:4] = 56  # chair, 27 voxels
    grid[6:8, 6:8, 6:8] = 28  # suitcase, 8 voxels
    grid[0, 9, 9] = 5  # 1 voxel -> rejected
    return grid


def test_flood_fill_builds_scene_knowledge():
    grid = make_grid()
    n = grid.size
    feats = RNG.normal(size=(*grid.shape, 4)).astype(np.float32)
    rgb = RNG.uniform(size=(*grid.shape, 3)).astype(np.float32)
    sk, obj_ids = flood_fill_3d(grid, None, feats, rgb, FakeInsitu())
    uo = sk["unique_objects"]
    assert set(uo.keys()) == {"chair:1", "suitcase:1"}
    chair = uo["chair:1"]
    assert chair["class_id"] == 56
    assert chair["class_label"] == "chair"
    assert len(chair["voxels"]) == 27
    assert chair["object_index"] == -2
    assert uo["suitcase:1"]["object_index"] == -3
    # tiny object rejected; its voxel stays -1 in the id grid
    assert obj_ids[0, 9, 9] == -1
    assert (obj_ids[1:4, 1:4, 1:4] == -2).all()
    assert sk["object_counts"] == {"chair": 1, "suitcase": 1}


def test_flood_fill_reidentification_and_missing():
    grid = make_grid()
    feats = np.zeros((*grid.shape, 4), np.float32)
    rgb = np.zeros((*grid.shape, 3), np.float32)
    # model knows 'my_bag:1' (index 1) and 'my_cup:1' (index 2);
    # predicts label 1 for the 8-voxel component, nothing for others
    model = FakeInsitu(
        labels=[None, "my_bag:1", "my_cup:1"], trained=True, mapping={8: 1}
    )
    prev_sk = {
        "unique_objects": {
            "my_bag:1": {"dummy": 1},
            "my_cup:1": {"dummy": 2},
        }
    }
    sk, obj_ids = flood_fill_3d(grid, None, feats, rgb, model, prev_sk)
    uo = sk["unique_objects"]
    assert "my_bag:1" in uo or "my_bag:2" in uo
    bag_key = [k for k in uo if k.startswith("my_bag")][0]
    assert uo[bag_key]["user_modified"]
    assert uo[bag_key]["object_index"] == 1
    assert (obj_ids[6:8, 6:8, 6:8] == 1).all()
    assert bag_key in sk["unchanged_objects"]
    # my_cup trained earlier but not found now -> missing
    assert "my_cup:1" in sk["missing_objects"]


def test_get_obj_counts_naming():
    counts = {}
    assert get_obj_counts(counts, "chair") == ("chair:1", "chair")
    assert get_obj_counts(counts, "chair") == ("chair:2", "chair")
    assert get_obj_counts(counts, "chair:2") == ("chair:3", "chair")
    # non-digit suffix: reference leaves class_label unbound (bug); we fall
    # back to the raw id
    got = get_obj_counts(counts, "weird:name")
    assert got == ("weird:name:1", "weird:name")


def test_memorize_and_merge():
    grid = make_grid()
    feats = np.zeros((*grid.shape, 4), np.float32)
    rgb = np.zeros((*grid.shape, 3), np.float32)
    model = FakeInsitu()
    sk, obj_ids = flood_fill_3d(grid, None, feats, rgb, model)

    sk = mark_object_of_interest(sk, model, ["chair:1"])
    assert sk["unique_objects"]["chair:1"]["user_modified"]
    assert "chair:1" in model.labels

    new_label, sk = merge_objects(
        sk, obj_ids, model, ["chair:1", "suitcase:1"], "my_desk"
    )
    assert new_label == "my_desk-merged:1"
    uo = sk["unique_objects"]
    assert set(uo.keys()) == {"my_desk-merged:1"}
    assert len(uo["my_desk-merged:1"]["voxels"]) == 35
    assert uo["my_desk-merged:1"]["merged"]
    assert new_label in model.labels

    # rename (merge of one) keeps plain name
    new2, sk = merge_objects(sk, obj_ids, model, [new_label], "workbench")
    assert new2 == "workbench:1"
    assert set(sk["unique_objects"].keys()) == {"workbench:1"}


def test_merge_remaps_vertex_obj_idx():
    """Review r5: the reference left the vertex_obj_idx remap commented out
    (handy_utils.py:566-576), orphaning renamed objects from every
    index-keyed consumer (per-object meshes, object_text_query). Rename
    must move the object's vertices to its new index; indices still shared
    with OTHER objects must not be stolen."""
    grid = make_grid()
    feats = np.zeros((*grid.shape, 4), np.float32)
    rgb = np.zeros((*grid.shape, 3), np.float32)
    model = FakeInsitu()
    sk, obj_ids = flood_fill_3d(grid, None, feats, rgb, model)
    vert_idx = obj_ids.reshape(-1).copy()  # stand-in mesh vertex array

    chair_idx = sk["unique_objects"]["chair:1"]["object_index"]
    assert chair_idx < 0  # unrecognized: unique negative id
    n_chair = int((vert_idx == chair_idx).sum())
    assert n_chair == 27

    new_label, sk = merge_objects(sk, vert_idx, model, ["chair:1"],
                                  "my_chair")
    new_idx = sk["unique_objects"][new_label]["object_index"]
    assert new_idx == model.labels.index(new_label) and new_idx > 0
    # the remap: every former chair vertex carries the new index
    assert int((vert_idx == new_idx).sum()) == n_chair
    assert int((vert_idx == chair_idx).sum()) == 0
    # the other object's vertices are untouched
    s_idx = sk["unique_objects"]["suitcase:1"]["object_index"]
    assert int((vert_idx == s_idx).sum()) == 8


def test_merge_does_not_steal_shared_index():
    """Two re-identified objects share a positive object_index; renaming
    one must NOT remap the shared index (the sibling's vertices would be
    stolen)."""
    grid = make_grid()
    feats = np.zeros((*grid.shape, 4), np.float32)
    rgb = np.zeros((*grid.shape, 3), np.float32)
    # both components re-identify to the same trained label index 1
    model = FakeInsitu(labels=[None, "mug:1"], trained=True,
                       mapping={27: 1, 8: 1})
    sk, obj_ids = flood_fill_3d(grid, None, feats, rgb, model)
    uo = sk["unique_objects"]
    shared = [i for i in (info["object_index"] for info in uo.values())]
    assert shared[0] == shared[1] == 1  # both mapped to mug:1
    vert_idx = obj_ids.reshape(-1).copy()
    n_shared = int((vert_idx == 1).sum())

    some_id = sorted(uo.keys())[0]
    new_label, sk = merge_objects(sk, vert_idx, model, [some_id],
                                  "renamed")
    # the shared index keeps ALL its vertices (no per-object separation
    # is possible by index, so stealing them would corrupt the sibling)
    assert int((vert_idx == 1).sum()) == n_shared


def test_components_scipy_fallback_matches_native(monkeypatch):
    """The no-g++ scipy fallback (now one argsort instead of a full-grid
    scan per component — review r5) must produce the identical component
    list as the default path."""
    import spatially_aware_ai_tpu.native as native_mod

    grid = np.full((10, 9, 8), NULL_CLASS_ID, np.int32)
    grid[1:4, 1:4, 1:4] = 5
    grid[6:9, 1:3, 1:3] = 5
    grid[2:5, 5:8, 2:6] = 20
    grid[0, 0, 7] = 7

    want = connected_components_3d(grid)
    monkeypatch.setattr(
        native_mod, "connected_components_native",
        lambda *_: (_ for _ in ()).throw(RuntimeError("no native")),
    )
    got = connected_components_3d(grid)
    assert len(got) == len(want)
    for (c1, v1), (c2, v2) in zip(got, want):
        assert c1 == c2
        np.testing.assert_array_equal(np.stack(v1), np.stack(v2))
