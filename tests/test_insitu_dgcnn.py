"""DGCNN + in-situ learning: the classifier must learn user-labeled objects
from their voxel features and re-identify them (the reference's core
"in-situ learning" loop, handy_utils.py:396-425)."""
import numpy as np
import jax.numpy as jnp
import pytest

from spatially_aware_ai_tpu.models.dgcnn import (
    DGCNN,
    DGCNNConfig,
    InSituLearning,
    knn_graph,
    featurize_object,
)

RNG = np.random.default_rng(5)


def test_knn_graph_correct():
    x = RNG.normal(size=(2, 10, 3)).astype(np.float32)
    idx = np.asarray(knn_graph(jnp.asarray(x), k=4))
    assert idx.shape == (2, 10, 4)
    # brute force check
    for b in range(2):
        d = ((x[b][:, None] - x[b][None]) ** 2).sum(-1)
        for n in range(10):
            expect = set(np.argsort(d[n])[:4].tolist())
            assert set(idx[b, n].tolist()) == expect


def test_dgcnn_forward_shapes():
    cfg = DGCNNConfig(in_channels=9, k_neighbors=5, emb_dims=64,
                      output_channels=50, num_points=30)
    model = DGCNN(cfg)
    import jax

    pts = jnp.asarray(RNG.normal(size=(4, 30, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    logits = model.apply(variables, pts, train=False)
    assert logits.shape == (4, 50)
    assert np.isfinite(np.asarray(logits)).all()


def make_object(kind, rng):
    """Synthetic objects distinguishable by CLIP direction + color + shape."""
    if kind == "mug":
        m = rng.integers(20, 40)
        vox = rng.integers(0, 4, size=(m, 3))
        rgb = np.tile([[0.8, 0.1, 0.1]], (m, 1)) + rng.normal(scale=0.03,
                                                              size=(m, 3))
        clip = np.tile(_dir(0), (m, 1)) + rng.normal(scale=0.02, size=(m, 16))
    elif kind == "plant":
        m = rng.integers(30, 60)
        vox = rng.integers(0, 8, size=(m, 3)) * np.array([1, 2, 1])
        rgb = np.tile([[0.1, 0.7, 0.1]], (m, 1)) + rng.normal(scale=0.03,
                                                              size=(m, 3))
        clip = np.tile(_dir(5), (m, 1)) + rng.normal(scale=0.02, size=(m, 16))
    else:  # "box"
        m = rng.integers(40, 80)
        vox = rng.integers(0, 6, size=(m, 3)) * np.array([3, 1, 1])
        rgb = np.tile([[0.2, 0.2, 0.8]], (m, 1)) + rng.normal(scale=0.03,
                                                              size=(m, 3))
        clip = np.tile(_dir(11), (m, 1)) + rng.normal(scale=0.02, size=(m, 16))
    return vox, rgb.astype(np.float32), clip.astype(np.float32)


def _dir(i):
    v = np.zeros(16, np.float32)
    v[i] = 1.0
    return v[None]


def test_featurize_object_normalization():
    vox, rgb, clip = make_object("mug", RNG)
    pts = featurize_object(clip, rgb, vox, num_points=30)
    assert pts.shape == (30, 6 + 16)
    assert np.abs(pts[:, :3]).max() <= 1.0 + 1e-6
    assert np.isfinite(pts).all()


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("insitu")
    model = InSituLearning(
        emb_dims=64,
        k_neighbors=8,
        num_points=30,
        batch_size=32,
        epochs=150,
        lr=0.003,
        feature_dim=16,
        model_path=str(d / "insitu_model.pkl"),
        label_path=str(d / "insitu_labels.json"),
        confidence_threshold=0.4,
    )
    model.labels += ["my_mug:1", "my_plant:1"]

    # build a fake scene knowledge: labeled mug + plant, unlabeled boxes
    rng = np.random.default_rng(0)
    grid_shape = (16, 16, 16)
    clip_grid = rng.normal(size=(*grid_shape, 16)).astype(np.float32) * 0.01
    rgb_grid = np.zeros((*grid_shape, 3), np.float32)
    uo = {}
    offsets = {"my_mug:1": (0, 0, 0), "my_plant:1": (0, 8, 0),
               "box:1": (8, 0, 0), "box:2": (8, 8, 0)}
    kinds = {"my_mug:1": "mug", "my_plant:1": "plant", "box:1": "box",
             "box:2": "box"}
    for obj_id, off in offsets.items():
        vox, rgb, clip = make_object(kinds[obj_id], rng)
        vox = vox % 8 + np.array(off)
        vidx = tuple(vox.T)
        clip_grid[vidx] = clip
        rgb_grid[vidx] = rgb
        uo[obj_id] = {
            "voxels": vox.tolist(),
            "gt_label": obj_id,
            "user_modified": obj_id.startswith("my_"),
        }
    sk = {"unique_objects": uo}
    n = model.prepare_data(sk, clip_grid, rgb_grid)
    assert n > 0
    stats = model.train_model()
    assert stats["trained"]
    return model


def test_training_learns(trained_model):
    assert trained_model.model_trained


def test_reidentification(trained_model):
    rng = np.random.default_rng(99)
    correct = 0
    for _ in range(5):
        vox, rgb, clip = make_object("mug", rng)
        pred = trained_model.predict_object(clip, rgb, vox)
        correct += pred == trained_model.labels.index("my_mug:1")
    assert correct >= 4

    # unknown object type -> null (not one of the user labels)
    vox, rgb, clip = make_object("box", rng)
    pred = trained_model.predict_object(clip, rgb, vox)
    assert pred == 0


def test_persistence_roundtrip(trained_model):
    m2 = InSituLearning(
        emb_dims=64, k_neighbors=8, num_points=30, feature_dim=16,
        model_path=trained_model.model_path,
        label_path=trained_model.label_path,
        confidence_threshold=0.4,
    )
    assert m2.model_trained
    assert m2.labels == trained_model.labels
    rng = np.random.default_rng(123)
    vox, rgb, clip = make_object("plant", rng)
    assert m2.predict_object(clip, rgb, vox) == m2.labels.index("my_plant:1")


def test_reset_model(tmp_path):
    m = InSituLearning(feature_dim=16, emb_dims=32,
                       model_path=str(tmp_path / "m.pkl"),
                       label_path=str(tmp_path / "l.json"))
    m.labels.append("thing:1")
    m.save()
    m.reset_model(delete_weights=True)
    assert m.labels == [None]
    assert not m.model_trained
    import os
    assert not os.path.exists(str(tmp_path / "l.json"))


def test_featurize_empty_object_is_zero():
    pts = featurize_object(
        np.zeros((0, 16), np.float32), np.zeros((0, 3), np.float32),
        np.zeros((0, 3), np.int64), num_points=30,
    )
    assert pts.shape == (30, 22)
    assert (pts == 0).all()


def test_retrain_with_new_data_reuses_compiled_trainer(trained_model):
    """Compile-stability regression: the epoch-chunk trainer must treat the
    training set as a jit ARGUMENT (padded to a power-of-two example
    bucket, real count as a traced sampling bound), not a closure constant.
    Baking the data into the HLO made every /insitu_learn with fresh labels
    a compile-cache miss (minutes over the serialized remote-compile
    tunnel). With the cached wrapper, retraining on different data of the
    same bucket must add zero new traces."""
    tx, fn = trained_model._get_train_fns(trained_model.epochs)
    before = fn._cache_size()
    assert before > 0, "trained_model fixture should have populated the jit"

    # perturb the stored training set (same shapes = same bucket)
    pts, ys = trained_model._train_examples
    trained_model._train_examples = (
        pts + np.float32(0.01) * np.random.default_rng(1).normal(
            size=pts.shape
        ).astype(np.float32),
        ys,
    )
    stats = trained_model.train_model()
    assert stats["trained"]
    tx2, fn2 = trained_model._get_train_fns(trained_model.epochs)
    assert fn2 is fn, "trainer wrapper must be cached per horizon"
    assert fn._cache_size() == before, (
        "retraining on new data of the same shape bucket must not re-trace"
    )


def test_predict_objects_matches_per_object_calls(trained_model):
    """The batched re-id path (one forward + one readback for all objects)
    must agree with per-object predict_object calls — same featurization
    draw order, same confidence thresholding."""
    rng = np.random.default_rng(7)
    items = []
    for kind in ["mug", "plant", "box", "mug", "box"]:
        vox, rgb, clip = make_object(kind, rng)
        items.append((clip, rgb, vox))

    # reset the rng identically for both paths (featurize consumes it)
    trained_model._rng = np.random.default_rng(123)
    batched = trained_model.predict_objects(items)
    trained_model._rng = np.random.default_rng(123)
    singles = [trained_model.predict_object(*it) for it in items]
    assert batched == singles
    assert any(p > 0 for p in batched)  # the mugs/plants re-identify
