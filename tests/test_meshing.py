import numpy as np
import pytest

from spatially_aware_ai_tpu.meshing import (
    marching_tetrahedra,
    write_ply,
    read_ply,
    extract_mesh,
    extract_mesh_by_object,
)


def sphere_sdf(shape=(24, 24, 24), radius=8.0):
    c = (np.array(shape) - 1) / 2.0
    idx = np.stack(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), axis=-1
    ).astype(np.float64)
    return (np.linalg.norm(idx - c, axis=-1) - radius).astype(np.float32)


def test_sphere_surface_accuracy():
    vol = sphere_sdf()
    verts, faces = marching_tetrahedra(vol, level=0.0)
    assert len(verts) > 200
    assert len(faces) > 200
    c = (np.array(vol.shape) - 1) / 2.0
    r = np.linalg.norm(verts - c, axis=-1)
    # all vertices within half a voxel of the true sphere
    assert np.abs(r - 8.0).max() < 0.5
    assert np.abs(r - 8.0).mean() < 0.1


def test_sphere_watertight_and_oriented():
    vol = sphere_sdf()
    verts, faces = marching_tetrahedra(vol, level=0.0)
    # watertight: every edge shared by exactly 2 faces
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # normals point outward (toward increasing sdf)
    c = (np.array(vol.shape) - 1) / 2.0
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    outward = ((v0 + v1 + v2) / 3 - c)
    assert ((n * outward).sum(axis=1) > 0).mean() > 0.99


def test_nan_masking_drops_geometry():
    vol = sphere_sdf()
    # mask one octant as unobserved
    masked = vol.copy()
    masked[12:, 12:, 12:] = np.nan
    verts_full, _ = marching_tetrahedra(vol)
    verts_masked, faces_masked = marching_tetrahedra(masked)
    assert len(verts_masked) < len(verts_full)
    assert np.isfinite(verts_masked).all()
    assert len(faces_masked) > 0
    # no vertex deep inside the masked octant
    inside_masked = (verts_masked > 12.5).all(axis=1)
    assert not inside_masked.any()


def test_empty_and_degenerate_volumes():
    verts, faces = marching_tetrahedra(np.ones((5, 5, 5), np.float32))
    assert len(verts) == 0 and len(faces) == 0
    verts, faces = marching_tetrahedra(np.full((5, 5, 5), np.nan, np.float32))
    assert len(verts) == 0 and len(faces) == 0
    verts, faces = marching_tetrahedra(np.zeros((1, 5, 5), np.float32))
    assert len(verts) == 0


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = rng.integers(0, 10, size=(7, 3)).astype(np.int64)
    colors = rng.uniform(size=(10, 4)).astype(np.float32)
    p = str(tmp_path / ("m.ply" if binary else "m_ascii.ply"))
    write_ply(p, verts, faces, colors, binary=binary)
    v2, f2, c2 = read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    assert c2.shape == (10, 4)
    np.testing.assert_allclose(c2, np.round(colors * 255) / 255, atol=1 / 255)


def test_ply_pointcloud(tmp_path):
    verts = np.zeros((5, 3), np.float32)
    p = str(tmp_path / "pc.ply")
    write_ply(p, verts)
    v2, f2, c2 = read_ply(p)
    assert len(v2) == 5 and len(f2) == 0 and c2 is None


def test_extract_mesh_from_grid_values():
    nvox = (16, 16, 16)
    n = int(np.prod(nvox))
    tsdf = sphere_sdf(nvox, radius=5.0) / 3.0  # trunc-ish scaling
    gv = {
        "tsdf": np.clip(tsdf.reshape(-1), -1, 1),
        "weight": np.ones(n, np.int32),
        "rgb": np.tile(np.array([[0.2, 0.5, 0.8]], np.float32), (n, 1)),
        "feat": np.ones((n, 8), np.float32),
    }
    out = extract_mesh(gv, nvox, origin=np.array([1.0, 2.0, 3.0]), voxel_size=0.1)
    assert len(out["verts_world"]) > 50
    # world transform applied
    np.testing.assert_allclose(
        out["verts_world"], out["verts_voxel"] * 0.1 + np.array([1.0, 2.0, 3.0]),
        atol=1e-5,
    )
    np.testing.assert_allclose(out["colors"], [[0.2, 0.5, 0.8]] * len(out["colors"]),
                               atol=1e-4)
    assert out["clip_feats"].shape == (len(out["verts_world"]), 8)


def test_extract_mesh_by_object():
    verts = np.arange(18, dtype=np.float32).reshape(6, 3)
    faces = np.array([[0, 1, 2], [2, 3, 4], [3, 4, 5]])
    colors = np.ones((6, 3), np.float32)
    obj = np.array([7, 7, 7, 9, 9, 9])
    ov, of, oc = extract_mesh_by_object(verts, faces, colors, obj, 9)
    assert len(ov) == 3
    np.testing.assert_array_equal(of, [[0, 1, 2]])
    np.testing.assert_allclose(ov, verts[3:])


def test_trilinear_sample_flat_matches_volume_sampler():
    """Flat-buffer sampler (bucket-padded, traced nvox) must equal the
    volume sampler, including out-of-bounds coords and padded tails."""
    import jax.numpy as jnp
    from spatially_aware_ai_tpu.core.sampling import (
        trilinear_sample,
        trilinear_sample_flat,
    )

    rng = np.random.default_rng(11)
    nvox = (5, 7, 6)
    C = 4
    vol = rng.normal(size=(*nvox, C)).astype(np.float32)
    flat = vol.reshape(-1, C)
    flat_padded = np.concatenate(
        [flat, np.full((37, C), 99.0, np.float32)]
    )  # garbage tail must never be read
    coords = np.concatenate(
        [
            rng.uniform(-1.5, np.array(nvox) + 1.5, (64, 3)),
            np.full((8, 3), -10.0),  # fully OOB pad rows
        ]
    ).astype(np.float32)
    for mode in ("bilinear", "nearest"):
        ref = np.asarray(
            trilinear_sample(jnp.asarray(vol), jnp.asarray(coords), mode=mode)
        )
        out = np.asarray(
            trilinear_sample_flat(
                jnp.asarray(flat_padded),
                jnp.asarray(nvox, jnp.int32),
                jnp.asarray(coords),
                mode=mode,
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, err_msg=mode)
        assert (out[-8:] == 0).all()


def test_mesh_sampling_jit_stable_across_scan_sizes():
    """Vertex-attribute sampling programs must be reused across scans with
    different grid dims and vertex counts (bucketed shapes + traced nvox) —
    on the TPU sandbox each recompile costs seconds through a serialized
    remote-compile helper."""
    from spatially_aware_ai_tpu.data import SyntheticSceneDataset
    from spatially_aware_ai_tpu.meshing import extract
    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.pipeline import FusionConfig, fuse_scan

    engine = ClipEngine.tiny()

    def run(nf, w, h, vx):
        ds = SyntheticSceneDataset(num_frames=nf, width=w, height=h)
        cfg = FusionConfig(
            voxel_size=vx, trunc_vox=2.0, clip_patch_size=32,
            clip_patch_stride=16, frame_chunk=2,
            grid_size_bucket=65536,  # the TPU default bucket
        )
        result = fuse_scan(ds, engine, cfg)
        result.extract_mesh()

    run(4, 64, 48, 0.08)
    after_first = extract._sample_flat_jit._cache_size()
    run(4, 80, 64, 0.06)  # different nvox AND vertex count
    after_second = extract._sample_flat_jit._cache_size()
    assert after_second == after_first, (
        f"mesh sampling recompiled across scan sizes "
        f"({after_first} -> {after_second} cached programs)"
    )


def test_extract_mesh_feats_on_device_matches_host():
    """feats_on_device=True returns the vertex CLIP features as a bucket-
    padded device array: first-V rows equal the host path exactly, padding
    rows are zeros (they feed zero-similarity query rows that get sliced)."""
    import jax.numpy as jnp

    nvox = (16, 16, 16)
    n = int(np.prod(nvox))
    rng = np.random.RandomState(0)
    tsdf = sphere_sdf(nvox, radius=5.0) / 3.0
    gv = {
        "tsdf": np.clip(tsdf.reshape(-1), -1, 1),
        "weight": np.ones(n, np.int32),
        "rgb": rng.rand(n, 3).astype(np.float32),
        "feat": jnp.asarray(rng.randn(n, 8).astype(np.float32)),
    }
    host = extract_mesh(gv, nvox, origin=np.zeros(3), voxel_size=0.1)
    dev = extract_mesh(gv, nvox, origin=np.zeros(3), voxel_size=0.1,
                       feats_on_device=True)
    v = len(host["verts_world"])
    feats = np.asarray(dev["clip_feats"])
    assert feats.shape[0] >= v and feats.shape[0] % 16384 == 0
    np.testing.assert_allclose(feats[:v], host["clip_feats"], atol=1e-5)
    assert np.abs(feats[v:]).sum() == 0


def test_extract_meshes_by_object_matches_per_object_calls():
    """The grouped extractor must produce byte-identical per-object meshes
    to the per-call path (vertex order, face reindexing, colors), including
    ids that own nothing and negative unlabeled ids."""
    import numpy as np

    from spatially_aware_ai_tpu.meshing.extract import (
        extract_mesh_by_object,
        extract_meshes_by_object,
    )

    rng = np.random.default_rng(3)
    V, F = 500, 900
    verts = rng.random((V, 3)).astype(np.float32)
    colors = rng.random((V, 3)).astype(np.float32)
    faces = rng.integers(0, V, (F, 3))
    obj_idx = rng.integers(-5, 4, V).astype(np.int32)
    ids = [int(i) for i in np.unique(obj_idx)] + [77]  # 77 owns nothing

    batched = extract_meshes_by_object(verts, faces, colors, obj_idx, ids)
    for oid in ids:
        ov, of, oc = extract_mesh_by_object(verts, faces, colors,
                                            obj_idx, oid)
        bv, bf, bc = batched[oid]
        np.testing.assert_array_equal(ov, bv)
        np.testing.assert_array_equal(of, bf)
        np.testing.assert_array_equal(oc, bc)
    assert len(batched[77][0]) == 0 and len(batched[77][1]) == 0
