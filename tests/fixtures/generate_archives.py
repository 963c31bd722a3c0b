"""Generate the checked-in miniature real-format scan archives
(tests/fixtures/archives/, VERDICT r3 next #7).

Each archive reproduces the REAL export layout byte-for-byte-faithfully per
the reference's loader contracts (clipfusion.py:86-494): exact directory
structure, file naming, on-disk dtypes, metadata schemas, and the format
quirks the runtime-generated test scans skip (ScanNet's 4x4 intrinsic file
and inf-pose frames, Hypersim's parent-dir camera csv + distance-along-ray
HDF5 depth + asset-unit poses, LERF's applied_transform, the 3D Scanner
App's ARKit pose + 16-element flat matrices).

A manifest.json per archive records expected loader outputs computed HERE
with independent numpy math (the reference's equations, not the package's),
so tests/test_real_archives.py cross-checks the loaders against the spec
rather than against themselves.

Run once and commit the outputs:  python tests/fixtures/generate_archives.py
(regeneration rewrites the archives; jpg bytes depend on the cv2 build, so
only regenerate deliberately).
"""
import json
import os
import shutil

import cv2
import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "archives")
RNG = np.random.default_rng(2024)


def smooth_rgb(w, h, seed):
    """Compressible synthetic image: soft gradients + a few blocks."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 0.5 + 0.5 * np.sin(xx / w * 3 + seed)
    g = 0.5 + 0.5 * np.cos(yy / h * 2 + seed)
    b = np.full((h, w), 0.3 + 0.1 * seed, np.float32)
    img = np.stack([r, g, b], -1)
    img[h // 4: h // 2, w // 4: w // 2] = [0.8, 0.2, 0.2]
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def plane_depth_mm(w, h, z0):
    """Planar depth ramp in mm (uint16)."""
    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    z = z0 + 0.8 * yy + np.zeros((h, w), np.float32)
    return np.round(z * 1000).astype(np.uint16)


def rot_y(deg):
    a = np.deg2rad(deg)
    return np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
        np.float64,
    )


def pose_rdf(deg, t):
    p = np.eye(4)
    p[:3, :3] = rot_y(deg)
    p[:3, 3] = t
    return p


def write_jpg(path, img_rgb):
    cv2.imwrite(path, cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 80])


# --------------------------------------------------------------------------
def gen_iphone(d):
    """3D Scanner App export: frame_XXXXX.jpg 1920x1440, depth_XXXXX.png
    256x192 uint16 mm, frame_XXXXX.json with flat 3x3 intrinsics +
    16-element ARKit cameraPoseARFrame (right-up-back). Frame 2 has a
    non-finite pose (must be dropped). Reference: clipfusion.py:259-374."""
    os.makedirs(d)
    K = np.array([[1451.0, 0, 958.0], [0, 1451.0, 722.0], [0, 0, 1.0]])
    expected = {"poses_rdf": [], "K_scaled": None, "depth_probe": []}
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    n = 0
    for i, (deg, t) in enumerate(
        [(0, [0, 0, 0]), (5, [0.3, 0.0, 0.1]), (0, [np.nan, 0, 0]),
         (-5, [0.6, 0.1, 0.0])]
    ):
        rgb = smooth_rgb(1920, 1440, i)
        write_jpg(os.path.join(d, f"frame_{i:05d}.jpg"), rgb)
        depth = plane_depth_mm(256, 192, 1.0 + 0.2 * i)
        cv2.imwrite(os.path.join(d, f"depth_{i:05d}.png"), depth)
        p_rdf = pose_rdf(deg, t)
        # export stores the ARKit (right-up-back) pose: flip columns 1, 2
        p_arkit = p_rdf @ flip
        meta = {
            "intrinsics": K.reshape(-1).tolist(),
            "cameraPoseARFrame": p_arkit.reshape(-1).tolist(),
            "projectionMatrix": np.eye(4).reshape(-1).tolist(),
            "motionQuality": 0.9,
            "averageAngularVelocity": 0.02,
            "exposureDuration": 0.008,  # extra real-export fields the
            "time": 1700000000.0 + i,   # loader must ignore
        }
        with open(os.path.join(d, f"frame_{i:05d}.json"), "w") as f:
            json.dump(meta, f)
        if np.isfinite(p_rdf).all():
            expected["poses_rdf"].append(p_rdf.tolist())
            # depth probe: loader upsamples 4x cubic then /1000; probe the
            # exact top-left texel (cubic is interpolating at grid points)
            expected["depth_probe"].append(float(depth[0, 0]) / 1000.0)
            n += 1
    Ks = K.copy()
    Ks[0] *= 1024 / 1920
    Ks[1] *= 768 / 1440
    expected["K_scaled"] = Ks.tolist()
    expected["n_frames"] = n
    expected["size"] = [1024, 768]
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump(expected, f, indent=1)


# --------------------------------------------------------------------------
def gen_scannet(d):
    """ScanNet sens-export layout: color/N.jpg (1296x968), depth/N.png
    (640x480 uint16 mm), pose/N.txt (4x4 whitespace floats; frame 3 is the
    real exports' untracked '-inf everywhere' pose), intrinsic/
    intrinsic_depth.txt (4x4 — loaders must slice [:3,:3]). Frame ids count
    by 10 like real keyframe-extracted exports (numeric sort required:
    '100' < '20' lexically). Keyframing keeps frames >0.1 m apart.
    Reference: clipfusion.py:193-256."""
    for sub in ["color", "depth", "pose", "intrinsic"]:
        os.makedirs(os.path.join(d, sub))
    K4 = np.eye(4)
    K4[:3, :3] = [[577.87, 0, 319.5], [0, 577.87, 239.5], [0, 0, 1]]
    np.savetxt(os.path.join(d, "intrinsic", "intrinsic_depth.txt"), K4)
    # also present in real exports (loader must pick the DEPTH one)
    K4c = K4.copy()
    K4c[0, 0] = 1170.2
    np.savetxt(os.path.join(d, "intrinsic", "intrinsic_color.txt"), K4c)

    specs = [
        (0, pose_rdf(0, [0, 0, 0])),        # kept (first)
        (10, pose_rdf(2, [0.05, 0, 0])),    # dropped: dist 0.05 < 0.1
        (20, pose_rdf(4, [0.25, 0, 0])),    # kept
        (30, np.full((4, 4), -np.inf)),     # dropped: untracked pose
        (100, pose_rdf(6, [0.55, 0, 0.1])),  # kept; numeric-sort probe
    ]
    expected = {"poses_rdf": [], "depth_probe": [], "kf_src_ids": []}
    for i, (fid, pose) in enumerate(specs):
        rgb = smooth_rgb(1296, 968, i)
        write_jpg(os.path.join(d, "color", f"{fid}.jpg"), rgb)
        depth = plane_depth_mm(640, 480, 1.5 + 0.1 * i)
        cv2.imwrite(os.path.join(d, "depth", f"{fid}.png"), depth)
        np.savetxt(os.path.join(d, "pose", f"{fid}.txt"), pose)
    for fid, pose in [specs[0], specs[2], specs[4]]:
        expected["poses_rdf"].append(pose.tolist())
        expected["kf_src_ids"].append(fid)
        i = [s[0] for s in specs].index(fid)
        expected["depth_probe"].append(1.5 + 0.1 * i)
    expected["K"] = K4[:3, :3].tolist()
    expected["n_frames"] = 3
    expected["size"] = [640, 480]
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump(expected, f, indent=1)


# --------------------------------------------------------------------------
def gen_lerf(d):
    """LERF/nerfstudio export: images/frame_NNNNN.jpg (native res),
    depth_simplerecon/frame_NNNNN.png (lower res uint16 mm — the loader
    must rescale K by the depth/native ratio), transforms.json with GLOBAL
    fl_x/fl_y/cx/cy, an applied_transform (3x4 world rotation nerfstudio
    bakes in, to be inverted), and OpenGL (right-up-back) transform_matrix
    per frame. Reference: clipfusion.py:86-190."""
    os.makedirs(os.path.join(d, "images"))
    os.makedirs(os.path.join(d, "depth_simplerecon"))
    native_w, native_h = 994, 738
    dep_w, dep_h = 256, 192
    fx, fy, cx, cy = 740.3, 740.3, 497.0, 369.0
    # nerfstudio's standard applied_transform (axis permutation)
    applied = np.array(
        [[0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0]]
    )
    A = np.eye(4)
    A[:3] = applied
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    frames = []
    expected = {"poses_rdf": [], "depth_probe": []}
    for i, (deg, t) in enumerate(
        [(0, [0, 0, 0]), (8, [0.4, 0.1, 0]), (-8, [0.8, 0, 0.2])]
    ):
        rgb = smooth_rgb(native_w, native_h, i)
        write_jpg(os.path.join(d, "images", f"frame_{i + 1:05d}.jpg"), rgb)
        depth = plane_depth_mm(dep_w, dep_h, 2.0 + 0.15 * i)
        cv2.imwrite(
            os.path.join(d, "depth_simplerecon", f"frame_{i + 1:05d}.png"),
            depth,
        )
        p_rdf = pose_rdf(deg, t)
        # stored matrix: applied_transform pre-applied, OpenGL axes
        p_gl = A @ (p_rdf @ flip)
        frames.append({
            "file_path": f"images/frame_{i + 1:05d}.jpg",
            "transform_matrix": p_gl.tolist(),
        })
        expected["poses_rdf"].append(p_rdf.tolist())
        expected["depth_probe"].append(float(depth[0, 0]) / 1000.0)
    transforms = {
        "camera_model": "OPENCV",
        "fl_x": fx, "fl_y": fy, "cx": cx, "cy": cy,
        "w": native_w, "h": native_h,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0,
        "applied_transform": applied.tolist(),
        "frames": frames,
    }
    with open(os.path.join(d, "transforms.json"), "w") as f:
        json.dump(transforms, f, indent=1)
    Ks = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    Ks[0] *= dep_w / native_w
    Ks[1] *= dep_h / native_h
    expected["K_scaled"] = Ks.tolist()
    expected["n_frames"] = 3
    expected["size"] = [dep_w, dep_h]
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump(expected, f, indent=1)


# --------------------------------------------------------------------------
def gen_hypersim(root):
    """Hypersim layout for scene ai_001_001: images/scene_cam_00_final_hdf5/
    frame.NNNN.color.hdf5 + scene_cam_00_geometry_hdf5/
    frame.NNNN.depth_meters.hdf5 (float16 'dataset', DISTANCE ALONG RAY),
    _detail/metadata_scene.csv (meters_per_asset_unit),
    _detail/cam_00/camera_keyframe_{positions,orientations}.hdf5 (asset
    units / 3x3), and metadata_camera_parameters.csv in the PARENT dir
    (quirk: one level above the scan dir, clipfusion.py:391-393).
    Reference: clipfusion.py:377-494."""
    import h5py

    scan = os.path.join(root, "ai_001_001")
    os.makedirs(os.path.join(scan, "images", "scene_cam_00_final_hdf5"))
    os.makedirs(os.path.join(scan, "images", "scene_cam_00_geometry_hdf5"))
    os.makedirs(os.path.join(scan, "_detail", "cam_00"))

    # miniature resolution (real scenes are 1024x768; the LAYOUT is what the
    # fixture pins — resolution comes from the csv either way)
    w, h = 160, 120
    mpau = 0.0254  # inches, like many real hypersim scenes
    # M_cam_from_uv: uv in [0,1]^2 + 1 -> camera ray (OpenGL-ish, -z fwd)
    fov_x = np.deg2rad(60.0)
    tan_x = np.tan(fov_x / 2)
    tan_y = tan_x * h / w
    M = np.array([[tan_x, 0, 0], [0, tan_y, 0], [0, 0, -1.0]])

    # camera csv in the PARENT dir, with extra columns + another scene row
    cols = (
        ["scene_name", "settings_output_img_height",
         "settings_output_img_width", "use_camera_physical"]
        + [f"M_cam_from_uv_{i}{j}" for i in range(3) for j in range(3)]
        + [f"M_proj_{i}{j}" for i in range(4) for j in range(4)]
    )
    def row(scene):
        vals = {c: "0.0" for c in cols}
        vals.update({
            "scene_name": scene,
            "settings_output_img_height": str(h),
            "settings_output_img_width": str(w),
            "use_camera_physical": "False",
        })
        for i in range(3):
            for j in range(3):
                vals[f"M_cam_from_uv_{i}{j}"] = format(
                    float(M[i, j]), ".17g"
                )
        return ",".join(vals[c] for c in cols)

    with open(os.path.join(root, "metadata_camera_parameters.csv"), "w") as f:
        f.write(",".join(cols) + "\n")
        f.write(row("ai_001_001") + "\n")
        f.write(row("ai_999_999") + "\n")  # loader must select by scene

    with open(os.path.join(scan, "_detail", "metadata_scene.csv"), "w") as f:
        f.write("parameter_name,parameter_value\n")
        f.write(f"meters_per_asset_unit,{mpau}\n")
        f.write("settings_units_info,meters\n")

    # ORACLE: verbatim numpy transcription of the reference's calibration
    # equations (M_to_K, clipfusion.py:467-494; get_pix_vecs, :497-507) —
    # the archive stores distance-along-ray derived with THESE, so the
    # loader's planar output checks package-vs-reference parity end to end
    def m_to_k(M, imwidth, imheight):
        u_min, u_max, v_min, v_max = -1.0, 1.0, -1.0, 1.0
        half_du = 0.5 * (u_max - u_min) / imwidth
        half_dv = 0.5 * (v_max - v_min) / imheight
        fx = M[0, 0] * (2 * (u_max - half_du)) / (imwidth - 1)
        fy = M[1, 1] * (2 * (v_max - half_dv)) / (imheight - 1)
        cx = M[0, 0] * (u_min + half_du)
        cy = M[1, 1] * (v_min + half_dv)
        w0 = M[2, 0] * (2 * (u_max - half_du)) / (imwidth - 1)
        w1 = M[2, 1] * (2 * (v_max - half_dv)) / (imheight - 1)
        w2 = M[2, 0] * (u_min + half_du)
        w3 = M[2, 1] * (v_min + half_dv)
        K = np.array(
            [[fx, 0, cx + M[0, 2]], [0, fy, cy + M[1, 2]],
             [w0, w1, M[2, 2] + w2 + w3]]
        )
        K[1] *= -1
        return np.linalg.inv(K)

    # expected planar depth: store DISTANCE = planar / dist_to_depth in
    # the hdf5, with dist_to_depth = 1/|K^-1 [u, v, 1]| per the reference
    poses, exp_poses = [], []
    for i, (deg, t_m) in enumerate([(0, [0, 0, 0]), (6, [0.5, 0.1, 0])]):
        p = pose_rdf(deg, t_m)
        poses.append((p[:3, :3], np.array(t_m) / mpau))  # stored asset units
        exp_poses.append(p.tolist())

    with h5py.File(
        os.path.join(scan, "_detail", "cam_00",
                     "camera_keyframe_positions.hdf5"), "w"
    ) as f:
        f.create_dataset(
            "dataset", data=np.stack([t for _, t in poses]).astype(np.float32)
        )
    with h5py.File(
        os.path.join(scan, "_detail", "cam_00",
                     "camera_keyframe_orientations.hdf5"), "w"
    ) as f:
        f.create_dataset(
            "dataset", data=np.stack([r for r, _ in poses]).astype(np.float32)
        )

    K = m_to_k(M, w, h)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    uv1 = np.stack([xx, yy, np.ones_like(xx)], -1)
    pix_vecs = np.einsum("ij,hwj->hwi", np.linalg.inv(K), uv1)
    ray_norm = np.linalg.norm(pix_vecs, axis=-1)  # 1 / dist_to_depth

    expected = {"poses_rdf": exp_poses, "depth_probe": [], "n_frames": 2,
                "size": [w, h], "K": K.tolist()}
    for i in range(2):
        planar = (2.5 + 0.3 * i) * np.ones((h, w), np.float32)
        dist = planar * ray_norm
        with h5py.File(
            os.path.join(scan, "images", "scene_cam_00_geometry_hdf5",
                         f"frame.{i:04d}.depth_meters.hdf5"), "w"
        ) as f:
            f.create_dataset("dataset", data=dist.astype(np.float16),
                             compression="gzip")
        color = smooth_rgb(w, h, i).astype(np.float32) / 255.0
        with h5py.File(
            os.path.join(scan, "images", "scene_cam_00_final_hdf5",
                         f"frame.{i:04d}.color.hdf5"), "w"
        ) as f:
            f.create_dataset("dataset", data=color.astype(np.float16),
                             compression="gzip")
        expected["depth_probe"].append(2.5 + 0.3 * i)
    with open(os.path.join(scan, "manifest.json"), "w") as f:
        json.dump(expected, f, indent=1)


def main():
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    os.makedirs(ROOT)
    gen_iphone(os.path.join(ROOT, "iphone_mini"))
    gen_scannet(os.path.join(ROOT, "scannet_mini", "scene0706_00"))
    gen_lerf(os.path.join(ROOT, "lerf_mini"))
    gen_hypersim(os.path.join(ROOT, "hypersim_mini"))
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(ROOT) for f in fs
    )
    print(f"wrote {ROOT}: {total / 1e6:.2f} MB")
    assert total < 1_000_000, "archives must stay under 1 MB"


if __name__ == "__main__":
    main()
