"""Hypersim scan loader.

Frame contract from the reference (clipfusion.py:377-494): HDF5 RGB + depth
(distance-along-ray, converted to planar depth via the per-pixel 1/|ray|
map), camera keyframe positions/orientations in asset units scaled to
meters, intrinsics from the M_cam_from_uv calibration matrix.
"""
from __future__ import annotations

import csv
import glob
import os

import numpy as np

from ..core.geometry import get_pix_vecs, hypersim_M_to_K
from .base import Frame, FrameDataset


def _read_csv_rows(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


class HypersimDataset(FrameDataset):
    def __init__(self, scan_dir: str):
        import h5py  # heavyweight import kept local

        self.dataset_name = "hypersim"
        self.h5py = h5py

        self.depth_files = sorted(
            glob.glob(
                f"{scan_dir}/images/scene_cam_00_geometry_hdf5/"
                "frame.*.depth_meters.hdf5"
            )
        )
        self.rgb_files = sorted(
            glob.glob(
                f"{scan_dir}/images/scene_cam_00_final_hdf5/frame.*.color.hdf5"
            )
        )

        scan_name = os.path.basename(scan_dir)
        cam_rows = [
            r
            for r in _read_csv_rows(
                os.path.join(scan_dir, "..", "metadata_camera_parameters.csv")
            )
            if r["scene_name"] == scan_name
        ]
        cam = cam_rows[0]
        self.imheight = int(round(float(cam["settings_output_img_height"])))
        self.imwidth = int(round(float(cam["settings_output_img_width"])))

        meta_rows = _read_csv_rows(f"{scan_dir}/_detail/metadata_scene.csv")
        meters_per_unit = float(
            next(
                r["parameter_value"]
                for r in meta_rows
                if r["parameter_name"] == "meters_per_asset_unit"
            )
        )

        with h5py.File(
            f"{scan_dir}/_detail/cam_00/camera_keyframe_positions.hdf5"
        ) as d:
            cam_pos = d["dataset"][:].astype(np.float32) * meters_per_unit
        with h5py.File(
            f"{scan_dir}/_detail/cam_00/camera_keyframe_orientations.hdf5"
        ) as d:
            cam_rot = d["dataset"][:].astype(np.float32)

        self.poses = np.tile(np.eye(4, dtype=np.float32), (len(cam_pos), 1, 1))
        self.poses[:, :3, 3] = cam_pos
        self.poses[:, :3, :3] = cam_rot

        M = np.array(
            [
                [float(cam[f"M_cam_from_uv_{i}{j}"]) for j in range(3)]
                for i in range(3)
            ]
        )
        self.K = hypersim_M_to_K(M, self.imwidth, self.imheight)

        # distance-along-ray -> planar depth factor (clipfusion.py:444-448)
        pix_vecs = np.asarray(get_pix_vecs(self.imwidth, self.imheight, self.K))
        self.dist_to_depth = (
            1.0 / np.linalg.norm(pix_vecs, axis=-1)
        ).astype(np.float32)

    def __len__(self):
        return len(self.rgb_files)

    def __getitem__(self, i: int) -> Frame:
        with self.h5py.File(self.rgb_files[i]) as d:
            rgb = np.clip(d["dataset"][:].astype(np.float32), 0, 1)
        with self.h5py.File(self.depth_files[i]) as d:
            depth = d["dataset"][:].astype(np.float32)
        depth = depth * self.dist_to_depth
        frame_idx = int(os.path.basename(self.depth_files[i]).split(".")[1])
        return Frame(
            rgb=rgb, depth=depth, pose=self.poses[frame_idx], K=self.K, index=i
        )
