"""Config dotdict + the central artifact path registry.

Same artifact names and directory layout as the reference
(handy_utils.py:164-221) so existing tooling and clients keep working:

  <output_dir>/<scan_name>/vNN/{scene_knowledge.json, vertex_clip_feats.npy,
      vertex_obj_idx.npy, voxel_clip_feats.npy, voxel_rgb.npy, mesh_rgb.ply,
      mesh_segmentation.ply, config.yml}
  <output_dir>/<scan_name>/{insitu_model.pth, insitu_labels.json}  (shared)
"""
from __future__ import annotations

import os


class dotdict(dict):
    """dot.notation access to dictionary attributes."""

    __getattr__ = dict.get
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


def get_path(config: dotdict, curr_ver: int, key=None):
    """Get one artifact path, or set all of them on the config when key is
    None (reference handy_utils.py:172-221 contract)."""
    ver = f"v{curr_ver:02d}"
    base = os.path.join(config.output_dir, config.scan_name)
    vdir = os.path.join(base, ver)

    paths = {
        "scene_inputdir": os.path.join(config.scan_dir, config.scan_name, ver),
        "scene_dir": base,
        "scene_outputdir": vdir,
        # shared between versions
        "insitu_model_path": os.path.join(base, "insitu_model.pth"),
        "insitu_labels": os.path.join(base, "insitu_labels.json"),
        # version based
        "scene_knowledge": os.path.join(vdir, "scene_knowledge.json"),
        "vertex_clip_feats": os.path.join(vdir, "vertex_clip_feats.npy"),
        "vertex_obj_idx": os.path.join(vdir, "vertex_obj_idx.npy"),
        "voxel_clip_feats": os.path.join(vdir, "voxel_clip_feats.npy"),
        "voxel_rgb": os.path.join(vdir, "voxel_rgb.npy"),
        "mesh_rgb": os.path.join(vdir, "mesh_rgb.ply"),
        "mesh_segmentation": os.path.join(vdir, "mesh_segmentation.ply"),
    }

    if key is None:
        for k, path in paths.items():
            setattr(config, k, path)
        return config
    if key in paths:
        return paths[key]
    raise ValueError(f"invalid key: {key}")
