"""spatially_aware_ai_tpu — a TPU-native framework for multimodal 3D fusion and
in-situ learning for spatially aware AI.

Re-designed from scratch for TPU hardware (JAX / XLA / Pallas / pjit), with the
same capabilities as the reference system cy-xu/spatially_aware_AI:

- TSDF voxel fusion of RGB-D scans that also stores per-voxel CLIP
  vision-language features, RGB, and panoptic class-label histograms.
- Triangle-mesh extraction whose vertices carry CLIP features so the space can
  be searched with free-form natural language.
- 3D object instance segmentation + cross-scan inventory tracking
  (new / unchanged / missing).
- "In-situ learning": a DGCNN point-cloud classifier fine-tuned on the fly
  from user-labeled objects.
- An HTTP server exposing all of this to a Unity / Magic Leap 2 client.

Key TPU-native design decisions (vs the reference's sequential CUDA design):

- The voxel grid uses *sum-form* accumulators (sum(w*x), sum(w)) instead of
  running averages. Sums are associative, so fusion is order-independent,
  frame-batchable, and shardable over a device mesh.
- Bilinear feature splatting is reformulated as a (sparse-weights x features)
  matmul that runs on the MXU (see grid/pallas_fusion.py).
- Frames are data-parallel for model inference; the voxel grid is sharded
  over devices for fusion — zero collectives in the hot loop.
"""

__version__ = "0.1.0"

_LAZY = {
    "FusionConfig": ("spatially_aware_ai_tpu.pipeline", "FusionConfig"),
    "fuse_scan": ("spatially_aware_ai_tpu.pipeline", "fuse_scan"),
    "InSituManager": ("spatially_aware_ai_tpu.manager", "InSituManager"),
    "ClipEngine": ("spatially_aware_ai_tpu.models.clip.engine", "ClipEngine"),
    "KmaxSegmenter": ("spatially_aware_ai_tpu.models.kmax", "KmaxSegmenter"),
    "InSituLearning": ("spatially_aware_ai_tpu.models.dgcnn", "InSituLearning"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
