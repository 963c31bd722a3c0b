"""kMaX phase breakdown, part 2: forward vs panoptic post-processing.

bench_kmax.py showed backbone 41 ms/frame but the full fused-labels program
at 580 ms/frame — this isolates (a) the input resize+pad, (b) the model
forward (pixel decoder + kMaX decoder + predictor), (c) panoptic_inference
(confidence-sorted pasting fori_loop), (d) seam nulling + output resize.
Prints one JSON line per phase.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import functools
    import jax
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.models.kmax import KmaxSegmenter
    from spatially_aware_ai_tpu.models.kmax.model import (
        panoptic_inference,
        null_same_class_instance_seams,
        _resize_nearest_int,
    )

    F = int(os.environ.get("SAI_BENCH_KMAX_FRAMES", "4"))
    W, H = 1024, 768
    rng = np.random.default_rng(0)
    rgbs = jnp.asarray(rng.uniform(size=(F, H, W, 3)).astype(np.float32))

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    seg = KmaxSegmenter()
    reps = 3

    # (a) resize + pad + normalize (the run_on_batch preamble) — the
    # PRODUCTION fused program (model._prep_batch), not a local mirror
    from spatially_aware_ai_tpu.models.kmax.model import _prep_batch

    H, W = rgbs.shape[1:3]
    new_h, new_w, pad_h, pad_w = seg._test_shape(H, W)

    def prep(x):
        return _prep_batch(x, new_h, new_w, pad_h, pad_w)

    sync(prep(rgbs))
    t0 = time.perf_counter()
    for _ in range(reps):
        imgs = prep(rgbs)
    sync(imgs)
    prep_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "kmax_prep_resize_pad", "frames": F,
                      "ms_per_frame": round(prep_s / F * 1e3, 1)}))

    # (b) model forward: backbone + pixel decoder + kMaX decoder + predictor
    @jax.jit
    def fwd(p, x):
        cls, masks = seg.model.apply(p, x)
        return cls, masks

    cls, masks = fwd(seg.params, imgs)
    sync(cls)
    t0 = time.perf_counter()
    for _ in range(reps):
        cls, masks = fwd(seg.params, imgs)
    sync(cls)
    fwd_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "kmax_forward", "frames": F,
                      "ms_per_frame": round(fwd_s / F * 1e3, 1),
                      "cls_shape": list(cls.shape),
                      "masks_shape": list(masks.shape)}))

    # (c) panoptic inference alone (crop + pasting loop), at crop res
    crop_h4, crop_w4 = -(-new_h // 4), -(-new_w // 4)
    cls32 = cls.astype(jnp.float32)
    masks32 = masks[:, :crop_h4, :crop_w4].astype(jnp.float32)

    @jax.jit
    def pano(c, m):
        return jax.vmap(
            lambda cc, mm: panoptic_inference(cc, mm, seg.cfg)
        )(c, m)

    cat, segm = pano(cls32, masks32)
    sync(cat)
    t0 = time.perf_counter()
    for _ in range(reps):
        cat, segm = pano(cls32, masks32)
    sync(cat)
    pano_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "kmax_panoptic_inference", "frames": F,
                      "ms_per_frame": round(pano_s / F * 1e3, 1),
                      "mask_hw": [int(masks32.shape[1]),
                                  int(masks32.shape[2])]}))

    # (d) output resize + seam nulling
    @functools.partial(jax.jit, static_argnames=("dilate",))
    def outpost(cat, segm, dilate=2):
        def one(c, s):
            c = _resize_nearest_int(c, (H, W))
            s = _resize_nearest_int(s, (H, W))
            return null_same_class_instance_seams(c, s, dilate=dilate)

        return jax.vmap(one)(cat, segm)

    lab = outpost(cat, segm)
    sync(lab)
    t0 = time.perf_counter()
    for _ in range(reps):
        lab = outpost(cat, segm)
    sync(lab)
    post_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "kmax_outresize_seams", "frames": F,
                      "ms_per_frame": round(post_s / F * 1e3, 1)}))


if __name__ == "__main__":
    main()
