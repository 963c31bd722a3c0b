"""kMaX batched-forward A/B (VERDICT r3 next #1c): ms/frame of the
ConvNeXt-L backbone+decoder forward and of the full fused-labels program at
batch sizes B in {1, 2, 4, 8} on the 1281 operating point.

The production pipeline already feeds whole 8-frame chunks through ONE
program (model.run_on_batch_fused_labels); this measures whether the batch
dimension actually buys MXU utilization (weight-reuse across frames) or the
per-frame cost is flat — i.e. whether frame_chunk is a throughput knob for
the kMaX phase. Prints one JSON line per (phase, B).

Run on the TPU:  python benchmarks/bench_kmax_batch.py
  SAI_BENCH_KMAX_REPS=5 overrides the rep count.
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
    import jax
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.models.kmax import KmaxSegmenter
    from spatially_aware_ai_tpu.models.kmax.model import _prep_batch

    reps = max(1, int(os.environ.get("SAI_BENCH_KMAX_REPS", "3") or 3))
    W, H = 1024, 768
    rng = np.random.default_rng(0)
    seg = KmaxSegmenter()
    new_h, new_w, pad_h, pad_w = seg._test_shape(H, W)
    crop_h4, crop_w4 = -(-new_h // 4), -(-new_w // 4)

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    print(json.dumps({
        "device": str(jax.devices()[0]), "reps": reps,
        "dtype": str(np.dtype(seg.compute_dtype).name)
        if seg.compute_dtype != jnp.bfloat16 else "bfloat16",
    }), flush=True)

    import functools

    @functools.partial(jax.jit, static_argnames=("ch", "cw"))
    def fwd(p, x, ch, cw):
        cls, masks = seg.model.apply(p, x)
        return cls.astype(jnp.float32), masks[:, :ch, :cw].astype(
            jnp.float32
        )

    batches = tuple(
        int(b) for b in os.environ.get(
            "SAI_BENCH_KMAX_BATCHES", "1,2,4,8"
        ).split(",")
    )
    for B in batches:
        rgbs = jnp.asarray(
            rng.uniform(size=(B, H, W, 3)).astype(np.float32)
        )
        imgs = _prep_batch(rgbs, new_h, new_w, pad_h, pad_w)
        sync(imgs)

        # (a) model forward only (backbone + pixel decoder + kMaX decoder)
        out = fwd(seg.params, imgs, crop_h4, crop_w4)
        sync(out[0])  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fwd(seg.params, imgs, crop_h4, crop_w4)
        sync(out[0])
        fwd_ms = (time.perf_counter() - t0) / reps / B * 1e3

        # (b) the full production fused-labels program
        cat = seg.run_on_batch_fused_labels(rgbs, as_numpy=False)
        sync(cat)
        t0 = time.perf_counter()
        for _ in range(reps):
            cat = seg.run_on_batch_fused_labels(rgbs, as_numpy=False)
        sync(cat)
        full_ms = (time.perf_counter() - t0) / reps / B * 1e3

        print(json.dumps({
            "B": B,
            "forward_ms_per_frame": round(fwd_ms, 1),
            "fused_labels_ms_per_frame": round(full_ms, 1),
            "fused_labels_fps_per_chip": round(1e3 / full_ms, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
