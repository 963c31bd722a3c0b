"""kMaX phase benchmark: where does the 1281-long-edge panoptic forward
spend its time on the TPU?

Times (a) the full jitted forward+panoptic program (the production
run_on_batch_fused_labels path), (b) the ConvNeXt-L backbone alone, and
(c) one os16 ConvNeXt block stack (27 of the backbone's 33 blocks run at
os16 — if its utilization is low, the depthwise-7x7 lowering is the
bottleneck). Prints one JSON line per measurement.

SAI_BENCH_KMAX_FRAMES sets the chunk size (default 4).
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
    from spatially_aware_ai_tpu.models.kmax.convnext import (
        ConvNeXt, CONVNEXT_LARGE, ConvNeXtBlock,
    )

    F = int(os.environ.get("SAI_BENCH_KMAX_FRAMES", "4"))
    W, H = 1024, 768
    rng = np.random.default_rng(0)
    rgbs = rng.uniform(size=(F, H, W, 3)).astype(np.float32)

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    seg = KmaxSegmenter()  # ConvNeXt-L, bf16 on TPU
    reps = 3

    # (a) full production path (includes resize + panoptic + seam nulling)
    out = seg.run_on_batch_fused_labels(rgbs, as_numpy=False)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = seg.run_on_batch_fused_labels(rgbs, as_numpy=False)
    sync(out)
    full_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "kmax_full_fused_labels", "frames": F,
                      "ms_per_frame": round(full_s / F * 1e3, 1),
                      "fps": round(F / full_s, 2)}))

    # (b) backbone alone at the padded operating size (992 x 1312)
    bb = ConvNeXt(CONVNEXT_LARGE, dtype=jnp.bfloat16)
    imgs = jnp.asarray(rng.uniform(size=(F, 992, 1312, 3)).astype(np.float32))
    bb_params = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def bb_fwd(p, x):
        return bb.apply(p, x)["os32"]

    sync(bb_fwd(bb_params, imgs))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = bb_fwd(bb_params, imgs)
    sync(o)
    bb_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "convnext_backbone", "frames": F,
                      "ms_per_frame": round(bb_s / F * 1e3, 1)}))

    # (c) one os16 block, applied 27x (the dominant stage): [F, 62, 82, 768]
    blk = ConvNeXtBlock(768, 1e-6, dtype=jnp.bfloat16)
    x16 = jnp.asarray(
        rng.normal(size=(F, 62, 82, 768)).astype(np.float32)
    ).astype(jnp.bfloat16)
    bp = blk.init(jax.random.PRNGKey(1), x16)

    @jax.jit
    def stage16(p, x):
        for _ in range(27):
            x = blk.apply(p, x)
        return x

    sync(stage16(bp, x16))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = stage16(bp, x16)
    sync(o)
    st_s = (time.perf_counter() - t0) / reps
    # FLOPs: 27 blocks x px x (49*768 dw + 2*768*3072 pw) MACs x 2
    px = 62 * 82 * F
    gflop = 27 * px * (49 * 768 + 2 * 768 * 3072) * 2 / 1e9
    print(json.dumps({
        "bench": "convnext_os16_stage_27blocks", "frames": F,
        "ms_per_frame": round(st_s / F * 1e3, 1),
        "tflops_per_s": round(gflop / st_s / 1e3, 1),
    }))

    # (d) the depthwise 7x7 alone at os16 (27 applications)
    import flax.linen as nn

    class DW(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(768, (7, 7), padding="SAME",
                           feature_group_count=768, dtype=jnp.bfloat16,
                           name="dw")(x)

    dw = DW()
    dp = dw.init(jax.random.PRNGKey(2), x16)

    @jax.jit
    def dw27(p, x):
        for _ in range(27):
            x = dw.apply(p, x)
        return x

    sync(dw27(dp, x16))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = dw27(dp, x16)
    sync(o)
    dw_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "depthwise7x7_os16_27x", "frames": F,
                      "ms_per_frame": round(dw_s / F * 1e3, 1)}))

    # (e) os4 stage (3 blocks at 248x328, dim 192 — NOT a 128 multiple):
    # fused-kernel candidate if Mosaic tolerates the 192-lane layout
    for fused in (False, True):
        blk4 = ConvNeXtBlock(192, 1e-6, dtype=jnp.bfloat16,
                             fused_mlp=fused)
        x4 = jnp.asarray(
            rng.normal(size=(F, 248, 328, 192)).astype(np.float32)
        ).astype(jnp.bfloat16)
        bp4 = blk4.init(jax.random.PRNGKey(3), x4)

        @jax.jit
        def stage4(p, x, blk4=blk4):
            for _ in range(3):
                x = blk4.apply(p, x)
            return x

        try:
            sync(stage4(bp4, x4))
            t0 = time.perf_counter()
            for _ in range(reps):
                o = stage4(bp4, x4)
            sync(o)
            s4 = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "bench": f"convnext_os4_stage_3blocks_fused{int(fused)}",
                "frames": F, "ms_per_frame": round(s4 / F * 1e3, 1),
            }))
        except Exception as e:
            print(json.dumps({
                "bench": f"convnext_os4_stage_3blocks_fused{int(fused)}",
                "error": str(e)[:200],
            }))


if __name__ == "__main__":
    main()
