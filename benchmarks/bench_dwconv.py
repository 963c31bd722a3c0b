"""Size the ConvNeXt depthwise-7x7 term of the kMaX backbone on TPU.

The fused LN->MLP kernel (models/pallas_mlp.py) removed the 4x-hidden HBM
round trip; the only other op in a ConvNeXt block is the depthwise 7x7
conv (models/kmax/convnext.py:44, reference block structure per the
ConvNeXt paper the kMaX backbone uses). Whether XLA's grouped-conv
lowering is near the VPU/HBM roofline decides if a fused
dwconv->LN->MLP Pallas kernel (halo'd row tiles) is worth building.

Per ConvNeXt-L stage at the 1281-long-edge operating point this times,
same-process A/B:
  (a) XLA depthwise conv alone (lax.conv_general_dilated,
      feature_group_count=C) in bf16, stage-depth iterations;
  (b) 49-term shift-and-add formulation (jnp.roll MACs) — the VPU
      alternative XLA could fuse with neighbors;
  (c) the dwconv bias+residual-containing full block minus the fused MLP
      (i.e. what the backbone actually dispatches around pallas_mlp).

Prints one JSON line per (stage, variant): ms per frame-equivalent and
effective HBM GB/s (2 passes over the activation).

Usage: python benchmarks/bench_dwconv.py   (on the TPU host)
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

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    # ConvNeXt-L stages at kMaX's 1281 long edge (4:3 input -> 1281x961;
    # model pads to multiples of 32 after the stem: see KmaxSegmenter
    # _test_shape). Spatial dims below mirror the real backbone traces.
    H0, W0 = 961, 1281
    stages = [
        ("os4", 192, 3, (H0 + 3) // 4, (W0 + 3) // 4),
        ("os8", 384, 3, (H0 + 7) // 8, (W0 + 7) // 8),
        ("os16", 768, 27, (H0 + 15) // 16, (W0 + 15) // 16),
        ("os32", 1536, 3, (H0 + 31) // 32, (W0 + 31) // 32),
    ]
    dtype = jnp.bfloat16
    reps = int(os.environ.get("SAI_BENCH_DWCONV_REPS", "20"))
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def dw_xla(x, w, b, n):
        # exactly flax nn.Conv(feature_group_count=C) lowering
        def body(i, y):
            return (
                jax.lax.conv_general_dilated(
                    y, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=y.shape[-1],
                )
                + b
            )

        return jax.lax.fori_loop(0, n, body, x)

    @functools.partial(jax.jit, static_argnames=("n",))
    def dw_shift(x, w, b, n):
        # pad once + 49 static slices: exact SAME-padding semantics and
        # the formulation a hand-fused kernel would use (roll would wrap)
        h, wdt = x.shape[1], x.shape[2]

        def body(i, y):
            yp = jnp.pad(y, ((0, 0), (3, 3), (3, 3), (0, 0)))
            acc = jnp.zeros_like(y, dtype=jnp.float32)
            for dy in range(7):
                for dx in range(7):
                    acc = acc + (
                        yp[:, dy : dy + h, dx : dx + wdt, :].astype(
                            jnp.float32
                        )
                        * w[0, dy, dx].astype(jnp.float32)
                    )
            return (acc + b).astype(y.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    for name, C, depth, h, w in stages:
        x = jnp.asarray(
            rng.standard_normal((1, h, w, C), np.float32), dtype
        )
        wk = jnp.asarray(
            rng.standard_normal((7, 7, 1, C), np.float32) * 0.05, dtype
        )
        wk_shift = jnp.transpose(wk, (2, 0, 1, 3))  # [1,7,7,C]
        b = jnp.asarray(rng.standard_normal((C,), np.float32) * 0.01, dtype)

        for variant, fn, warg in (
            ("xla", dw_xla, wk),
            ("shift", dw_shift, wk_shift),
        ):
            try:
                sync(fn(x, warg, b, depth))
                t0 = time.perf_counter()
                out = None
                for _ in range(reps):
                    out = fn(x, warg, b, depth)
                sync(out)
                dt = (time.perf_counter() - t0) / reps
            except Exception as e:  # keep the sweep going
                print(json.dumps({"bench": f"dwconv_{name}",
                                  "variant": variant,
                                  "error": str(e)[:200]}))
                continue
            bytes_moved = 2 * x.size * x.dtype.itemsize * depth
            print(json.dumps({
                "bench": f"dwconv_{name}", "variant": variant,
                "C": C, "h": h, "w": w, "depth": depth,
                "ms_per_frame": round(dt * 1e3, 3),
                "ms_per_block": round(dt * 1e3 / depth, 4),
                "eff_hbm_gbps": round(bytes_moved / dt / 1e9, 1),
            }))


if __name__ == "__main__":
    main()
