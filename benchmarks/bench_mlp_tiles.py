"""Tile sweep for the fused LN->MLP Pallas kernel at the ConvNeXt-L stage
shapes (1281 long edge, F frames). Isolated per-stage timings — use for
RELATIVE tile comparison within one run, then confirm the winner with the
integrated backbone bench (bench_kmax.py); isolated microbenches swing
+/-30% across runs on this tunnel.

Prints one JSON line per (stage, tm, th).
"""
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.models.pallas_mlp import _fused_ln_mlp_impl

    F = int(os.environ.get("SAI_BENCH_MLP_FRAMES", "4"))
    # (name, tokens_hw, D) at 961x1281 (os4..os32 of ConvNeXt-L)
    stages = [
        ("os4", (241, 321), 192),
        ("os8", (121, 161), 384),
        ("os16", (61, 81), 768),
        ("os32", (31, 41), 1536),
    ]
    tms = [int(v) for v in
           os.environ.get("SAI_SWEEP_TM", "256,512").split(",")]
    ths = [int(v) for v in
           os.environ.get("SAI_SWEEP_TH", "512,1024").split(",")]
    reps = 10
    rng = np.random.default_rng(0)

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    for name, (h, w), D in stages:
        M = F * h * w
        H = 4 * D
        x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32),
                        dtype=jnp.bfloat16)
        res = x
        lns = jnp.ones((D,), jnp.float32)
        lnb = jnp.zeros((D,), jnp.float32)
        w1 = jnp.asarray(
            rng.normal(size=(D, H)).astype(np.float32) * 0.02)
        b1 = jnp.zeros((H,), jnp.float32)
        w2 = jnp.asarray(
            rng.normal(size=(H, D)).astype(np.float32) * 0.02)
        b2 = jnp.zeros((D,), jnp.float32)
        for tm, th in itertools.product(tms, ths):
            out = _fused_ln_mlp_impl(
                x, res, lns, lnb, w1, b1, w2, b2, act="gelu", tm=tm, th=th
            )
            sync(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = _fused_ln_mlp_impl(
                    x, res, lns, lnb, w1, b1, w2, b2, act="gelu",
                    tm=tm, th=th,
                )
            sync(out)
            dt = (time.perf_counter() - t0) / reps
            tflops = 2 * M * D * H * 2 / dt / 1e12
            print(json.dumps({
                "bench": "mlp_tile", "stage": name, "tm": tm, "th": th,
                "M": M, "D": D, "ms": round(dt * 1e3, 3),
                "tflops": round(tflops, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
