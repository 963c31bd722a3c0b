"""Probe: does XLA lower int8 x int8 -> int32 dot_general to the v5e MXU
at the 2x-over-bf16 rate, and does W8A8 dynamic quantization pay off at the
CLIP tiled-encode operating point?

The v5e datasheet rates the MXU at 197 bf16 TFLOP/s and 394 int8 TOP/s.
The CLIP image tower's weight matmuls (in_proj/out_proj/MLP) are ~98% of
its FLOPs (attention's QK^T/att.V at T=50 are ~2%), so if the int8 dot hits
rate, quantizing just the weight matmuls bounds a ~1.6-1.9x tower speedup.

Run:  python benchmarks/probe_int8.py            (on the TPU chip)
      SAI_PROBE_REPS=20 python benchmarks/probe_int8.py

Prints one JSON line per shape: bf16 ms, int8 ms (quant-inclusive and
matmul-only), and the ratio. Shapes are the ViT-B/32 tiled-encode matmuls
at B=280 (35 patches x 8-frame chunk), T=50: [14000, 768] activations.
"""
from __future__ import annotations

import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same as bench.py)
from spatially_aware_ai_tpu.utils import cache as _cache  # noqa: F401

REPS = max(1, int(os.environ.get("SAI_PROBE_REPS", "10") or 10))

# (name, N, D, F): the three dense-weight matmul shapes of one ViT-B/32
# residual block at the tiled-encode operating point.
SHAPES = [
    ("in_proj", 14000, 768, 2304),
    ("out_proj", 14000, 768, 768),
    ("mlp_c_fc", 14000, 768, 3072),
    ("mlp_c_proj", 14000, 3072, 768),
]


K = int(os.environ.get("SAI_PROBE_K", "24") or 24)  # scan steps per program


def _sync(x):
    # scalar readback: the only reliable completion barrier over this tunnel
    return float(jnp.asarray(x).reshape(-1)[0])


# Each timed program scans over K stacked weight matrices inside ONE jit —
# the tunnel's per-dispatch latency (~3 ms measured, which floored the naive
# per-call probe at 15 TF/s) amortizes to ~0.1 ms/step, and distinct weights
# per step prevent XLA from CSE-hoisting the matmul out of the loop.


@jax.jit
def loop_bf16(x, ws):
    def body(acc, w):
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc + y.sum(), None

    return jax.lax.scan(body, jnp.float32(0), ws)[0]


@jax.jit
def loop_int8(xq, wqs):
    def body(acc, wq):
        y = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # float32 accumulation: the int32 sum over ~10M large products would
        # wrap, making the sync readback scalar meaningless
        return acc + y.astype(jnp.float32).sum(), None

    return jax.lax.scan(body, jnp.float32(0), wqs)[0]


@jax.jit
def loop_w8a8_dynamic(x, ws_stack):
    """The full W8A8 path as it would run in the tower: dynamic per-row
    activation scales + per-out-channel weight scales + dequant, with the
    weight quant inside the loop (in the tower it happens once per call
    on a [D,F] tensor — negligible vs the [N,D,F] matmul)."""

    def body(acc, w):
        ws = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0  # [1, F]
        wq = jnp.round(w / ws).astype(jnp.int8)
        xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0  # [N, 1]
        xq = jnp.round(x / xs).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = y.astype(jnp.float32) * xs * ws
        return acc + y.sum(), None

    return jax.lax.scan(body, jnp.float32(0), ws_stack)[0]


def time_fn(fn, *args):
    _sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / REPS / K * 1e3  # ms per matmul


def main():
    key = jax.random.PRNGKey(0)
    print(json.dumps({"device": str(jax.devices()[0]), "reps": REPS, "k": K}))
    for name, n, d, f in SHAPES:
        kx, kw = jax.random.split(
            jax.random.fold_in(key, zlib.crc32(name.encode()) % 2**31)
        )
        x32 = jax.random.normal(kx, (n, d), jnp.float32)
        w32 = jax.random.normal(kw, (K, d, f), jnp.float32) * 0.02
        x16 = x32.astype(jnp.bfloat16)
        w16 = w32.astype(jnp.bfloat16)
        xq = jnp.clip(jnp.round(x32 * 8), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w32 * 500), -127, 127).astype(jnp.int8)

        ms_bf16 = time_fn(loop_bf16, x16, w16)
        ms_i8 = time_fn(loop_int8, xq, wq)
        ms_w8a8 = time_fn(loop_w8a8_dynamic, x32, w32)
        gmac = n * d * f / 1e9
        print(
            json.dumps(
                {
                    "shape": name,
                    "NDF": [n, d, f],
                    "bf16_ms": round(ms_bf16, 3),
                    "int8_ms": round(ms_i8, 3),
                    "w8a8_dyn_ms": round(ms_w8a8, 3),
                    "bf16_tflops": round(2 * gmac / ms_bf16, 1),
                    "int8_tops": round(2 * gmac / ms_i8, 1),
                    "speedup_matmul": round(ms_bf16 / ms_i8, 2),
                    "speedup_w8a8": round(ms_bf16 / ms_w8a8, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
