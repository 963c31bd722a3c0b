"""Mosaic capability probe for a fused ViT attention kernel: does a
rank-3 (batched) dot_general lower inside a Pallas TPU kernel, and what
does a per-head attention block cost relative to XLA?

Probes, in order (each prints one JSON line; a lowering failure prints the
error and continues):
  1. batched QK^T:   [bB, T, hd] x [bB, T, hd] -> [bB, T, T]
  2. full per-head attention sub-block in one kernel:
     softmax(QK^T/sqrt(hd)) @ V for all heads of a bB-sample block
  3. the same math in plain XLA (same shapes) for a baseline.

Shapes: CLIP ViT-B/32 tiled-encode operating point - T=50 tokens, hd=64,
12 heads, B=280 patch-samples per chunk.
"""
import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from spatially_aware_ai_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, H, HD = 280, 50, 12, 64
    bB = 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, HD)).astype(np.float32),
                    dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, HD)).astype(np.float32),
                    dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, HD)).astype(np.float32),
                    dtype=jnp.bfloat16)

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    reps = 20

    # -- probe 1+2: fused per-block attention kernel ------------------------
    def attn_kernel(q_ref, k_ref, v_ref, o_ref):
        # block: [bB, H, T, HD] -> flatten batch*heads for the batched dots
        qb = q_ref[:].reshape(bB * H, T, HD)
        kb = k_ref[:].reshape(bB * H, T, HD)
        vb = v_ref[:].reshape(bB * H, T, HD)
        s = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / np.sqrt(HD))
        p = jax.nn.softmax(s, axis=-1).astype(qb.dtype)
        o = jax.lax.dot_general(
            p, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = o.reshape(bB, H, T, HD).astype(o_ref.dtype)

    try:
        fused = pl.pallas_call(
            attn_kernel,
            grid=(B // bB,),
            in_specs=[
                pl.BlockSpec((bB, H, T, HD), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            out_specs=pl.BlockSpec((bB, H, T, HD), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, T, HD), jnp.bfloat16),
        )
        fn = jax.jit(lambda a, b, c: fused(a, b, c))
        out = fn(q, k, v)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(q, k, v)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"probe": "pallas_batched_attn", "ok": True,
                          "ms": round(dt * 1e3, 3)}), flush=True)
        pallas_out = np.asarray(out, np.float32)
    except Exception as e:
        print(json.dumps({"probe": "pallas_batched_attn", "ok": False,
                          "err": str(e)[-400:]}), flush=True)
        traceback.print_exc()
        pallas_out = None

    # -- probe 3: XLA baseline ---------------------------------------------
    @jax.jit
    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(HD)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out = xla_attn(q, k, v)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = xla_attn(q, k, v)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"probe": "xla_attn", "ms": round(dt * 1e3, 3)}),
          flush=True)
    if pallas_out is not None:
        err = float(np.max(np.abs(
            pallas_out - np.asarray(out, np.float32)
        )))
        print(json.dumps({"probe": "attn_parity_max_abs_err", "err": err}),
              flush=True)


if __name__ == "__main__":
    main()
