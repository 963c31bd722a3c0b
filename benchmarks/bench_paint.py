"""A/B: panoptic pasting via the fori_loop path vs the Pallas paint kernel
(panoptic_inference_batch), at the production operating point (1281 long
edge -> os4 masks ~241x321, 128 queries). Prints one JSON line per variant.
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

    from spatially_aware_ai_tpu.models.kmax.model import (
        KMAX_CONVNEXT_LARGE,
        panoptic_inference,
        panoptic_inference_batch,
    )

    cfg = KMAX_CONVNEXT_LARGE
    F = int(os.environ.get("SAI_BENCH_PAINT_FRAMES", "4"))
    N, C = cfg.num_queries, cfg.num_classes
    h4, w4 = 241, 321  # 961x1281 at os4
    rng = np.random.default_rng(0)
    cls = jnp.asarray(rng.normal(size=(F, N, C + 1)).astype(np.float32) * 4)
    masks = jnp.asarray(rng.normal(size=(F, h4, w4, N)).astype(np.float32) * 3)

    def sync(x):
        return float(jnp.ravel(x)[0].astype(jnp.float32))

    reps = 5

    @jax.jit
    def fori(c, m):
        return jax.vmap(lambda cc, mm: panoptic_inference(cc, mm, cfg))(c, m)

    @jax.jit
    def claim(c, m):
        return panoptic_inference_batch(c, m, cfg, use_pallas=False)

    @jax.jit
    def pallas(c, m):
        return panoptic_inference_batch(c, m, cfg, use_pallas=True)

    outs = {}
    for name, fn in [("fori", fori), ("claim", claim), ("pallas", pallas)]:
        cat, seg = fn(cls, masks)
        sync(cat)
        t0 = time.perf_counter()
        for _ in range(reps):
            cat, seg = fn(cls, masks)
        sync(cat)
        dt = (time.perf_counter() - t0) / reps
        outs[name] = (np.asarray(cat), np.asarray(seg))
        print(json.dumps({
            "bench": f"paint_{name}", "frames": F,
            "ms_per_frame": round(dt / F * 1e3, 2),
        }), flush=True)

    match = bool(
        all(
            (outs["fori"][0] == outs[k][0]).all()
            and (outs["fori"][1] == outs[k][1]).all()
            for k in ("claim", "pallas")
        )
    )
    print(json.dumps({"bench": "paint_parity_on_device", "match": match}),
          flush=True)


if __name__ == "__main__":
    main()
