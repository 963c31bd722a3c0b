"""Text-query latency benchmark: the north-star query path is one
text-embedding x vertex-feature similarity on device (SURVEY.md §3.3).

Measures (a) softmax-relevance query and (b) CLIP-Surgery (the production
matmul formulation, clip_feature_surgery_fast) with a 60-label bank over V
vertices. Prints one JSON line per configuration.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spatially_aware_ai_tpu.query import run_query
    from spatially_aware_ai_tpu.query.text import clip_feature_surgery_fast

    rng = np.random.default_rng(0)
    C = 512
    L = 60

    def sync(x):
        return float(jnp.ravel(x)[0])

    for V in [50_000, 500_000]:
        feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        text = jnp.asarray(rng.normal(size=(5, C)).astype(np.float32))
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        bank = jnp.asarray(rng.normal(size=(L, C)).astype(np.float32))
        bank = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)

        rq = jax.jit(run_query)
        sync(rq(feats, text))
        t0 = time.perf_counter()
        for _ in range(10):
            out = rq(feats, text)
        sync(out)
        t_soft = (time.perf_counter() - t0) / 10

        cs = clip_feature_surgery_fast  # already jitted
        sync(cs(feats[None], bank))
        t0 = time.perf_counter()
        for _ in range(10):
            out = cs(feats[None], bank)
        sync(out)
        t_surg = (time.perf_counter() - t0) / 10

        print(
            json.dumps(
                {
                    "metric": "text_query_latency",
                    "vertices": V,
                    "softmax_ms": round(t_soft * 1000, 3),
                    "surgery_ms": round(t_surg * 1000, 3),
                    "device": str(jax.devices()[0]),
                }
            )
        )


if __name__ == "__main__":
    main()
