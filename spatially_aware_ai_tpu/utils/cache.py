"""Persistent XLA compilation cache.

TPU compiles of the fusion/inference programs cost minutes in some
toolchains (e.g. remote-compile tunnels) and are re-paid by every fresh
process. jax's persistent cache stores the compiled executables on disk and
reloads them in ~ms; measured here: 190 s cold -> 0.5 s warm across
processes.

Called by every entry point that triggers large compiles (bench, CLIs,
pipeline). Idempotent. Override the location with SAI_JAX_CACHE; disable
with SAI_JAX_CACHE=off.
"""
from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache():
    global _DONE
    if _DONE:
        return
    _DONE = True
    loc = os.environ.get("SAI_JAX_CACHE")
    if loc == "off":
        return
    if not loc:
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "spatially_aware_ai_tpu",
            "jax",
        )
    try:
        os.makedirs(loc, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
