"""Test config: run everything on a virtual 8-device CPU mesh.

The environment pre-registers the 'axon' TPU backend via sitecustomize (jax is
already imported when this file runs), so plain env vars are too late; we use
jax.config.update instead. XLA_FLAGS still works because the CPU client has
not been initialized yet at collection time.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
