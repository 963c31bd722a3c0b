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

import pytest  # noqa: E402

# Quick tier (VERDICT r3 next #9): `pytest -m quick` covers the core
# correctness suites in <5 min on the 1-vCPU sandbox host; the full suite
# stays the gate. Modules below dominate the 24-min full wall (measured
# --durations=50, r4): torch-parity mirrors, e2e server/live lifecycles,
# bench/driver-contract subprocess suites, and the multi-device dryruns.
_HEAVY_TEST_MODULES = {
    "test_bench_smoke",          # subprocess bench contract runs (~3.5 min)
    "test_brick",                # sharded-compact adversarial sweeps
    "test_clip_parity",          # torch mirror parity
    "test_iphone_chain",         # CLI->eval e2e chain
    "test_kmax_paint",           # pasting-kernel seed sweeps
    "test_parallel",             # 8-device shard_map/GSPMD suites
    "test_scannet_chain",        # CLI->eval e2e chain
    "test_conversion_rehearsal", # torch mirrors + manager boot
    "test_graft_entry",          # 8-device dryrun subprocesses (~2.6 min)
    "test_heuristic_segmenter",  # weight-free manager lifecycle
    "test_insitu_dgcnn",         # DGCNN training loops
    "test_kmax",                 # ConvNeXt-L-shaped forwards
    "test_kmax_convert",         # torch mirror parity
    "test_label_votes",          # cross-integrator weighted-vote sweeps
    "test_live_scan",            # live-session e2e (~4.5 min)
    "test_manager_env",          # full-size from_checkpoint roundtrip
    "test_multihost",            # 2-process DCN harness
    "test_pipeline_e2e",         # whole-pipeline shard/adaptive runs
    "test_server_e2e",           # full product lifecycle
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = os.path.splitext(os.path.basename(str(item.fspath)))[0]
        if name in _HEAVY_TEST_MODULES:
            item.add_marker(pytest.mark.heavy)
        else:
            item.add_marker(pytest.mark.quick)
