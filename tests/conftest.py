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
    "test_conversion_fullsize",  # REAL-shape converter parity (~380M params)
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


# Every module must be CLASSIFIED (quick below, heavy above) — a new module
# that appears in neither set fails collection loudly instead of silently
# defaulting into the quick tier and eroding its <5-min guarantee.
_QUICK_TEST_MODULES = {
    "test_atomic_artifacts", "test_checkpoint", "test_clip_engine",
    "test_clis", "test_convnext_parity", "test_core_geometry",
    "test_data_loaders", "test_depth_upsample", "test_eval_mains",
    "test_evals", "test_fetch_assets", "test_fusion",
    "test_hypersim_loader", "test_i420_passthrough",
    "test_instance_fusion",
    "test_live_native_depth", "test_live_snapshot", "test_live_warm",
    "test_marching_cubes", "test_meshing", "test_multi_scene",
    "test_native", "test_object_query", "test_order_independence",
    "test_pallas_fusion", "test_pallas_mlp", "test_pallas_tiledma",
    "test_query", "test_real_archives", "test_scene_objects", "test_segment_stride",
    "test_server_async", "test_server_fuzz", "test_server_http",
    "test_tiling", "test_yuv_transfer",
}


def pytest_collection_modifyitems(config, items):
    unknown = set()
    for item in items:
        name = os.path.splitext(os.path.basename(str(item.fspath)))[0]
        if name in _HEAVY_TEST_MODULES:
            item.add_marker(pytest.mark.heavy)
        elif name in _QUICK_TEST_MODULES:
            item.add_marker(pytest.mark.quick)
        else:
            unknown.add(name)
    if unknown:
        raise pytest.UsageError(
            "unclassified test module(s) "
            f"{sorted(unknown)}: add each to _QUICK_TEST_MODULES or "
            "_HEAVY_TEST_MODULES in tests/conftest.py (quick = keeps "
            "`pytest -m quick` under ~5 min on the 1-vCPU host)"
        )
