"""Smoke tests for the driver-facing bench.py contract.

The driver runs `python bench.py` at the end of every round and records the
single stdout JSON line; a runtime error there (e.g. a NameError in a
rarely-exercised branch) would silently cost the round's benchmark record.
These tests run both bench modes at toy scale (SAI_BENCH_TINY /
SAI_BENCH_FULL_TINY) in clean subprocesses on the forced-CPU backend and
assert the one-line JSON contract: {"metric", "value", "unit",
"vs_baseline"}.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, timeout=900):
    env = dict(os.environ)
    # Force the true-CPU backend in the child: the sandbox sitecustomize
    # pre-registers the axon TPU backend unless the pool-IPs gate is empty.
    env.update(
        {
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",
            **extra_env,
        }
    )
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"bench.py failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE stdout JSON line, got: {lines}"
    record = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in record, f"missing {key!r} in {record}"
    assert record["value"] > 0
    assert record["vs_baseline"] > 0
    return record, proc.stderr


def _diag_line(stderr, key=None, value=None):
    """A stderr diagnostics JSON line (XLA may interleave warning lines).
    With key, returns the last JSON line containing that key; with value
    too, the last line where rec[key] == value."""
    for line in reversed(stderr.splitlines()):
        if line.startswith("{"):
            rec = json.loads(line)
            if key is None or (key in rec and
                               (value is None or rec[key] == value)):
                return rec
    raise AssertionError(f"no JSON diagnostics on stderr:\n{stderr[-2000:]}")


@pytest.mark.slow
def test_bench_default_mode_contract():
    """Default mode: ONE stdout contract line, plus the full-pipeline
    north-star estimate on stderr (VERDICT r2 next #1)."""
    record, stderr = _run_bench({"SAI_BENCH_TINY": "1"})
    assert record["metric"] == "fusion_frames_per_sec_per_chip"
    assert record["unit"] == "frames/s"
    diag = _diag_line(stderr, key="chunk_frames")
    assert diag["chunk_frames"] >= 1
    full = _diag_line(
        stderr, key="metric",
        value="scan_to_queryable_s_500frame_8chip_est_full")
    assert full["value"] > 0
    assert "bounds_s" in full and "kmax_device_fps_per_chip" in full
    # VERDICT r4 next #1: the north-star line carries best-of + spread +
    # the health tells it gated on
    assert full["best_of"] >= 2
    assert "pass_spread_pct" in full and "health" in full
    assert "link_upload_mb_s" in full
    # VERDICT r4 next #2: conservative bound floored at a documented
    # deployment link assumption, raw sandbox figure alongside
    assert full["link_assumption_mb_s"] > 0
    assert full["value_conservative"] > 0
    assert "value_conservative_sandbox_link" in full
    # VERDICT r4 next #3: the fast-profile preset line exists with its
    # quality cost stamped
    fast = _diag_line(
        stderr, key="metric",
        value="scan_to_queryable_s_500frame_8chip_est_fast_profile")
    assert fast["preset"]["segment_stride"] == 2
    assert fast["best_of"] >= 2
    assert fast["quality_cost_miou_pts"] < 0
    assert fast["value"] > 0


@pytest.mark.slow
def test_bench_outage_recovery_reexec():
    """A wedged client recovers: the health gate polls with fresh
    subprocess probes and re-execs the bench, which then completes
    normally (SAI_BENCH_FORCE_UNHEALTHY simulates the wedge one-shot)."""
    record, stderr = _run_bench(
        {
            "SAI_BENCH_TINY": "1",
            "SAI_BENCH_FULL_SKIP": "1",
            "SAI_BENCH_FORCE_UNHEALTHY": "1",
            "SAI_BENCH_DEVICE_DEADLINE_S": "600",
        }
    )
    assert record["metric"] == "fusion_frames_per_sec_per_chip"
    assert "polling for backend recovery" in stderr
    assert "re-exec with a clean client" in stderr


@pytest.mark.slow
def test_bench_outage_exhausted_deadline_exits_3():
    """An outage that outlives the deadline exits 3 with a diagnosis and
    NO stdout metric line (a bogus platform makes every probe fail)."""
    env = dict(os.environ)
    env.update(
        {
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "bogus_platform",
            "XLA_FLAGS": "",
            "SAI_BENCH_TINY": "1",
            "SAI_BENCH_DEVICE_DEADLINE_S": "20",
        }
    )
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 3, proc.stderr[-2000:]
    assert not [l for l in proc.stdout.splitlines() if l.strip()]
    assert "device unreachable" in proc.stderr


@pytest.mark.slow
def test_bench_full_mode_contract():
    record, stderr = _run_bench(
        {"SAI_BENCH_FULL": "1", "SAI_BENCH_FULL_TINY": "1"}
    )
    assert record["metric"] == "scan_to_queryable_s_500frame_8chip_est_full"
    assert record["unit"] == "s"
    diag = _diag_line(stderr, key="n_objects")
    assert diag["n_objects"] >= 1
    assert diag["postproc_phases_s"]["mesh"] >= 0.0
    assert "mesh_first" in diag["postproc_phases_s"]


@pytest.mark.slow
def test_bench_trace_artifact(tmp_path):
    """SAI_BENCH_TRACE wraps the timed loop in a jax.profiler device trace
    (SURVEY §5.1: tracing is a first-class subsystem here, not prints)."""
    trace_dir = str(tmp_path / "trace")
    record, _ = _run_bench(
        {"SAI_BENCH_TINY": "1", "SAI_BENCH_TRACE": trace_dir,
         # the trace is about the fused loop; skip the full tail for speed
         "SAI_BENCH_FULL_SKIP": "1"}
    )
    assert record["value"] > 0
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found += [f for f in files if f.endswith((".pb", ".json.gz",
                                                  ".trace.json.gz"))]
    assert found, f"no trace files under {trace_dir}"


@pytest.mark.slow
def test_bench_full_budget_aborts_at_phase_boundary():
    """An exhausted full-bench budget must abort BETWEEN phases (reason line
    naming the boundary) instead of os._exit'ing mid-compile — a killed
    remote-compile client orphans its job in the serialized helper."""
    record, stderr = _run_bench(
        {"SAI_BENCH_TINY": "1",
         "SAI_BENCH_FULL_DEADLINE_S": "0.05",
         "SAI_BENCH_FULL_ABORT_GRACE_S": "600"}
    )
    assert record["metric"] == "fusion_frames_per_sec_per_chip"
    reason = _diag_line(stderr, key="full_pipeline")
    assert reason["full_pipeline"] == "failed"
    assert "phase boundary" in reason["reason"]


@pytest.mark.slow
def test_bench_full_health_gate_reruns_sick_passes():
    """The north-star line's health gate re-runs the timed scan while the
    tells look sick (up to SAI_BENCH_FULL_MAX_PASSES) and publishes the
    final pass count; once the tells clear, the record reads healthy
    (SAI_BENCH_FORCE_SICK_PASSES drives the loop without a sick window)."""
    record, stderr = _run_bench(
        {
            "SAI_BENCH_FULL": "1",
            "SAI_BENCH_FULL_TINY": "1",
            "SAI_BENCH_FAST_PROFILE": "0",
            "SAI_BENCH_FORCE_SICK_PASSES": "3",
            "SAI_BENCH_FULL_MAX_PASSES": "4",
        }
    )
    assert record["metric"] == "scan_to_queryable_s_500frame_8chip_est_full"
    assert record["best_of"] == 3  # 2 mandatory + 1 forced-sick re-run
    assert record["health"] == "ok"  # tells cleared after the 3rd pass
