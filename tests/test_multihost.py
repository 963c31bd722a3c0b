"""Multi-host (DCN) harness: two coordinated processes, each owning 4
virtual CPU devices, run the voxel-sharded fusion step over one GLOBAL
8-device mesh and psum grid checksums across the process boundary
(parallel/multihost.py). The oracle is the single-process scan integrator
on the same deterministic inputs.

This pins the claim that the sharding code has no host-count assumptions
(ROADMAP "multi-host scaling"): the same shard_map program runs unchanged
whether the mesh devices are local chips or span hosts.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dcn_fusion(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    # fresh CPU-only runtime in the workers: disable the sandbox's axon TPU
    # registration and give each process 4 virtual devices
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    outs = [str(tmp_path / f"mh{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "spatially_aware_ai_tpu.parallel.multihost",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(i),
                "--out", outs[i],
            ],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    try:
        results = [p.communicate(timeout=600) for p in procs]
    finally:
        # a hung worker (e.g. peer died inside jax.distributed.initialize)
        # must not outlive the test: leaked workers hold the coordinator
        # port and steal the 1-vCPU host from every later test/bench
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    rcs = [p.returncode for p in procs]
    if any(rcs):
        blob = "\n".join(r[1][-2000:] for r in results)
        if "UNIMPLEMENTED" in blob or "not compiled with" in blob:
            pytest.skip(f"jax distributed CPU backend unavailable: {blob}")
        raise AssertionError(
            f"multihost workers failed rc={rcs}\n{blob}"
        )

    sums = []
    for o in outs:
        with open(o) as f:
            sums.append(json.load(f))
    assert sums[0]["n_devices"] == 8
    assert sums[0]["n_local_devices"] == 4
    # both processes observed the same global result
    for k in sums[0]:
        if k in ("process_id",):
            continue
        assert sums[0][k] == pytest.approx(sums[1][k], rel=1e-5), k

    from spatially_aware_ai_tpu.parallel.multihost import oracle_checksums

    oracle = oracle_checksums()
    for k, v in oracle.items():
        np.testing.assert_allclose(
            sums[0][k], v, rtol=1e-3, atol=1e-2, err_msg=k
        )
