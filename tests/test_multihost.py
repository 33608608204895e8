"""Two-process jax.distributed dryrun (VERDICT r3 item 5).

Spawns 2 OS processes x 4 virtual CPU devices each, initializes the
distributed runtime through `parallel/multihost.py`, builds the global
8-device mesh spanning both processes, and runs the block-sharded BA
solver with real cross-process collectives (Gloo CPU backend standing in
for ICI/DCN). Validates the process-group + global-mesh path that real
multi-host pods need — unchanged code, different transport.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    repo = Path(__file__).parent.parent
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    verdicts = []
    for pid in range(2):
        path = tmp_path / f"verdict_{pid}.json"
        assert path.exists(), outs[pid][-2000:]
        verdicts.append(json.loads(path.read_text()))

    for v in verdicts:
        assert v["process_count"] == 2
        assert v["device_count"] == 8
        assert v["n_local_shards"] == 4  # each process owns its 4 point blocks
        # distributed solve matches the single-device reference
        assert abs(v["cost0_dist"] - v["cost0_ref"]) <= 1e-5 * max(1.0, abs(v["cost0_ref"]))
        assert abs(v["cost_dist"] - v["cost_ref"]) <= 1e-3 * max(1.0, abs(v["cost_ref"]))
        assert v["quat_maxdiff"] < 1e-5
        assert v["t_maxdiff"] < 1e-4
        assert v["xyz_maxdiff"] < 1e-3

    # both processes observed the SAME distributed result (replicated state
    # is bitwise-consistent across the process group)
    assert verdicts[0]["cost_dist"] == verdicts[1]["cost_dist"]


@pytest.mark.slow
def test_two_process_mapper_pipeline(tmp_path):
    """The MAPPER pipeline across 2 OS processes (VERDICT r4 item 7):
    replicated-deterministic host control must produce IDENTICAL
    registration decisions on both ranks while distributed global BAs run
    over the shared 8-device mesh with Gloo collectives."""
    repo = Path(__file__).parent.parent
    worker = Path(__file__).parent / "multihost_mapper_worker.py"
    port = _free_port()

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    verdicts = []
    for pid in range(2):
        path = tmp_path / f"mapper_verdict_{pid}.json"
        assert path.exists(), outs[pid][-2000:]
        verdicts.append(json.loads(path.read_text()))

    v0, v1 = verdicts
    assert v0["ok"] and v1["ok"]
    assert v0["dist_solves"] > 0, "mapper never used the mesh"
    # identical DECISIONS rank-to-rank: registration set, point counts,
    # and bitwise-identical poses (replicated host control, no drift)
    assert v0["registered"] == v1["registered"]
    assert len(v0["registered"]) == 5, v0["registered"]
    assert v0["points_per_image"] == v1["points_per_image"]
    assert v0["num_points3D"] == v1["num_points3D"]
    assert v0["poses"] == v1["poses"]
