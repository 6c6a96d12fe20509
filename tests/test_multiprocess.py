"""Multi-HOST (multi-process) execution of the sharded tier.

SURVEY.md §2.4 mandates a multi-host layer as new capability; the
reference has no distributed execution at all. These tests run the REAL
jax.distributed runtime with two local CPU processes (2 virtual devices
each — the moral equivalent of two hosts) and require the trajectory to
match a single-process mesh of the same global device count.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_group(out, port, nproc=2, dpp=2, *extra):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.join(REPO, "tests",
                                                "_mp_worker.py"),
             str(pid), str(nproc), str(port), out, *extra],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    parts = [
        np.load(f"{out}.p{pid}.npz")["positions"] for pid in range(nproc)
    ]
    # every process observes the identical replicated result
    for other in parts[1:]:
        np.testing.assert_array_equal(parts[0], other)
    return parts[0]


def _run_pair(out, port, *extra):
    return _run_group(out, port, 2, 2, *extra)


def _single_reference(**kw):
    adj = gr.erdos_renyi_graph(120, 0.08, seed=4)
    single = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=11, verbose=False,
        sample_size=64, n_neighbors=6, **kw,
    )
    for _ in range(3):
        single.update_positions()
    return single.positions


@pytest.mark.multichip
def test_two_process_mesh_matches_single_process(tmp_path):
    # single-process reference on the same global device count (the
    # pytest process holds 8 virtual devices; use 4)
    p0 = _run_pair(str(tmp_path / "mp"), _free_port())
    np.testing.assert_allclose(
        p0, _single_reference(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.multichip
def test_two_process_binned_matches_single_process(tmp_path):
    """The opt-in binned-sharded tier (bucket-row-sharded tables + fused
    refs) under the real distributed runtime."""
    p0 = _run_pair(str(tmp_path / "mpb"), _free_port(), "binned")
    np.testing.assert_allclose(
        p0,
        _single_reference(fused_midpoints=True, binned_table=True),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.multichip
def test_two_process_fused_refs_matches_single_process(tmp_path):
    """The fused-refs production path under the real distributed
    runtime: slot-midpoint refs, device-0 overflow block, and the
    slot->edge translation all span two processes."""
    p0 = _run_pair(str(tmp_path / "mpf"), _free_port(), "fused")
    np.testing.assert_allclose(
        p0, _single_reference(fused_midpoints=True), rtol=1e-5, atol=1e-6
    )


@pytest.mark.multichip
def test_four_process_mesh_with_fresh_resume(tmp_path):
    """4 processes x 1 device each (VERDICT r2 #10): catches
    process-count-dependent bugs the 2-process test can't (every device
    boundary is also a process boundary), with the mid-run checkpoint
    resumed into a FRESH embedder object. Trajectory must match the
    single-process 4-device mesh to 1e-5."""
    p0 = _run_group(str(tmp_path / "mp4"), _free_port(), 4, 1, "fresh")
    np.testing.assert_allclose(
        p0, _single_reference(), rtol=1e-5, atol=1e-6
    )
