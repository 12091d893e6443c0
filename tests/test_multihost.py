"""Multi-host layer: distributed pose-graph GN + host-partitioned
ownership, validated in-process on the 8-device mesh and across a REAL
2-process jax.distributed CPU launch (the multi-host substitute for
fake backends — SURVEY.md §4)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from kintinuous_tpu.backend.pose_graph import PoseGraph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
from multihost_worker import build_graph  # noqa: E402


def _single_process_reference():
    g = build_graph(PoseGraph())
    chi2 = g.optimise(10)
    return np.array(g.poses), chi2


def test_distributed_pose_graph_matches_single_device():
    """Factor-sharded GN over the in-process 8-device mesh must match
    the plain single-device solve (same math, psum'd reductions)."""
    from kintinuous_tpu.parallel.multihost import DistributedPoseGraph

    ref_poses, ref_chi2 = _single_process_reference()
    g = build_graph(DistributedPoseGraph())
    chi2 = g.optimise(10)
    np.testing.assert_allclose(np.array(g.poses), ref_poses, atol=1e-4)
    assert abs(chi2 - ref_chi2) < 1e-4 * max(1.0, abs(ref_chi2))


def test_two_process_distributed_matches_single_process(tmp_path):
    """Launch TWO separate processes under jax.distributed (CPU): the
    distributed optimised trajectory must equal the single-process one,
    and host-partitioned point payloads must allgather losslessly."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "multihost_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n{so.decode()[-2000:]}\n"
            f"{se.decode()[-2000:]}"
        )

    res = np.load(tmp_path / "result.npz")
    ref_poses, ref_chi2 = _single_process_reference()
    np.testing.assert_allclose(res["poses"], ref_poses, atol=1e-4)
    assert abs(float(res["chi2"]) - ref_chi2) < 1e-4 * max(1.0, abs(ref_chi2))

    # ownership partition: items 0..6 round-robin over 2 hosts, merged
    # payload must be the full multiset of points
    items = [np.full((i + 1, 3), float(i), np.float32) for i in range(7)]
    expect = np.concatenate(items)
    got = res["merged"]
    assert got.shape == expect.shape
    np.testing.assert_array_equal(
        np.sort(got[:, 0]), np.sort(expect[:, 0])
    )


def test_two_process_engine_matches_single_process(tmp_path):
    """Full engine across 2 jax.distributed processes with slice work
    partitioned by host ownership: the DCN-merged .pcd and process-0
    trajectory must match the single-process run."""
    from kintinuous_tpu.io.pcd import load_pcd
    from kintinuous_tpu.io.synth import generate_klg, straight_trajectory
    from kintinuous_tpu.io.tum import load_trajectory
    from kintinuous_tpu.runtime.engine import SlamEngine
    from multihost_worker import engine_cfg

    log = str(tmp_path / "walk.klg")
    gt = str(tmp_path / "walk.gt")
    poses = straight_trajectory(25, distance=1.0, axis=0)
    cfg1 = engine_cfg(log, gt, str(tmp_path / "single"))
    generate_klg(log, cfg1.camera, poses, gt_path=gt)

    eng = SlamEngine(cfg1).run()
    ref = eng.save()

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path),
             log, gt],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"engine worker failed rc={p.returncode}\n{so.decode()[-2000:]}\n"
            f"{se.decode()[-2000:]}"
        )

    s1, p1 = load_trajectory(ref["poses"])
    s2, p2 = load_trajectory(str(tmp_path / "mh_p0.poses"))
    np.testing.assert_allclose(s2, s1, atol=1e-9)
    np.testing.assert_allclose(np.array(p2), np.array(p1), atol=1e-5)

    c1 = load_pcd(ref["cloud"])
    c2 = load_pcd(str(tmp_path / "mh_p0.pcd"))
    assert len(c1["points"]) > 100
    assert len(c2["points"]) == len(c1["points"])

    def key(a):
        a = np.asarray(a)
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

    np.testing.assert_allclose(
        key(c2["points"]), key(c1["points"]), atol=1e-5
    )
