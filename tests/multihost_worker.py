"""Worker for tests/test_multihost.py: one process of a 2-process
jax.distributed CPU run. Builds a deterministic pose graph, optimises
it with the factor-sharded distributed GN, exercises host-partitioned
point ownership + DCN allgather, and (process 0) dumps the results."""

import os
import sys

import numpy as np


def build_graph(g):
    """Deterministic noisy circle with one loop factor (same on every
    host — graph metadata is replicated, factor COMPUTE is sharded)."""
    from kintinuous_tpu.geometry import se3 as _se3
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    n = 40
    step = np.eye(4)
    step[:3, 3] = [0.1, 0.0, 0.02]
    c, s = np.cos(2 * np.pi / n), np.sin(2 * np.pi / n)
    step[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    g.add_node(0, np.eye(4))
    for i in range(1, n):
        noise = np.asarray(
            _se3.exp_se3(jnp.asarray(0.004 * rng.standard_normal(6), jnp.float32))
        )
        g.add_odometry(i - 1, i, step @ noise)
    # loop: node n-1 observes node 0 (true relative transform)
    Tn = np.eye(4)
    for _ in range(n - 1):
        Tn = Tn @ step
    g.add_loop(n - 1, 0, np.linalg.inv(Tn))
    return g


def engine_cfg(log, gt, save, nproc=1, pid=0, coordinator=None):
    """Shared config for the 2-process engine test and its
    single-process reference run."""
    from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig

    return KintinuousConfig(
        camera=CameraIntrinsics(
            fx=70.0, fy=70.0, cx=32.0, cy=24.0, width=64, height=48
        ),
        volume_size=3.0, volume_resolution=64, voxel_shift=4,
        pyramid_levels=2, icp_iterations=(3, 2), bilateral_radius=2,
        extraction_capacity=50_000, raycast_max_range=2.2,
        log_file=log, trajectory_file=gt, save_file=save,
        num_processes=nproc, process_id=pid, coordinator=coordinator,
    )


def run_engine(pid, nproc, port, outdir, log, gt):
    # initialize the distributed runtime BEFORE any module import that
    # might touch the XLA backend (init_distributed is idempotent, so
    # the engine's own call becomes a no-op)
    from kintinuous_tpu.parallel.multihost import init_distributed

    init_distributed(f"localhost:{port}", nproc, pid)
    from kintinuous_tpu.runtime.engine import SlamEngine

    cfg = engine_cfg(
        log, gt, os.path.join(outdir, f"mh_p{pid}"),
        nproc=nproc, pid=pid, coordinator=f"localhost:{port}",
    )
    eng = SlamEngine(cfg).run()
    eng.save()


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]
    if len(sys.argv) > 5:  # engine mode
        import jax

        jax.config.update("jax_platforms", "cpu")
        run_engine(pid, nproc, port, outdir, sys.argv[5], sys.argv[6])
        return

    import jax

    jax.config.update("jax_platforms", "cpu")
    from kintinuous_tpu.parallel.multihost import (
        DistributedPoseGraph,
        HostPartition,
        allgather_points,
        global_mesh,
        init_distributed,
    )

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    g = build_graph(DistributedPoseGraph())
    chi2 = g.optimise(10)

    # host-partitioned ownership + DCN exchange of processed payloads
    part = HostPartition()
    items = [
        np.full((i + 1, 3), float(i), np.float32) for i in range(7)
    ]
    mine = [p for i, p in enumerate(items) if part.owns(i)]
    mine = (
        np.concatenate(mine) if mine else np.zeros((0, 3), np.float32)
    )
    merged = allgather_points(mine, global_mesh())

    if pid == 0:
        np.savez(
            os.path.join(outdir, "result.npz"),
            poses=np.array(g.poses),
            chi2=chi2,
            merged=merged,
        )


if __name__ == "__main__":
    main()
