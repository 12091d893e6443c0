#!/usr/bin/env python
"""Debug the bench corridor traversal on the real TPU.

E1: ground-truth replay (ext_delta) — isolates volume-shift bookkeeping
    from odometry: ATE should be ~noise if shifting is correct.
E2: ICP odometry — per-frame inliers/residual/shift log to find where
    tracking breaks.

Writes /root/repo/.bench_cache/debug_corridor.npz with both logs.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_FRAMES = 120


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.bench_cache/xla"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from kintinuous_tpu.config import KintinuousConfig
    from kintinuous_tpu.eval.ate import absolute_trajectory_error
    from kintinuous_tpu.io.synth import walk_loop_trajectory
    from kintinuous_tpu.tracking.tracker import Tracker

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench

    cfg = KintinuousConfig(
        fast_mode=True, voxel_shift=16, fast_odometry=True,
        extraction_capacity=500_000, dynamic_cube=True,
    )
    depths, rgbs, poses, log, gt = bench._corridor_cache(cfg, N_FRAMES)
    gt_poses = walk_loop_trajectory(
        N_FRAMES, distance=4.0, turn_frames=30, hold_frames=6, warmup_frames=10
    )
    stamps = np.arange(N_FRAMES) * 33333

    def run(use_gt):
        t0 = time.time()
        tracker = Tracker(cfg)
        last = None
        for i in range(N_FRAMES):
            delta = None
            if use_gt:
                T = gt_poses[i]
                delta = (
                    np.linalg.inv(last) @ T if last is not None else np.eye(4)
                ).astype(np.float32)
                last = T
            tracker.process_frame(depths[i], rgbs[i], int(stamps[i]),
                                  ext_delta=delta)
        tracker.flush()
        est = np.array(tracker.poses)
        ate, _ = absolute_trajectory_error(
            stamps / 1e6, gt_poses, stamps / 1e6, est
        )
        print(
            f"[{'GT ' if use_gt else 'ICP'}] ATE {ate*100:7.2f} cm  "
            f"shifts {(np.array(tracker.shift_log)!=0).any(axis=1).sum():3d}  "
            f"wall {time.time()-t0:.0f}s",
            flush=True,
        )
        return {
            "poses": est,
            "shift_log": np.array(tracker.shift_log),
            "icp_count": np.array(tracker.stats["icp_count"]),
            "icp_residual": np.array(tracker.stats["icp_residual"]),
            "fallback": np.array(tracker.stats["raycast_fallback"]),
            "ate_cm": ate * 100,
        }

    e1 = run(use_gt=True)
    e2 = run(use_gt=False)
    np.savez(
        "/root/repo/.bench_cache/debug_corridor.npz",
        gt=np.array(gt_poses),
        **{f"gt_{k}": v for k, v in e1.items()},
        **{f"icp_{k}": v for k, v in e2.items()},
    )
    print("saved debug_corridor.npz", flush=True)


if __name__ == "__main__":
    main()
