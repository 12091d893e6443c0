#!/usr/bin/env python
"""Isolate scan/shift-machinery overhead: batched step with static_mode
(no shift/extract/accumulators) vs the full dynamic step."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame

BATCH = 16
REPS = 3


def build_inputs(cfg):
    cam = cfg.camera
    n_unique = 12
    traj = orbit_trajectory(n_unique, radius=0.06, angle_deg=3.0)
    frames = [render_frame(Scene.default(), cam, T) for T in traj]

    def pingpong(i):
        period = 2 * (n_unique - 1)
        k = i % period
        return k if k < n_unique else period - k

    depths = np.stack(
        [np.asarray(frames[pingpong(i)][0], np.uint16) for i in range(BATCH)])
    rgbs = np.stack(
        [np.asarray(frames[pingpong(i)][1], np.uint8) for i in range(BATCH)])
    return jnp.asarray(depths), jnp.asarray(rgbs)


def time_batched(cfg, depths, rgbs, label):
    from kintinuous_tpu.tracking.tracker import Tracker, make_batched_step_fast

    tracker = Tracker(cfg)
    tracker.process_frame(np.asarray(depths[0]), np.asarray(rgbs[0]), 0)
    tracker.flush()
    step = make_batched_step_fast(cfg, use_odometry=True, batch=BATCH)
    deltas = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1)))
    state = tracker.state
    state, *rest = step(state, depths, rgbs, deltas)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, *rest = step(state, depths, rgbs, deltas)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / (REPS * BATCH) * 1e3
    print(f"{label:44s} {dt:8.2f} ms/frame", flush=True)
    return dt


def main():
    depths, rgbs = build_inputs(KintinuousConfig())

    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True,
                           extraction_capacity=500_000)
    time_batched(cfg, depths, rgbs, "full dynamic step")

    cfg_s = cfg.replace(static_mode=True)
    time_batched(cfg_s, depths, rgbs, "static_mode (no shift/extract/acc)")

    cfg_c = cfg.replace(extraction_capacity=10_000)
    time_batched(cfg_c, depths, rgbs, "dynamic, capacity=10k")


if __name__ == "__main__":
    main()


def time_single(cfg, depths, rgbs, label):
    import kintinuous_tpu.tracking.tracker as trk
    from kintinuous_tpu.tracking.tracker import Tracker

    tracker = Tracker(cfg)
    tracker.process_frame(np.asarray(depths[0]), np.asarray(rgbs[0]), 0)
    tracker.flush()
    step = trk.make_step_fast(cfg, use_odometry=True)[0]
    delta = jnp.eye(4, dtype=jnp.float32)
    state = tracker.state
    state, out = step(state, depths[1], rgbs[1], delta)
    jax.block_until_ready(out.pose_local)
    N = 2 * REPS
    t0 = time.perf_counter()
    for i in range(N):
        state, out = step(state, depths[(i % 14) + 1], rgbs[(i % 14) + 1], delta)
    jax.block_until_ready(out.pose_local)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{label:44s} {dt:8.2f} ms/frame", flush=True)
    return dt
