#!/usr/bin/env python
"""Quick full-batched-step timing (current code) on the real TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame

BATCH = 16
REPS = 4


def main():
    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True,
                           extraction_capacity=500_000)
    cam = cfg.camera
    n_unique = 12
    traj = orbit_trajectory(n_unique, radius=0.06, angle_deg=3.0)
    frames = [render_frame(Scene.default(), cam, T) for T in traj]

    def pingpong(i):
        period = 2 * (n_unique - 1)
        k = i % period
        return k if k < n_unique else period - k

    depths = jnp.asarray(np.stack(
        [np.asarray(frames[pingpong(i)][0], np.uint16) for i in range(BATCH)]))
    rgbs = jnp.asarray(np.stack(
        [np.asarray(frames[pingpong(i)][1], np.uint8) for i in range(BATCH)]))

    from kintinuous_tpu.tracking.tracker import Tracker, make_batched_step_fast

    tracker = Tracker(cfg)
    tracker.process_frame(np.asarray(depths[0]), np.asarray(rgbs[0]), 0)
    tracker.flush()
    step = make_batched_step_fast(cfg, use_odometry=True, batch=BATCH)
    deltas = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1)))
    state = tracker.state
    out = step(state, depths, rgbs, deltas)
    state = out[0]
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = step(state, depths, rgbs, deltas)
        state = out[0]
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / (REPS * BATCH) * 1e3
    print(f"full batched step: {dt:.2f} ms/frame -> {1e3/dt:.1f} fps")


if __name__ == "__main__":
    main()
