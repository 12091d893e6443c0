#!/usr/bin/env python
"""Time the FULL fast step on shift vs non-shift frames, per-frame and
batched, to find where in-situ shift cost exceeds the isolated 45 ms."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from kintinuous_tpu.config import KintinuousConfig
    from kintinuous_tpu.io.synth import Scene, render_frame
    from kintinuous_tpu.tracking.tracker import Tracker
    import bench as _b

    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True,
                           extraction_capacity=500_000, dynamic_cube=True)
    depths, rgbs, poses, log, gt = _b._corridor_cache(cfg, 288)

    tracker = Tracker(cfg)
    # warm per-frame programs + run up to a regime with regular shifts
    for i in range(40):
        tracker.process_frame(depths[i], rgbs[i], i * 33333)
    tracker.flush()

    # time per-frame steps over the next 60 frames, tagging shift frames
    d_dev = [jnp.asarray(depths[i].astype(np.uint16)) for i in range(40, 100)]
    c_dev = [jnp.asarray(rgbs[i].astype(np.uint8)) for i in range(40, 100)]
    times = []
    for k in range(60):
        jax.block_until_ready(tracker.state.pose)
        t0 = time.perf_counter()
        tracker.process_frame(d_dev[k], c_dev[k], (40 + k) * 33333)
        jax.block_until_ready(tracker.state.pose)
        times.append(time.perf_counter() - t0)
    tracker.flush()
    sh = np.array(tracker.shift_log[-60:])
    shifted = (sh != 0).any(axis=1)
    times = np.array(times) * 1000
    print(f"per-frame: shift frames {shifted.sum()}  "
          f"mean shift {times[shifted].mean():.1f} ms  "
          f"mean non-shift {times[~shifted].mean():.1f} ms", flush=True)

    # batched: one 32-frame dispatch in the same regime
    up = tracker.upload_batch(
        [(depths[100 + j], rgbs[100 + j], (100 + j) * 33333) for j in range(32)]
    )
    tracker.process_batch_device(*up)  # compile
    tracker.flush()
    t0 = time.perf_counter()
    up = tracker.upload_batch(
        [(depths[132 + j], rgbs[132 + j], (132 + j) * 33333) for j in range(32)]
    )
    tracker.process_batch_device(*up)
    tracker.flush()
    dt = time.perf_counter() - t0
    sh2 = np.array(tracker.shift_log[-32:])
    print(f"batched-32: {dt*1000:.0f} ms total, "
          f"{(sh2 != 0).any(axis=1).sum()} shift frames "
          f"-> {dt/32*1000:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
