#!/usr/bin/env python
"""Measure shift-machinery overhead on NON-shift frames at 512^3:
the full fast step (conds present, no shift firing) vs static_mode
(no shift machinery compiled at all)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from kintinuous_tpu.config import KintinuousConfig
    from kintinuous_tpu.io.synth import Scene, render_frame
    from kintinuous_tpu.tracking.tracker import Tracker

    base = dict(fast_mode=True, voxel_shift=16, fast_odometry=True,
                extraction_capacity=500_000)
    depth, rgb = render_frame(Scene.default(), KintinuousConfig().camera, np.eye(4))
    d = jnp.asarray(depth.astype(np.uint16)); c = jnp.asarray(rgb.astype(np.uint8))

    def clock(cfg, name):
        tr = Tracker(cfg)
        tr.collect_slices = False
        for i in range(3):
            tr.process_frame(d, c, i * 33333)
        tr.flush()
        jax.block_until_ready(tr.state.pose)
        t0 = time.perf_counter()
        N = 20
        for i in range(N):
            tr.process_frame(d, c, (3 + i) * 33333)
        tr.flush()
        jax.block_until_ready(tr.state.pose)
        print(f"{name:28s} {(time.perf_counter()-t0)/N*1e3:7.2f} ms/frame", flush=True)

    clock(KintinuousConfig(**base), "shifting (no shift fires)")
    clock(KintinuousConfig(**base, static_mode=True), "static_mode")

if __name__ == "__main__":
    main()
