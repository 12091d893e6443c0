#!/usr/bin/env python
"""Time the fused ICP+RGB-D odometry at production shapes on the TPU.

Times rgbd_icp_odometry (the -ri solver inside the fast step) for
several reassoc_every values and the ICP-only solver for reference, so
config B optimisation effort goes where the milliseconds are.
"""

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
    from kintinuous_tpu.ops import preprocess as pp
    from kintinuous_tpu.ops.rgbd import build_rgbd_pyramid, rgbd_icp_odometry
    from kintinuous_tpu.tracking.odometry import build_map_pyramid, icp_odometry

    cfg = KintinuousConfig(fast_mode=True, fast_odometry=True)
    cam_half = cfg.camera.at_level(1)
    levels = max(2, cfg.pyramid_levels - 1)
    iters = tuple(cfg.icp_fast_iterations[1:])

    d0, c0 = render_frame(Scene.default(), cfg.camera, np.eye(4))
    T1 = np.eye(4)
    T1[0, 3] = 0.01
    d1, c1 = render_frame(Scene.default(), cfg.camera, T1)

    def prep(d, c):
        dm = pp.depth_to_metres(
            pp.bilateral_filter(jnp.asarray(d.astype(np.float32)), 30.0, 4.5, 6),
            6.0,
        )
        dh = pp.pyr_down_depth(dm, sigma=0.09)
        ih = pp.pyr_down_gauss(pp.rgb_to_intensity(jnp.asarray(c.astype(np.float32))))
        return dh, ih

    dh0, ih0 = jax.jit(prep)(d0, c0)
    dh1, ih1 = jax.jit(prep)(d1, c1)
    curr_pyr = jax.jit(lambda d: build_map_pyramid(cam_half, d, levels))(dh1)
    pred_pyr = jax.jit(lambda d: build_map_pyramid(cam_half, d, levels))(dh0)
    rgbd0 = jax.jit(lambda i, d: build_rgbd_pyramid(i, d, levels))(ih0, dh0)
    rgbd1 = jax.jit(lambda i, d: build_rgbd_pyramid(i, d, levels))(ih1, dh1)

    def clock(name, fn, *args, n=30):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

    clock(
        "icp_only (10,5,0) reassoc3",
        jax.jit(lambda c, p: icp_odometry(cam_half, c, p, iters, 0.10, 20.0,
                                          reassoc_every=3)),
        curr_pyr, pred_pyr,
    )
    for ra in (1, 3, 5):
        clock(
            f"fused icp+rgbd reassoc{ra}",
            jax.jit(lambda c, cr, pr, p, _ra=ra: rgbd_icp_odometry(
                cam_half, c, cr, pr, p, iters, reassoc_every=_ra)),
            curr_pyr, rgbd1, rgbd0, pred_pyr,
        )
    clock(
        "rgbd only (no icp term)",
        jax.jit(lambda c, cr, pr: rgbd_icp_odometry(
            cam_half, c, cr, pr, None, iters)),
        curr_pyr, rgbd1, rgbd0,
    )


if __name__ == "__main__":
    main()
