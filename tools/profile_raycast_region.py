#!/usr/bin/env python
"""A/B the Pallas raycast VMEM region size on the real TPU: ms + fallback.

Renders one orbit frame at production shapes, integrates it, then
raycasts with the current region extents. Reports device ms and the
measurement-fallback fraction. Edit _region_extents (ops/pallas_raycast)
between runs, or pass nothing — this simply measures HEAD.
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
    from kintinuous_tpu.ops import maps as map_ops
    from kintinuous_tpu.ops import preprocess as pp
    from kintinuous_tpu.ops.blocked import make_blocked_volume
    from kintinuous_tpu.ops.pallas_integrate import integrate_pallas
    from kintinuous_tpu.ops.pallas_raycast import _region_extents, raycast_pallas

    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True)
    cam, cam_half = cfg.camera, cfg.camera.at_level(1)
    depth_mm, rgb = render_frame(Scene.default(), cam, np.eye(4))
    depth_mm = jnp.asarray(depth_mm.astype(np.float32))
    rgb = jnp.asarray(rgb.astype(np.float32))
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    vsz, trunc = cfg.voxel_size, cfg.trunc_dist

    def pre(depth_mm, rgb):
        f = pp.bilateral_filter(depth_mm, cfg.bilateral_sigma_depth,
                                cfg.bilateral_sigma_space, cfg.bilateral_radius)
        depth_m = pp.depth_to_metres(f, cfg.max_depth)
        dh = pp.pyr_down_depth(depth_m, sigma=0.09)
        disc = pp.depth_discontinuity_mask(depth_m, radius=3, jump_m=0.2)
        cw = map_ops.color_fusion_weight(cam, depth_m, disc, angle=True)
        return depth_m, dh, cw

    depth_m, depth_half, color_w = jax.jit(pre)(depth_mm, rgb)
    vol = make_blocked_volume(cfg.volume_resolution)
    vol = jax.jit(
        lambda v, d, c, w: integrate_pallas(
            v, cam, d, c, w, pose, vsz, trunc, 128.0,
            band_cap=cfg.band_cap, fb_cap=cfg.fallback_band_cap,
        ),
        donate_argnums=(0,),
    )(vol, depth_m, rgb, color_w)

    j_ray = jax.jit(
        lambda v, dh: raycast_pallas(
            v, cam_half, pose, None, dh, vsz, cfg.volume_size, trunc,
            newton=cfg.raycast_newton_iters,
        )
    )
    rc = j_ray(vol, depth_half)
    jax.block_until_ready(rc.depth)
    t0 = time.perf_counter()
    for _ in range(30):
        rc = j_ray(vol, depth_half)
    jax.block_until_ready(rc.depth)
    ms = (time.perf_counter() - t0) / 30 * 1000.0
    fb = float(rc.fallback_frac)
    print(f"region={_region_extents(cfg.volume_resolution)} "
          f"raycast {ms:.2f} ms  fallback {fb:.4f}", flush=True)


if __name__ == "__main__":
    main()
