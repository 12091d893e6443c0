#!/usr/bin/env python
"""Measure actual band/free block counts on the bench scene, ICP
schedule timing variants, and raycast tile-extent fit rates."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.blocked import make_blocked_volume
from kintinuous_tpu.ops.tsdf_fast import (
    BAND, FREE, build_depth_tables, classify_blocks,
)


def main():
    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True)
    cam = cfg.camera
    vsz = cfg.voxel_size
    poses = orbit_trajectory(3, radius=0.06, angle_deg=3.0)
    d0, c0 = render_frame(Scene.default(), cam, poses[0])
    depth_mm = jnp.asarray(np.asarray(d0, np.float32))
    rgb = jnp.asarray(np.asarray(c0, np.float32))
    depth_m = pp.depth_to_metres(
        pp.bilateral_filter(depth_mm, cfg.bilateral_sigma_depth,
                            cfg.bilateral_sigma_space, cfg.bilateral_radius),
        cfg.max_depth)
    disc = pp.depth_discontinuity_mask(depth_m, radius=3, jump_m=0.2)
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)

    vol = make_blocked_volume(cfg.volume_resolution)

    @jax.jit
    def counts(vol):
        tables = build_depth_tables(cam, depth_m, rgb, disc)
        cls = classify_blocks(vol, cam, tables, pose, vsz, cfg.trunc_dist,
                              resolution=cfg.volume_resolution)
        return (cls == BAND).sum(), (cls == FREE).sum()

    nb, nf = jax.device_get(counts(vol))
    print(f"band blocks: {int(nb)}  free blocks: {int(nf)} "
          f"(of {cfg.volume_resolution**3 // 512}; band_cap={cfg.band_cap})")

    # ---- ICP schedule timing --------------------------------------------
    from kintinuous_tpu.tracking.odometry import (
        build_map_pyramid, icp_odometry, pyramid_from_maps)

    cam_half = cam.at_level(1)
    depth_half = pp.pyr_down_depth(depth_m, sigma=0.09)

    for sched in [(10, 5, 0), (4, 8, 5), (2, 10, 5), (0, 10, 5), (6, 4, 0)]:
        @jax.jit
        def f_icp(dh, sched=sched):
            curr = build_map_pyramid(cam_half, dh, 3)
            pred = pyramid_from_maps(curr[0][0], curr[0][1], 3)
            return icp_odometry(cam_half, curr, pred, sched,
                                cfg.icp_dist_thresh, cfg.icp_angle_thresh_deg)

        jax.block_until_ready(f_icp(depth_half))
        t0 = time.perf_counter()
        for _ in range(20):
            out = f_icp(depth_half)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"pyramids+icp {str(sched):12s} {dt:7.2f} ms")


if __name__ == "__main__":
    main()
