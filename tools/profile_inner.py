#!/usr/bin/env python
"""Finer-grained timing of integrate_fast / raycast_fast / preprocess internals."""

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
from kintinuous_tpu.ops.raycast_fast import raycast_fast
from kintinuous_tpu.ops.tsdf_fast import integrate_fast


def timeit(name, fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True)
    cam = cfg.camera
    cam_half = cam.at_level(1)
    vsz = cfg.voxel_size

    poses = orbit_trajectory(3, radius=0.06, angle_deg=3.0)
    d0, c0 = render_frame(Scene.default(), cam, poses[0])
    depth_u16 = jnp.asarray(np.asarray(d0, np.uint16))
    rgb_u8 = jnp.asarray(np.asarray(c0, np.uint8))

    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)

    @jax.jit
    def prep(depth_raw, rgb_raw):
        depth_mm = depth_raw.astype(jnp.float32)
        rgb = rgb_raw.astype(jnp.float32)
        filtered = pp.bilateral_filter(
            depth_mm, cfg.bilateral_sigma_depth, cfg.bilateral_sigma_space,
            cfg.bilateral_radius)
        depth_m = pp.depth_to_metres(filtered, cfg.max_depth)
        depth_half = pp.pyr_down_depth(depth_m, sigma=0.09)
        disc = pp.depth_discontinuity_mask(
            depth_m, radius=3, jump_m=cfg.depth_discontinuity_mm * 1e-3)
        return depth_m, depth_half, disc, rgb

    depth_m, depth_half, disc, rgb = jax.block_until_ready(prep(depth_u16, rgb_u8))

    # preprocess sub-parts
    timeit("bilateral_filter(r=6)", jax.jit(lambda d: pp.bilateral_filter(
        d.astype(jnp.float32), cfg.bilateral_sigma_depth,
        cfg.bilateral_sigma_space, cfg.bilateral_radius)), depth_u16)
    timeit("disc_mask(r=3)", jax.jit(lambda d: pp.depth_discontinuity_mask(
        d, radius=3, jump_m=0.2)), depth_m)
    timeit("pyr_down_depth", jax.jit(lambda d: pp.pyr_down_depth(d, sigma=0.09)),
           depth_m)

    vol = make_blocked_volume(cfg.volume_resolution)

    def f_int(vol, carve, bc):
        return integrate_fast(vol, cam, depth_m, rgb, disc, pose, vsz,
                              cfg.trunc_dist, float(cfg.max_weight),
                              band_cap=bc, carve=carve)

    f_full = jax.jit(lambda v: f_int(v, True, cfg.band_cap))
    f_nocarve = jax.jit(lambda v: f_int(v, False, cfg.band_cap))
    f_carveonly = jax.jit(lambda v: f_int(v, True, 8))

    vol = jax.block_until_ready(f_full(vol))
    timeit("integrate full (carve+band)", f_full, vol)
    timeit("integrate band only (no carve)", f_nocarve, vol)
    timeit("integrate carve only (band_cap=8)", f_carveonly, vol)

    # raycast variants
    from kintinuous_tpu.ops.pallas_raycast import raycast_pallas, _warm_start

    f_rcp = jax.jit(lambda v: raycast_pallas(
        v, cam_half, pose, None, depth_half, vsz, cfg.volume_size,
        cfg.trunc_dist))
    timeit("raycast_pallas (no prev)", f_rcp, vol)

    prev_vmap = jnp.zeros((3, cam_half.height, cam_half.width), jnp.float32)
    f_rcpw = jax.jit(lambda v: raycast_pallas(
        v, cam_half, pose, prev_vmap, depth_half, vsz, cfg.volume_size,
        cfg.trunc_dist))
    timeit("raycast_pallas (prev warp)", f_rcpw, vol)

    f_ws = jax.jit(lambda pv: _warm_start(
        cam_half, pose, pv, depth_half, cam_half.height, cam_half.width))
    timeit("warm_start alone", f_ws, prev_vmap)

    # ICP alone (fast-path shapes: half-res base pyramid, (10,5) iters)
    from kintinuous_tpu.tracking.odometry import (
        build_map_pyramid, icp_odometry, pyramid_from_maps)

    levels = max(2, cfg.pyramid_levels - 1)

    @jax.jit
    def f_icp(depth_half):
        curr = build_map_pyramid(cam_half, depth_half, levels)
        pred = pyramid_from_maps(curr[0][0], curr[0][1], levels)
        T, cnt, res = icp_odometry(cam_half, curr, pred, (10, 5, 0),
                                   cfg.icp_dist_thresh,
                                   cfg.icp_angle_thresh_deg)
        return T, cnt, res

    timeit("pyramids + icp (10,5)", f_icp, depth_half)


if __name__ == "__main__":
    main()
