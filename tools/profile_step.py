#!/usr/bin/env python
"""Per-op timing of the fast-mode frontend step on the real TPU.

Times each stage of make_step_fast separately (jitted in isolation) and
the full step, so optimisation effort goes where the milliseconds are.
Run: python tools/profile_step.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.blocked import make_blocked_volume
from kintinuous_tpu.ops.raycast_fast import raycast_fast
from kintinuous_tpu.ops.tsdf_fast import (
    build_depth_tables,
    classify_blocks,
    integrate_fast,
)
from kintinuous_tpu.tracking.odometry import (
    build_map_pyramid,
    icp_odometry,
    pyramid_from_maps,
)


def timeit(name, fn, *args, n=20):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dt:8.2f} ms")
    return dt


def main():
    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True)
    cam = cfg.camera
    cam_half = cam.at_level(1)
    vsz = cfg.voxel_size
    levels = max(2, cfg.pyramid_levels - 1)
    iters = tuple(cfg.icp_fast_iterations[1:])

    poses = orbit_trajectory(3, radius=0.06, angle_deg=3.0)
    d0, c0 = render_frame(Scene.default(), cam, poses[0])
    depth_u16 = jnp.asarray(np.asarray(d0, np.uint16))
    rgb_u8 = jnp.asarray(np.asarray(c0, np.uint8))

    vol = make_blocked_volume(cfg.volume_resolution)
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)

    # --- prepared intermediates -------------------------------------
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

    # seed the volume + a raycast prediction for ICP timing
    @jax.jit
    def seed(vol):
        return integrate_fast(vol, cam, depth_m, rgb, disc, pose, vsz,
                              cfg.trunc_dist, float(cfg.max_weight),
                              band_cap=cfg.band_cap)
    vol = jax.block_until_ready(seed(vol))
    rc = jax.jit(lambda v: raycast_fast(
        v, cam_half, pose, None, depth_half, vsz, cfg.volume_size,
        cfg.trunc_dist))(vol)
    rc = jax.block_until_ready(rc)

    total = 0.0
    total += timeit("preprocess(bilat+pyr+disc)", prep, depth_u16, rgb_u8)

    @jax.jit
    def f_pyr(depth_half):
        return build_map_pyramid(cam_half, depth_half, levels)
    curr_pyr = jax.block_until_ready(f_pyr(depth_half))
    total += timeit("build_map_pyramid", f_pyr, depth_half)

    @jax.jit
    def f_icp(curr_pyr, pv, pn):
        pred_pyr = pyramid_from_maps(pv, pn, levels)
        return icp_odometry(cam_half, curr_pyr, pred_pyr, iters,
                            cfg.icp_dist_thresh, cfg.icp_angle_thresh_deg)
    total += timeit("icp_odometry(10,5)", f_icp, curr_pyr, rc.vmap, rc.nmap)

    @jax.jit
    def f_tables(depth_m, rgb, disc):
        return build_depth_tables(cam, depth_m, rgb, disc)
    tables = jax.block_until_ready(f_tables(depth_m, rgb, disc))
    total += timeit("build_depth_tables", f_tables, depth_m, rgb, disc)

    @jax.jit
    def f_classify(vol, tables):
        return classify_blocks(vol, cam, tables, pose, vsz, cfg.trunc_dist,
                               resolution=cfg.volume_resolution)
    cls = jax.block_until_ready(f_classify(vol, tables))
    total += timeit("classify_blocks", f_classify, vol, tables)
    h = np.asarray(jax.device_get(cls))
    n_band = int((h == 2).sum())
    print(f"  (band blocks: {n_band} / {h.size} = {100*n_band/h.size:.1f}%)")

    @jax.jit
    def f_integrate(vol):
        return integrate_fast(vol, cam, depth_m, rgb, disc, pose, vsz,
                              cfg.trunc_dist, float(cfg.max_weight),
                              band_cap=cfg.band_cap)
    total += timeit("integrate_fast(full)", f_integrate, vol)

    @jax.jit
    def f_raycast(vol):
        return raycast_fast(vol, cam_half, pose, None, depth_half, vsz,
                            cfg.volume_size, cfg.trunc_dist)
    total += timeit("raycast_fast", f_raycast, vol)

    print(f"{'SUM of stages':34s} {total:8.2f} ms")

    # full fused step, batch dispatch
    from kintinuous_tpu.tracking.tracker import Tracker
    tracker = Tracker(cfg)
    n_unique = 12
    traj = orbit_trajectory(n_unique, radius=0.06, angle_deg=3.0)
    frames = [render_frame(Scene.default(), cam, T) for T in traj]

    def pingpong(i):
        period = 2 * (n_unique - 1)
        k = i % period
        return k if k < n_unique else period - k

    batch = 16
    tracker.process_frames(
        [(frames[pingpong(i)][0], frames[pingpong(i)][1], i * 33333)
         for i in range(1 + batch)])
    t0 = time.perf_counter()
    N = 4 * batch
    for b in range(N // batch):
        fr = [(frames[pingpong(1 + batch + b * batch + k)][0],
               frames[pingpong(1 + batch + b * batch + k)][1], 0)
              for k in range(batch)]
        tracker.process_frames(fr)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{'full batched step (per frame)':34s} {dt:8.2f} ms"
          f"  -> {1e3/dt:.1f} fps")


if __name__ == "__main__":
    main()
