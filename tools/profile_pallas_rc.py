#!/usr/bin/env python
"""Pallas raycast vs XLA gather raycast at production size on TPU."""

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
from kintinuous_tpu.ops.pallas_raycast import raycast_pallas
from kintinuous_tpu.ops.raycast_fast import raycast_fast
from kintinuous_tpu.ops.tsdf_fast import integrate_fast


def timeit(name, fn, *args, n=30):
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

    poses = orbit_trajectory(3, radius=0.06, angle_deg=3.0)
    d0, c0 = render_frame(Scene.default(), cam, poses[0])
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
        disc = pp.depth_discontinuity_mask(depth_m, radius=3, jump_m=0.2)
        return depth_m, depth_half, disc, rgb

    depth_m, depth_half, disc, rgb = jax.block_until_ready(
        prep(jnp.asarray(np.asarray(d0, np.uint16)),
             jnp.asarray(np.asarray(c0, np.uint8))))

    vol = make_blocked_volume(cfg.volume_resolution)
    vol = jax.block_until_ready(jax.jit(lambda v: integrate_fast(
        v, cam, depth_m, rgb, disc, pose, vsz, cfg.trunc_dist, 128.0,
        band_cap=cfg.band_cap))(vol))

    f_xla = jax.jit(lambda v: raycast_fast(
        v, cam_half, pose, None, depth_half, vsz, cfg.volume_size,
        cfg.trunc_dist))
    f_pal = jax.jit(lambda v: raycast_pallas(
        v, cam_half, pose, None, depth_half, vsz, cfg.volume_size,
        cfg.trunc_dist))

    a = jax.block_until_ready(f_xla(vol))
    b = jax.block_until_ready(f_pal(vol))
    da, db = np.asarray(a.depth), np.asarray(b.depth)
    both = (da > 0) & (db > 0)
    print(f"hits xla={int((da>0).sum())} pallas={int((db>0).sum())} "
          f"agree_med={np.median(np.abs(da[both]-db[both]))*1000:.2f}mm")

    timeit("raycast_fast (XLA gathers)", f_xla, vol)
    timeit("raycast_pallas", f_pal, vol)

    # isolate kernel from the bf16 volume build
    from kintinuous_tpu.ops.pallas_raycast import build_logical_bf16
    f_build = jax.jit(lambda v: build_logical_bf16(v, cfg.volume_resolution))
    timeit("  build_logical_bf16", f_build, vol)


if __name__ == "__main__":
    main()
