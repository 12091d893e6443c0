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

    @jax.jit
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
    f_rc = jax.jit(lambda v: raycast_fast(
        v, cam_half, pose, None, depth_half, vsz, cfg.volume_size,
        cfg.trunc_dist))
    timeit("raycast_fast window=8", f_rc, vol)
    f_rc4 = jax.jit(lambda v: raycast_fast(
        v, cam_half, pose, None, depth_half, vsz, cfg.volume_size,
        cfg.trunc_dist, window=4))
    timeit("raycast_fast window=4", f_rc4, vol)


if __name__ == "__main__":
    main()
