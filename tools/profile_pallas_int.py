#!/usr/bin/env python
"""Time integrate_pallas vs integrate_fast on the real chip."""

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
from kintinuous_tpu.ops.pallas_integrate import integrate_pallas, _plan_blocks, _patch_dims
from kintinuous_tpu.ops.tsdf_fast import build_depth_tables, integrate_fast


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


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

    # plan stats
    R = cfg.volume_resolution
    Hp, Wp, PH, PW = _patch_dims(cam.height, cam.width)
    tables = build_depth_tables(cam, depth_m, rgb, disc)
    PH0 = min(48, Hp)
    PH2, PW2 = min(224, Hp), min(512, Wp)
    plan = jax.jit(lambda v: _plan_blocks(
        v, cam, tables, pose, vsz, cfg.trunc_dist, R,
        cfg.band_cap, 4096, 1024, cfg.fallback_band_cap, 12288,
        Hp, PH0, PH, PW, PH2, PW2))(vol)
    print(f"n_t0={int(plan.n_t0)} n_pallas={int(plan.n_pallas)} n_t2={int(plan.n_t2)} n_fb={int(plan.n_fb)} "
          f"n_free={int(plan.n_free)}")

    f_fast = jax.jit(lambda v: integrate_fast(
        v, cam, depth_m, rgb, disc, pose, vsz, cfg.trunc_dist,
        float(cfg.max_weight), band_cap=cfg.band_cap))
    f_pal = jax.jit(lambda v: integrate_pallas(
        v, cam, depth_m, rgb, disc, pose, vsz, cfg.trunc_dist,
        float(cfg.max_weight), band_cap=cfg.band_cap,
        fb_cap=cfg.fallback_band_cap))

    vol = jax.block_until_ready(f_pal(vol))
    timeit("integrate_fast (XLA gathers)", f_fast, vol)
    timeit("integrate_pallas", f_pal, vol)


if __name__ == "__main__":
    main()
