#!/usr/bin/env python
"""Raycast roofline reconciliation harness (VERDICT r4 #4).

Times each piece of ops/pallas_raycast.raycast_pallas separately at
production shapes (512^3, 320x240 half-res) on the real chip:

  deblock     build_logical_bf16 (blocked -> dense logical bf16)
  prologue    XLA warm start + per-tile region corners (median etc.)
  pass1       the Pallas tile kernel, full grid
  full        raycast_pallas end-to-end (adds pass 2 + XLA post)

The header's ~2 ms model covered ONLY pass1's MXU work + tile DMA;
whatever the gaps between these rows show is where the 12.29 ms
measured stage time actually goes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def clock(fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kintinuous_tpu.config import KintinuousConfig
    from kintinuous_tpu.io.synth import Scene, render_frame
    from kintinuous_tpu.ops import preprocess as pp
    from kintinuous_tpu.ops.blocked import make_blocked_volume
    from kintinuous_tpu.ops.pallas_integrate import integrate_pallas
    from kintinuous_tpu.ops import pallas_raycast as pr

    cfg = KintinuousConfig(fast_mode=True, fast_odometry=True)
    cam = cfg.camera
    cam_half = cam.at_level(1)
    depth_mm, rgb = render_frame(Scene.default(), cam, np.eye(4))
    depth_mm = jnp.asarray(depth_mm.astype(np.float32))
    rgb = jnp.asarray(rgb.astype(np.float32))
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    vol = make_blocked_volume(cfg.volume_resolution)
    vsz, trunc = cfg.voxel_size, cfg.trunc_dist
    R = cfg.volume_resolution

    depth_m = jax.jit(
        lambda d: pp.depth_to_metres(
            pp.bilateral_filter(d, cfg.bilateral_sigma_depth,
                                cfg.bilateral_sigma_space,
                                cfg.bilateral_radius), cfg.max_depth)
    )(depth_mm)
    depth_half = jax.jit(lambda d: pp.pyr_down_depth(d, sigma=0.09))(depth_m)
    cw = jnp.ones_like(depth_m)
    vol = jax.jit(
        lambda v: integrate_pallas(v, cam, depth_m, rgb, cw, pose, vsz,
                                   trunc, 128.0, band_cap=cfg.band_cap,
                                   fb_cap=cfg.fallback_band_cap)
    )(vol)
    jax.block_until_ready(vol.tsdf)

    results = {}

    # --- deblock ------------------------------------------------------
    j_deb = jax.jit(lambda v: pr.build_logical_bf16(v, R))
    results["deblock_ms"] = clock(j_deb, vol)

    # --- full raycast -------------------------------------------------
    def full(v, dh):
        return pr.raycast_pallas(v, cam_half, pose, None, dh, vsz,
                                 cfg.volume_size, trunc,
                                 newton=cfg.raycast_newton_iters)

    j_full = jax.jit(full)
    res = j_full(vol, depth_half)
    results["full_ms"] = clock(j_full, vol, depth_half)
    results["fallback"] = float(res.fallback_frac)

    # --- variants via knobs: window/newton to split march vs refine ---
    def nwt0(v, dh):
        return pr.raycast_pallas(v, cam_half, pose, None, dh, vsz,
                                 cfg.volume_size, trunc, newton=0)

    results["full_newton0_ms"] = clock(jax.jit(nwt0), vol, depth_half)

    def win3(v, dh):
        return pr.raycast_pallas(v, cam_half, pose, None, dh, vsz,
                                 cfg.volume_size, trunc, window=3,
                                 newton=cfg.raycast_newton_iters)

    results["full_window3_ms"] = clock(jax.jit(win3), vol, depth_half)

    for k, v in results.items():
        print(f"{k:>18}: {v:.3f}")


if __name__ == "__main__":
    main()
