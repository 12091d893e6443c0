#!/usr/bin/env python
"""Decompose the shift-frame cost on the real TPU.

Stages (each jitted separately, checksum-forced):
  1. slab densify (ops/blocked.slab_to_dense, tsdf+cw)
  2. + crossing masks
  3. + cumsum compaction indices
  4. full extract_points (adds the scatter)
  5. band clear + physical roll (the do_clear path)
  6. whole fast step on a shift frame vs a non-shift frame
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(name, fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from kintinuous_tpu.config import KintinuousConfig
    from kintinuous_tpu.io.synth import Scene, render_frame
    from kintinuous_tpu.ops import preprocess as pp
    from kintinuous_tpu.ops import maps as map_ops
    from kintinuous_tpu.ops.blocked import make_blocked_volume, slab_to_dense
    from kintinuous_tpu.ops.extract import extract_points
    from kintinuous_tpu.ops.pallas_integrate import integrate_pallas
    from kintinuous_tpu.ops.tsdf import VolumeState, unpack_cw

    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True,
                           extraction_capacity=500_000)
    cam = cfg.camera
    R = cfg.volume_resolution
    S, OV = cfg.voxel_shift, cfg.shift_overlap
    vsz = cfg.voxel_size
    cap = cfg.extraction_capacity
    SLAB_B = max(2, -(-(S + OV + 1) // 8))
    B_grid = R // 8

    d0, c0 = render_frame(Scene.default(), cam, np.eye(4))
    depth_m = pp.depth_to_metres(jnp.asarray(d0.astype(np.float32)), 6.0)
    rgb = jnp.asarray(c0.astype(np.float32))
    disc = pp.depth_discontinuity_mask(depth_m, radius=3, jump_m=0.2)
    cw_img = map_ops.color_fusion_weight(cam, depth_m, disc, angle=True)
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    vol = make_blocked_volume(R)
    vol = jax.jit(
        lambda v: integrate_pallas(
            v, cam, depth_m, rgb, cw_img, pose, vsz, cfg.trunc_dist, 128.0,
            band_cap=cfg.band_cap, fb_cap=cfg.fallback_band_cap,
        ),
        donate_argnums=(0,),
    )(vol)

    axis = 0
    s = jnp.int32(S)
    b0 = jnp.int32(0)

    def densify(v):
        t = slab_to_dense(v.tsdf, axis, b0, SLAB_B)
        c = slab_to_dense(v.cw, axis, b0, SLAB_B)
        return t.sum() + c.astype(jnp.float32).sum()

    timeit("1 slab densify (tsdf+cw)", jax.jit(densify), vol)

    def build_view(v):
        return VolumeState(
            tsdf=slab_to_dense(v.tsdf, axis, b0, SLAB_B),
            cw=slab_to_dense(v.cw, axis, b0, SLAB_B),
            wrap=jnp.zeros(3, jnp.int32), origin=v.origin,
        )

    lo = jnp.zeros(3, jnp.int32)
    coff = jnp.zeros(3, jnp.int32)
    size = (S + OV, R, R)

    def crossings_only(v):
        view = build_view(v)
        # replicate extract_points' gather + crossing math cheaply by
        # running it and returning only the count (XLA drops the
        # scatter outputs? no — count depends on mask only, so DCE
        # removes the scatter)
        res = extract_points(view, lo, size, vsz, cap, clamp_edges=True,
                             coord_offset=coff)
        return res.count

    timeit("2 densify+crossings+count (scatter DCE'd)",
           jax.jit(crossings_only), vol)

    def full_extract(v):
        view = build_view(v)
        res = extract_points(view, lo, size, vsz, cap, clamp_edges=True,
                             coord_offset=coff)
        return res.points.sum() + res.count

    timeit("3 full extract (with scatter)", jax.jit(full_extract), vol)

    def clear_roll(v):
        B = R // 8
        sb = jnp.array([S // 8, 0, 0], jnp.int32)
        keep = jnp.ones((B ** 3, 4, 128), bool)
        t = jnp.roll(v.tsdf.reshape(B, B, B, 4, 128),
                     shift=(-sb[2], -sb[1], -sb[0]), axis=(0, 1, 2)
                     ).reshape(-1, 4, 128)
        c = jnp.roll(v.cw.reshape(B, B, B, 4, 128),
                     shift=(-sb[2], -sb[1], -sb[0]), axis=(0, 1, 2)
                     ).reshape(-1, 4, 128)
        return t.sum() + c.astype(jnp.float32).sum()

    timeit("4 band clear + physical roll", jax.jit(clear_roll), vol)


if __name__ == "__main__":
    main()
