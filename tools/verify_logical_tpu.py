#!/usr/bin/env python
"""On-chip check of the incremental dense-logical mirror (r5).

1. Mosaic-compiles update_logical_pairs at production shapes (512^3)
   and checks bit-equality against build_logical_bf16 after a partial
   refresh of a stale mirror.
2. Times: full deblock vs incremental update at a typical dirty count,
   and integrate/raycast with and without the mirror.

Run ONLY when the chip is otherwise idle (it perturbs any concurrent
bench timings).
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
    R = cfg.volume_resolution
    B = R // 8
    depth_mm, rgb = render_frame(Scene.default(), cam, np.eye(4))
    depth_mm = jnp.asarray(depth_mm.astype(np.float32))
    rgb = jnp.asarray(rgb.astype(np.float32))
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    vsz, trunc = cfg.voxel_size, cfg.trunc_dist

    depth_m = jax.jit(
        lambda d: pp.depth_to_metres(
            pp.bilateral_filter(d, cfg.bilateral_sigma_depth,
                                cfg.bilateral_sigma_space,
                                cfg.bilateral_radius), cfg.max_depth)
    )(depth_mm)
    depth_half = jax.jit(lambda d: pp.pyr_down_depth(d, sigma=0.09))(depth_m)
    cw = jnp.ones_like(depth_m)

    vol = make_blocked_volume(R)
    j_int = jax.jit(
        lambda v: integrate_pallas(v, cam, depth_m, rgb, cw, pose, vsz,
                                   trunc, 128.0, band_cap=cfg.band_cap,
                                   fb_cap=cfg.fallback_band_cap)
    )
    vol = j_int(vol)
    jax.block_until_ready(vol.tsdf)

    # --- correctness: partial refresh of a stale mirror ---------------
    j_full = jax.jit(lambda v: pr.build_logical_bf16(v, R))
    full = j_full(vol)

    n_pairs = (B * B) // 2
    rng = np.random.default_rng(0)
    dirty = np.sort(rng.choice(n_pairs, size=400, replace=False))
    lst = np.zeros(n_pairs, np.int32)
    lst[: len(dirty)] = dirty
    pairs = jnp.asarray(lst)
    cnt = jnp.int32(len(dirty))

    stale = jnp.zeros((R, R, R), jnp.bfloat16)
    j_upd = jax.jit(
        lambda t, l: pr.update_logical_pairs(t, l, pairs, cnt, R),
        donate_argnums=(1,),
    )
    upd = np.asarray(j_upd(vol.tsdf, stale))
    full_n = np.asarray(full)
    bad = 0
    for p in dirty:
        r0 = 2 * int(p)
        bz, by = r0 // B, r0 % B
        sl = np.s_[bz * 8:bz * 8 + 8, by * 8:by * 8 + 16, :]
        if not np.array_equal(upd[sl], full_n[sl]):
            bad += 1
    clean = np.ones(n_pairs, bool)
    clean[dirty] = False
    touched_clean = 0
    for p in np.nonzero(clean)[0][::37]:
        r0 = 2 * int(p)
        bz, by = r0 // B, r0 % B
        sl = np.s_[bz * 8:bz * 8 + 8, by * 8:by * 8 + 16, :]
        if np.abs(upd[sl].astype(np.float32)).sum() != 0.0:
            touched_clean += 1
    print(f"dirty pairs mismatching full deblock: {bad}/400")
    print(f"clean pairs disturbed: {touched_clean}")
    assert bad == 0 and touched_clean == 0

    # --- timing -------------------------------------------------------
    print(f"full deblock ms: {clock(j_full, vol):.2f}")

    def upd_t(t, l):
        return pr.update_logical_pairs(t, l, pairs, cnt, R)

    j_upd_t = jax.jit(upd_t, donate_argnums=(1,))
    l = j_upd_t(vol.tsdf, jnp.zeros((R, R, R), jnp.bfloat16))
    t0 = time.perf_counter()
    for _ in range(20):
        l = j_upd_t(vol.tsdf, l)
    jax.block_until_ready(l)
    print(f"incremental update (400 pairs) ms: "
          f"{(time.perf_counter() - t0) / 20 * 1000.0:.2f}")

    j_ray_full = jax.jit(
        lambda v, dh: pr.raycast_pallas(v, cam_half, pose, None, dh, vsz,
                                        cfg.volume_size, trunc,
                                        newton=cfg.raycast_newton_iters)
    )
    j_ray_inc = jax.jit(
        lambda v, lg, dh: pr.raycast_pallas(v, cam_half, pose, None, dh,
                                            vsz, cfg.volume_size, trunc,
                                            newton=cfg.raycast_newton_iters,
                                            logical=lg)
    )
    res = j_ray_inc(vol, full, depth_half)
    print(f"raycast full-deblock ms: {clock(j_ray_full, vol, depth_half):.2f}")
    print(f"raycast mirror ms: {clock(j_ray_inc, vol, full, depth_half):.2f}")
    print(f"fallback (mirror): {float(res.fallback_frac):.4f}")
    print("TPU VERIFY OK")


if __name__ == "__main__":
    main()
