#!/usr/bin/env python
"""Second-round ablation: pyramids, raycast_pallas parts, icp, band."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import kintinuous_tpu.tracking.tracker as trk
from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame

BATCH = 16
REPS = 3


def build_inputs(cfg):
    cam = cfg.camera
    n_unique = 12
    traj = orbit_trajectory(n_unique, radius=0.06, angle_deg=3.0)
    frames = [render_frame(Scene.default(), cam, T) for T in traj]

    def pingpong(i):
        period = 2 * (n_unique - 1)
        k = i % period
        return k if k < n_unique else period - k

    depths = np.stack(
        [np.asarray(frames[pingpong(i)][0], np.uint16) for i in range(BATCH)])
    rgbs = np.stack(
        [np.asarray(frames[pingpong(i)][1], np.uint8) for i in range(BATCH)])
    return jnp.asarray(depths), jnp.asarray(rgbs)


def time_batched(cfg, depths, rgbs):
    from kintinuous_tpu.tracking.tracker import Tracker, make_batched_step_fast

    tracker = Tracker(cfg)
    tracker.process_frame(np.asarray(depths[0]), np.asarray(rgbs[0]), 0)
    tracker.flush()
    step = make_batched_step_fast(cfg, use_odometry=True, batch=BATCH)
    deltas = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1)))
    state = tracker.state
    state, *rest = step(state, depths, rgbs, deltas)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, *rest = step(state, depths, rgbs, deltas)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / (REPS * BATCH) * 1e3


def main():
    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True,
                           extraction_capacity=500_000)
    depths, rgbs = build_inputs(cfg)

    base = time_batched(cfg, depths, rgbs)
    print(f"{'full step':36s} {base:8.2f} ms/frame", flush=True)

    # --- raycast_pallas -> measurement-only maps ----------------------
    import kintinuous_tpu.ops.pallas_raycast as prc
    from kintinuous_tpu.ops.raycast_fast import FastRaycastResult

    orig_rp = prc.raycast_pallas

    def fake_rp(vol, cam, T, prev_vmap, measured_depth, vsz, vol_size, trunc,
                window=6, interpret=False):
        h, w = cam.height, cam.width
        z = measured_depth
        u = jnp.arange(w, dtype=jnp.float32)[None, :]
        v = jnp.arange(h, dtype=jnp.float32)[:, None]
        x = (u - cam.cx) / cam.fx * z
        y = (v - cam.cy) / cam.fy * z
        pc = jnp.stack([x, y, z], 0)
        pos = jnp.einsum("ij,jhw->ihw", T[:3, :3], pc) + T[:3, 3][:, None, None]
        n = jnp.zeros_like(pos).at[2].set(-1.0)
        return FastRaycastResult(
            vmap=pos, nmap=n, color=jnp.zeros_like(pos),
            weight=jnp.ones((h, w), jnp.float32), depth=z)

    prc.raycast_pallas = fake_rp
    v = time_batched(cfg, depths, rgbs)
    prc.raycast_pallas = orig_rp
    print(f"{'- raycast_pallas (all)':36s} {base - v:8.2f} (step={v:.2f})", flush=True)

    # --- deblock only (kernel keeps running on zeros volume) ----------
    orig_build = prc.build_logical_bf16
    prc.build_logical_bf16 = lambda vol, R, interpret=False: (
        jnp.zeros((R, R, R), jnp.bfloat16) + vol.tsdf[0, 0].astype(jnp.bfloat16)
    )
    v = time_batched(cfg, depths, rgbs)
    prc.build_logical_bf16 = orig_build
    print(f"{'- deblock (zeros volume)':36s} {base - v:8.2f} (step={v:.2f})", flush=True)

    # --- icp (with cholesky solve) ------------------------------------
    orig_icp = trk.icp_odometry

    def fake_icp(cam, cp, ppyr, iters, *a, **k):
        return jnp.eye(4, dtype=jnp.float32), jnp.float32(1e4), jnp.float32(0)

    trk.icp_odometry = fake_icp
    v = time_batched(cfg, depths, rgbs)
    trk.icp_odometry = orig_icp
    print(f"{'- icp_odometry':36s} {base - v:8.2f} (step={v:.2f})", flush=True)

    # --- build_map_pyramid / pyramid_from_maps ------------------------
    orig_bmp = trk.build_map_pyramid

    def fake_bmp(cam, depth, levels):
        h, w = depth.shape
        out = []
        for l in range(levels):
            hh, ww = h >> l, w >> l
            vm = jnp.zeros((3, hh, ww), jnp.float32) + depth[0, 0]
            out.append((vm, vm))
        return tuple(out)

    trk.build_map_pyramid = fake_bmp
    v = time_batched(cfg, depths, rgbs)
    trk.build_map_pyramid = orig_bmp
    print(f"{'- build_map_pyramid':36s} {base - v:8.2f} (step={v:.2f})", flush=True)

    orig_pfm = trk.pyramid_from_maps

    def fake_pfm(vm, nm, levels):
        out = [(vm, nm)]
        for l in range(1, levels):
            h, w = vm.shape[1] >> l, vm.shape[2] >> l
            out.append((vm[:, :h, :w], nm[:, :h, :w]))
        return tuple(out)

    trk.pyramid_from_maps = fake_pfm
    v = time_batched(cfg, depths, rgbs)
    trk.pyramid_from_maps = orig_pfm
    print(f"{'- pyramid_from_maps':36s} {base - v:8.2f} (step={v:.2f})", flush=True)

    # --- integrate parts ----------------------------------------------
    import kintinuous_tpu.ops.tsdf_fast as tf
    orig_int = tf.integrate_fast

    def int_nocarve(vol, cam, d, rgb, disc, T, vsz, trunc, mw, band_cap=8192,
                    **k):
        return orig_int(vol, cam, d, rgb, disc, T, vsz, trunc, mw,
                        band_cap=band_cap, carve=False)

    tf.integrate_fast = int_nocarve
    v = time_batched(cfg, depths, rgbs)
    print(f"{'- free carve':36s} {base - v:8.2f} (step={v:.2f})", flush=True)

    def int_noband(vol, cam, d, rgb, disc, T, vsz, trunc, mw, band_cap=8192,
                   **k):
        return orig_int(vol, cam, d, rgb, disc, T, vsz, trunc, mw,
                        band_cap=64, carve=True)

    tf.integrate_fast = int_noband
    v = time_batched(cfg, depths, rgbs)
    tf.integrate_fast = orig_int
    print(f"{'- band pass (->64)':36s} {base - v:8.2f} (step={v:.2f})", flush=True)


if __name__ == "__main__":
    main()
