#!/usr/bin/env python
"""Marginal per-stage cost inside the batched fast step, by ablation.

Builds batched steps with individual stages stubbed out (monkeypatch)
and reports the per-frame delta vs the full step. This measures in-situ
cost (fusion context, no dispatch overhead) — the only numbers that
matter for optimisation.
"""

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
    # seed one frame via single-step path
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
    print(f"{'full step':34s} {base:8.2f} ms/frame")

    # --- no raycast: return measurement-derived maps --------------------
    import kintinuous_tpu.ops.raycast_fast as rf
    orig_raycast = rf.raycast_fast

    def fake_raycast(vol, cam, T, prev_vmap, measured_depth, vsz, vol_size,
                     trunc, window=8):
        h, w = cam.height, cam.width
        z = measured_depth
        u = jnp.arange(w, dtype=jnp.float32)[None, :]
        v = jnp.arange(h, dtype=jnp.float32)[:, None]
        x = (u - cam.cx) / cam.fx * z
        y = (v - cam.cy) / cam.fy * z
        pc = jnp.stack([x, y, z], 0)
        pos = jnp.einsum("ij,jhw->ihw", T[:3, :3], pc) + T[:3, 3][:, None, None]
        n = jnp.zeros_like(pos).at[2].set(-1.0)
        return rf.FastRaycastResult(
            vmap=pos, nmap=n, color=jnp.zeros_like(pos),
            weight=jnp.ones((h, w), jnp.float32), depth=z)

    rf.raycast_fast = fake_raycast
    trk_rf = trk  # step imports raycast_fast inside make_step_fast at call time
    no_rc = time_batched(cfg, depths, rgbs)
    rf.raycast_fast = orig_raycast
    print(f"{'- raycast_fast':34s} {base - no_rc:8.2f} ms/frame (step={no_rc:.2f})")

    # --- no integrate ---------------------------------------------------
    import kintinuous_tpu.ops.tsdf_fast as tf
    orig_int = tf.integrate_fast
    tf.integrate_fast = lambda vol, *a, **k: vol
    no_int = time_batched(cfg, depths, rgbs)
    tf.integrate_fast = orig_int
    print(f"{'- integrate_fast':34s} {base - no_int:8.2f} ms/frame (step={no_int:.2f})")

    # --- carve only (band_cap minimal) ---------------------------------
    def int_nocarve(vol, cam, d, rgb, disc, T, vsz, trunc, mw, band_cap=12288,
                    **k):
        return orig_int(vol, cam, d, rgb, disc, T, vsz, trunc, mw,
                        band_cap=band_cap, carve=False)
    tf.integrate_fast = int_nocarve
    no_carve = time_batched(cfg, depths, rgbs)
    tf.integrate_fast = orig_int
    print(f"{'- free carve':34s} {base - no_carve:8.2f} ms/frame (step={no_carve:.2f})")

    def int_noband(vol, cam, d, rgb, disc, T, vsz, trunc, mw, band_cap=12288,
                   **k):
        return orig_int(vol, cam, d, rgb, disc, T, vsz, trunc, mw,
                        band_cap=64, carve=True)
    tf.integrate_fast = int_noband
    no_band = time_batched(cfg, depths, rgbs)
    tf.integrate_fast = orig_int
    print(f"{'- band pass (cap 12288->64)':34s} {base - no_band:8.2f} ms/frame (step={no_band:.2f})")

    # --- no icp ---------------------------------------------------------
    import kintinuous_tpu.tracking.odometry as odo
    orig_icp = odo.icp_odometry
    # note: tracker imports icp_odometry by name — patch through the module ref
    orig_trk_icp = trk.icp_odometry
    fake = lambda cam, cp, pp_, iters, *a, **k: (
        jnp.eye(4, jnp.float32.dtype and jnp.float32), jnp.float32(1e4),
        jnp.float32(0.0))

    def fake_icp(cam, cp, ppyr, iters, *a, **k):
        return jnp.eye(4, dtype=jnp.float32), jnp.float32(1e4), jnp.float32(0)
    trk.icp_odometry = fake_icp
    no_icp = time_batched(cfg, depths, rgbs)
    trk.icp_odometry = orig_trk_icp
    print(f"{'- icp_odometry':34s} {base - no_icp:8.2f} ms/frame (step={no_icp:.2f})")

    # --- no preprocess (raw depth) --------------------------------------
    import kintinuous_tpu.ops.preprocess as pp
    orig_bil = pp.bilateral_filter
    pp.bilateral_filter = lambda d, *a, **k: d
    no_bil = time_batched(cfg, depths, rgbs)
    pp.bilateral_filter = orig_bil
    print(f"{'- bilateral':34s} {base - no_bil:8.2f} ms/frame (step={no_bil:.2f})")

    # --- no slice extraction cond (static mode) -------------------------
    cfg_sm = KintinuousConfig(fast_mode=True, voxel_shift=16,
                              fast_odometry=True, static_mode=True,
                              extraction_capacity=500_000)
    sm = time_batched(cfg_sm, depths, rgbs)
    print(f"{'- shift/extract (static_mode)':34s} {base - sm:8.2f} ms/frame (step={sm:.2f})")


if __name__ == "__main__":
    main()
