#!/usr/bin/env python
"""Lap-scenario frontend evaluation on the real TPU chip.

Runs the batched device-resident tracker over the cached lap frames
(the ONE trustworthy harness — see memory: isolated micro-benches lie)
with configurable odometry settings, and reports pre-loop ATE plus
per-frame delta-error diagnostics around the pivot corners.

Usage:
  python tools/eval_lap.py [--fused] [--prior W] [--arc R] [--fps]

This is a diagnostic tool; bench.py remains the driver-facing bench.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
BATCH = 32
CACHE_DIR = "/root/repo/.bench_cache"


def lap_cache(cfg, arc_radius=0.0):
    from kintinuous_tpu.io.synth import generate_klg, lap_scene, lap_trajectory

    os.makedirs(CACHE_DIR, exist_ok=True)
    poses = lap_trajectory(
        length=3.2, depth=2.4, step=0.055, turn_frames=26,
        warmup_frames=10, revisit_frac=0.35, arc_radius=arc_radius,
    )
    n = len(poses)
    tag = f"lap2_{n}" if arc_radius == 0.0 else f"laparc{arc_radius:g}_{n}"
    cache = f"{CACHE_DIR}/{tag}.npz"
    log = f"{CACHE_DIR}/{tag}.klg"
    gt = f"{CACHE_DIR}/{tag}.gt"
    if not (os.path.exists(cache) and os.path.exists(log) and os.path.exists(gt)):
        scene = lap_scene(length=3.2, depth=2.4)
        generate_klg(log, cfg.camera, poses, scene=scene, depth_noise_mm=6.0,
                     gt_path=gt)
        from kintinuous_tpu.io.klg import KlgLogReader

        ds, cs = [], []
        for fr in KlgLogReader(log):
            ds.append(fr.depth)
            cs.append(fr.rgb)
        np.savez(cache, depths=np.stack(ds), rgbs=np.stack(cs))
    d = np.load(cache)
    return d["depths"], d["rgbs"], np.stack(poses), log, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", action="store_true", help="ICP+RGB-D odometry")
    ap.add_argument("--prior", type=float, default=0.0,
                    help="odom_prior_weight (0 = off)")
    ap.add_argument("--arc", type=float, default=0.0,
                    help="lap corner arc radius (0 = in-place pivots)")
    ap.add_argument("--fps", action="store_true", help="also time the pass")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", f"{CACHE_DIR}/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kintinuous_tpu.config import KintinuousConfig
    from kintinuous_tpu.tracking.tracker import Tracker

    cfg = KintinuousConfig(
        fast_mode=True,
        voxel_shift=16,
        fast_odometry=True,
        extraction_capacity=500_000,
        dynamic_cube=True,
        icp_plus_rgbd=args.fused,
        odom_prior_weight=args.prior,
    )
    depths, rgbs, gt_poses, log, gt = lap_cache(cfg, arc_radius=args.arc)
    n_frames = len(depths)
    print(f"[eval_lap] {n_frames} frames, fused={args.fused} "
          f"prior={args.prior} arc={args.arc}", flush=True)

    tracker = Tracker(cfg)
    tracker.collect_slices = False
    t0 = time.time()
    tracker.process_frames(
        [(depths[i], rgbs[i], i * 33333) for i in range(1 + BATCH)]
    )
    print(f"[eval_lap] warm done (+{time.time()-t0:.0f}s)", flush=True)
    dev_d = jnp.asarray(depths.astype(np.uint16))
    dev_c = jnp.asarray(rgbs.astype(np.uint8))
    gather = jax.jit(lambda ds, cs, idx: (ds[idx], cs[idx]))
    batches = []
    k = 1 + BATCH
    while k + BATCH <= n_frames:
        idx = jnp.arange(k, k + BATCH, dtype=jnp.int32)
        d_b, c_b = gather(dev_d, dev_c, idx)
        batches.append((d_b, c_b, [i * 33333 for i in range(k, k + BATCH)]))
        k += BATCH
    jax.block_until_ready(batches[-1][0])
    t1 = time.perf_counter()
    for d_b, c_b, ts in batches:
        tracker.process_batch_device(d_b, c_b, ts)
    tracker.flush()
    el = time.perf_counter() - t1
    n_done = len(tracker.poses)
    if args.fps:
        print(f"[eval_lap] {len(batches)*BATCH} frames in {el:.2f}s = "
              f"{len(batches)*BATCH/el:.2f} fps", flush=True)

    est = np.array(tracker.poses)  # global (n,4,4)
    gtp = gt_poses[:n_done]
    # ATE with alignment (same convention as eval.ate)
    from kintinuous_tpu.eval.ate import absolute_trajectory_error

    stamps = np.array(tracker.stamps_us) / 1e6
    gs = np.arange(n_frames) / 30.0
    ate, _ = absolute_trajectory_error(gs, gt_poses, stamps, est)
    print(f"ATE pre-loop: {ate*100:.2f} cm over {n_done} frames", flush=True)

    # per-frame delta error: d_err = || log( (gt_i^-1 gt_{i+1})^-1 *
    # (est_i^-1 est_{i+1}) ) ||, split rot/trans
    rel_t, rel_r = [], []
    for i in range(1, n_done):
        d_gt = np.linalg.inv(gtp[i - 1]) @ gtp[i]
        d_es = np.linalg.inv(est[i - 1]) @ est[i]
        e = np.linalg.inv(d_gt) @ d_es
        rel_t.append(np.linalg.norm(e[:3, 3]))
        cosang = (np.trace(e[:3, :3]) - 1.0) / 2.0
        rel_r.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    rel_t = np.array(rel_t)
    rel_r = np.array(rel_r)
    worst = np.argsort(rel_t)[-12:][::-1]
    print("worst per-frame translation errors (frame, mm, deg):", flush=True)
    for w in worst:
        print(f"  f{w+1}: {rel_t[w]*1000:7.1f} mm  {rel_r[w]:5.2f} deg",
              flush=True)
    print(f"median |dt| err {np.median(rel_t)*1000:.2f} mm, "
          f"median |dr| err {np.median(rel_r):.3f} deg", flush=True)
    icp_min = min(tracker.stats["icp_count"][2:], default=0)
    print(f"min icp inliers {icp_min}", flush=True)


if __name__ == "__main__":
    main()
