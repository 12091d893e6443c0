#!/usr/bin/env python
"""Lap-accuracy experiment harness (dev tool, not part of the bench).

Runs ONE full-pipeline engine pass on the lap scenario with the
odometry levers exposed (fused ICP+RGB-D on/off, motion-prior weight,
arc-cornered lap radius) and prints the same metrics dict the bench's
C2/C3 phases export — used to tune PRIOR_W / ARC_RADIUS on the real
chip without paying for a full bench run each iteration.

    python tools/exp_lap.py --prior 0.01          # pivot lap, fused
    python tools/exp_lap.py --arc 0.45            # arc variant
    python tools/exp_lap.py --no-fused --prior 0  # r4 baseline config
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arc", type=float, default=0.0,
                    help="corner arc radius (m); 0 = in-place pivot")
    ap.add_argument("--prior", type=float, default=0.01,
                    help="constant-velocity prior weight")
    ap.add_argument("--no-fused", action="store_true",
                    help="ICP-only odometry (r4 C2 configuration)")
    args = ap.parse_args()

    import jax

    os.makedirs(bench.CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", f"{bench.CACHE_DIR}/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kintinuous_tpu.config import KintinuousConfig

    cfg = KintinuousConfig(
        fast_mode=True, voxel_shift=16, fast_odometry=True,
        extraction_capacity=500_000,
    ).replace(dynamic_cube=True)

    t0 = time.time()
    _, _, _, log, gt = bench._lap_cache(cfg, arc_radius=args.arc)
    print(f"[exp] frames ready (+{time.time()-t0:.0f}s)", file=sys.stderr)
    res = bench._engine_lap_run(
        cfg, log, gt, "exp_out", fused=not args.no_fused,
        prior_w=args.prior,
    )
    res["config"] = {
        "arc": args.arc, "prior": args.prior, "fused": not args.no_fused,
    }
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
