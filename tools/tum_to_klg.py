#!/usr/bin/env python
"""Convert a TUM RGB-D (or ICL-NUIM TUM-compatible) dataset to `.klg`.

The reference consumes `.klg` logs only (src/utils/RawLogReader.cpp:52-64);
TUM sequences ship as directories of PNGs plus `rgb.txt` / `depth.txt`
index files and a `groundtruth.txt` trajectory. This tool pairs
depth/rgb frames by nearest timestamp (the role of TUM's associate.py,
max pairing gap 20 ms) and writes:

  <out>.klg       depth (mm, zlib) + rgb (jpeg) frames
  <out>.gt        groundtruth trajectory in TUM line format (if present)

Depth scaling: TUM 16-bit PNGs store depth/5000 m per unit, i.e. 0.2 mm
units; `.klg` depth is uint16 millimetres, so raw/5 (ICL-NUIM's
TUM-compatible exports use the same 5000 factor).

Usage:
  python tools/tum_to_klg.py <dataset_dir> <out.klg> [--max-diff 0.02]

Then run, e.g.:
  python -m kintinuous_tpu.cli -l out.klg -ri -od -m  ...
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kintinuous_tpu.io.klg import KlgLogWriter

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def read_index(path: str) -> list:
    """Parse a TUM index file: `timestamp filename` per line."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= 2:
                rows.append((float(parts[0]), parts[1]))
    return rows


def associate(depth_rows, rgb_rows, max_diff: float):
    """Nearest-timestamp pairing, each rgb used at most once
    (associate.py role; greedy over sorted candidate gaps).

    Candidate pairs come from a two-pointer sweep over the (sorted)
    timestamp lists — a full NxM cross product is ~6M iterations on a
    real TUM sequence and took minutes (ADVICE r2)."""
    cands = []
    rts = [rt for rt, _ in rgb_rows]
    j = 0
    for di, (dt, _) in enumerate(depth_rows):
        while j < len(rts) and rts[j] < dt - max_diff:
            j += 1
        k = j
        while k < len(rts) and rts[k] <= dt + max_diff:
            cands.append((abs(dt - rts[k]), di, k))
            k += 1
    cands.sort()
    pairs = []
    used_d, used_r = set(), set()
    for gap, di, ri in cands:
        if di not in used_d and ri not in used_r:
            used_d.add(di)
            used_r.add(ri)
            pairs.append((di, ri))
    pairs.sort()
    return pairs


def load_depth_mm(path: str, depth_factor: float) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"cannot read depth image {path}")
    # units-per-metre -> millimetres; round (not truncate) to avoid a
    # systematic downward depth bias for non-integral factors (ADVICE r2)
    return np.round(img.astype(np.float64) * (1000.0 / depth_factor)).astype(
        np.uint16
    )


def convert(dataset_dir: str, out_klg: str, max_diff: float = 0.02,
            depth_factor: float = 5000.0, max_frames: int = -1) -> int:
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("tum_to_klg requires cv2 for PNG decode")
    depth_rows = sorted(read_index(os.path.join(dataset_dir, "depth.txt")))
    rgb_rows = sorted(read_index(os.path.join(dataset_dir, "rgb.txt")))
    pairs = associate(depth_rows, rgb_rows, max_diff)
    if max_frames > 0:
        pairs = pairs[:max_frames]
    n = 0
    with KlgLogWriter(out_klg) as w:
        for di, ri in pairs:
            dt, dpath = depth_rows[di]
            _, rpath = rgb_rows[ri]
            depth = load_depth_mm(os.path.join(dataset_dir, dpath), depth_factor)
            bgr = cv2.imread(os.path.join(dataset_dir, rpath), cv2.IMREAD_COLOR)
            if bgr is None:
                raise IOError(f"cannot read rgb image {rpath}")
            w.write(int(round(dt * 1e6)), depth, bgr[:, :, ::-1])
            n += 1
    gt_src = os.path.join(dataset_dir, "groundtruth.txt")
    if os.path.exists(gt_src):
        out_gt = os.path.splitext(out_klg)[0] + ".gt"
        with open(gt_src) as f, open(out_gt, "w") as g:
            for line in f:
                if line.strip() and not line.startswith("#"):
                    g.write(line)
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("dataset_dir")
    ap.add_argument("out_klg")
    ap.add_argument("--max-diff", type=float, default=0.02,
                    help="max depth/rgb timestamp gap (s)")
    ap.add_argument("--depth-factor", type=float, default=5000.0,
                    help="depth PNG units per metre (TUM/ICL: 5000)")
    ap.add_argument("--max-frames", type=int, default=-1)
    args = ap.parse_args()
    n = convert(args.dataset_dir, args.out_klg, args.max_diff,
                args.depth_factor, args.max_frames)
    print(f"wrote {n} frames to {args.out_klg}")


if __name__ == "__main__":
    main()
