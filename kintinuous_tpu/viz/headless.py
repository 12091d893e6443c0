"""Headless visualisation exports.

The reference's PangoVis (src/PangoVis.cpp) renders the live model,
image panes, trajectory frusta and stats into a Pangolin window; this
environment has no display, so the same signals export to files:
model renders (PNG), trajectory polylines (PLY), and a stats dict —
the data a web/remote viewer needs.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from kintinuous_tpu.io.ply import save_ply
from kintinuous_tpu.ops.image import generate_depth, generate_image


def save_model_views(basename: str, tracker) -> List[str]:
    """Renders the tracker's current prediction maps like the reference's
    model panes (PangoVis.cpp:45-80). Returns written paths."""
    import cv2

    out = []
    st = tracker.state
    vmap = np.asarray(st.pred_vmap)
    nmap = np.asarray(st.pred_nmap)
    shaded = np.asarray(generate_image(vmap, nmap))
    p = f"{basename}_model.png"
    cv2.imwrite(p, shaded[:, :, ::-1])
    out.append(p)
    z = vmap[2]
    depth = np.asarray(generate_depth(np.nan_to_num(z), 6.0))
    p = f"{basename}_model_depth.png"
    cv2.imwrite(p, depth[:, :, ::-1])
    out.append(p)
    return out


def save_trajectory_ply(path: str, poses: List[np.ndarray]) -> None:
    """Camera trajectory as a polyline point cloud with per-vertex
    colour ramp (the reference draws frusta + lines,
    PangoVis.cpp:421-436)."""
    if not poses:
        save_ply(path, np.zeros((0, 3), np.float32))
        return
    pts = np.array([T[:3, 3] for T in poses], np.float32)
    t = np.linspace(0, 1, len(pts))
    cols = np.stack(
        [255 * t, 80 + 100 * (1 - t), 255 * (1 - t)], axis=1
    ).astype(np.uint8)
    save_ply(path, pts, cols)


def stats_panel(engine) -> dict:
    """The reference's stats pane (points, triangles, fps, backend lag,
    PangoVis.cpp:584-600) as a dict."""
    n_points = sum(
        len(s.processed["points"]) if s.processed else len(s.points)
        for s in engine.slice_proc.processed
    )
    sw = engine.sw.stats()
    return {
        "frames": engine._frames_done,
        "fps": round(engine.fps, 2),
        "map_points": int(n_points),
        "slices": len(engine.tracker.slices),
        "loops_accepted": (
            engine.deformation.n_loops_accepted if engine.deformation else 0
        ),
        "loops_rejected": (
            engine.deformation.n_loops_rejected if engine.deformation else 0
        ),
        # max backend stage lag (PangoVis.cpp:597-599 role)
        "backend_lag_ms": round(engine.backend_lag_ms, 1),
        "stage_ms": {
            k: round(v["mean_ms"], 2)
            for k, v in sw.items()
            if not k.startswith("pulse.")
        },
    }
