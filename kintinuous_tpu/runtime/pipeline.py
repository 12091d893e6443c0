"""End-to-end SLAM run orchestration.

Plays the role of MainController + TrackerInterface
(src/MainController.cpp:66-160, src/backend/TrackerInterface.cpp:44-118)
for offline `.klg` processing: log reading (with background decode
prefetch), ground-truth replay when configured, tracking, pose dumps,
and handing slices to the backend. The full free-running threaded
backend (slice processor / mesher / place recognition / deformation)
builds on this in kintinuous_tpu.runtime.engine.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.io.klg import KlgLogReader
from kintinuous_tpu.io.tum import TrajectoryWriter, load_trajectory
from kintinuous_tpu.tracking.odometry import GroundTruthOdometry
from kintinuous_tpu.tracking.tracker import CloudSlice, Tracker


@dataclass
class RunResult:
    poses: List[np.ndarray]
    stamps_us: List[int]
    slices: List[CloudSlice]
    n_frames: int
    elapsed_s: float
    stats: dict = field(default_factory=dict)

    @property
    def fps(self) -> float:
        return self.n_frames / self.elapsed_s if self.elapsed_s > 0 else 0.0


def run_slam(
    cfg: KintinuousConfig,
    poses_path: Optional[str] = None,
    slice_callback: Optional[Callable[[CloudSlice], None]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> RunResult:
    """Process cfg.log_file end to end; returns trajectory + slices.

    Pose files use TUM format like the reference's `.poses` dump
    (KintinuousTracker.cpp:199-218).
    """
    assert cfg.log_file, "cfg.log_file required"
    cam = cfg.camera
    tracker = Tracker(cfg, slice_callback=slice_callback)

    gt: Optional[GroundTruthOdometry] = None
    if cfg.trajectory_file:
        stamps, poses = load_trajectory(cfg.trajectory_file)
        gt = GroundTruthOdometry(stamps, poses)

    writer = TrajectoryWriter(poses_path) if poses_path else None
    t0 = time.perf_counter()
    n = 0
    with KlgLogReader(
        cfg.log_file, width=cam.width, height=cam.height,
        max_frames=cfg.total_num_frames,
    ) as reader:
        total = reader.total_num_frames
        frame_budget = 1.0 / cfg.frame_rate_limit if cfg.frame_rate_limit else None
        for frame in reader:
            t_frame = time.perf_counter()
            delta = gt.delta(frame.timestamp) if gt is not None else None
            tracker.process_frame(frame.depth, frame.rgb, frame.timestamp, ext_delta=delta)
            n += 1
            if progress:
                progress(n, total)
            if frame_budget:  # 30 Hz throttle (TrackerInterface.cpp:108-112)
                spare = frame_budget - (time.perf_counter() - t_frame)
                if spare > 0:
                    time.sleep(spare)
    tracker.flush()
    elapsed = time.perf_counter() - t0
    tracker.finalise()

    if writer:
        for ts, T in zip(tracker.stamps_us, tracker.poses):
            writer.write(ts, T)
        writer.close()

    return RunResult(
        poses=tracker.poses,
        stamps_us=tracker.stamps_us,
        slices=tracker.slices,
        n_frames=n,
        elapsed_s=elapsed,
        stats=tracker.stats,
    )
