import numpy as np
import pytest

from kintinuous_tpu.config import CameraIntrinsics, tiny_test_config
from kintinuous_tpu.eval.ate import absolute_trajectory_error
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame, straight_trajectory
from kintinuous_tpu.tracking.tracker import Tracker

CAM = CameraIntrinsics(fx=70.0, fy=70.0, cx=40.0, cy=30.0, width=80, height=60)


def run_sequence(cfg, poses, use_gt=False, scene=None):
    scene = scene or Scene.default()
    tracker = Tracker(cfg)
    last = None
    for i, T in enumerate(poses):
        depth_mm, rgb = render_frame(scene, CAM, T)
        delta = None
        if use_gt:
            delta = (np.linalg.inv(last) @ T).astype(np.float32) if last is not None else np.eye(4, dtype=np.float32)
        tracker.process_frame(depth_mm, rgb, int(i * 1e6 / 30), ext_delta=delta)
        last = T
    tracker.flush()
    return tracker


def ate_of(tracker, poses):
    stamps = np.arange(len(poses)) / 30.0
    est_st = np.array(tracker.stamps_us) / 1e6
    est = np.array(tracker.poses)
    ate, n = absolute_trajectory_error(stamps, np.array(poses), est_st, est)
    assert n == len(poses)
    return ate


def test_static_mode_icp_tracking():
    """Plain KinectFusion (-sm): ICP frame-to-model on an orbit stays
    within a couple of voxels of ground truth."""
    cfg = tiny_test_config(static_mode=True, camera=CAM)
    poses = orbit_trajectory(20, radius=0.15, angle_deg=8.0)
    tracker = run_sequence(cfg, poses)
    ate = ate_of(tracker, poses)
    assert ate < 0.03, f"ATE {ate*100:.2f} cm too high"
    # tracked against the model: inliers should be plentiful after frame 1
    assert min(tracker.stats["icp_count"][2:]) > 500


def test_shifting_emits_slices_and_keeps_global_frame():
    """Ground-truth replay along +x: the volume must shift, emit slices,
    and keep global poses exact."""
    cfg = tiny_test_config(camera=CAM)
    dist = 1.0
    poses = straight_trajectory(25, distance=dist, axis=0)
    tracker = run_sequence(cfg, poses, use_gt=True)
    ate = ate_of(tracker, poses)
    assert ate < 1e-3, f"GT replay ATE {ate} should be ~0"
    n_shifts = sum(1 for s in tracker.shift_log if s[0] > 0)
    assert n_shifts >= 4, f"expected >=4 x-shifts over 1 m, got {n_shifts}"
    # early departing bands are empty space; later ones carry surface
    xplus = [s for s in tracker.slices if s.dimension == "XPlus"]
    assert len(xplus) >= 2, f"got slice dims {[s.dimension for s in tracker.slices]}"
    # slice points must lie on scene surfaces in GLOBAL coords: the room
    # walls are at y=+-2, x=+-2, z=+-2 relative to the first camera, and
    # the tracker's global frame has the camera starting at volume center.
    start = np.array([cfg.volume_size / 2] * 3)
    pts = np.concatenate([s.points for s in xplus]) - start  # world coords
    assert len(pts) > 30
    inside = (np.abs(pts) < 2.05).all(axis=1)
    assert inside.mean() > 0.99  # nothing outside the room


def test_finalise_extracts_final_slice():
    cfg = tiny_test_config(static_mode=True, camera=CAM)
    poses = orbit_trajectory(5, radius=0.05, angle_deg=3.0)
    tracker = run_sequence(cfg, poses)
    final = tracker.finalise()
    assert final.dimension == "FINAL"
    assert len(final.points) > 500
    assert tracker.slices[-1] is final


def test_static_mode_never_shifts():
    cfg = tiny_test_config(static_mode=True, camera=CAM)
    poses = straight_trajectory(10, distance=0.8, axis=0)
    tracker = run_sequence(cfg, poses, use_gt=True)
    assert all(s.dimension == "FINAL" for s in tracker.slices)


def test_shift_relocalises_pose_within_volume():
    """After long travel the LOCAL pose must stay near the volume
    center (the whole point of shifting)."""
    cfg = tiny_test_config(camera=CAM)
    poses = straight_trajectory(30, distance=1.2, axis=0)
    tracker = run_sequence(cfg, poses, use_gt=True)
    local_t = np.asarray(tracker.state.pose)[:3, 3]
    center = cfg.volume_size / 2
    # stays within threshold + one frame of motion of the center
    assert abs(local_t[0] - center) < cfg.voxel_shift * cfg.voxel_size + 0.1
    # and global pose equals gt travel + start offset
    g = tracker.poses[-1][:3, 3]
    expect = np.array([center + 1.2, center, center])
    np.testing.assert_allclose(g, expect, atol=2e-3)
