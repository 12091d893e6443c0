import numpy as np
import jax.numpy as jnp

from kintinuous_tpu.backend.deform_runner import MapDeformation
from kintinuous_tpu.backend.place_recognition import LoopConstraint
from kintinuous_tpu.config import tiny_test_config
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.tracking.tracker import CloudSlice


def exp(xi):
    return np.asarray(se3.exp_se3(jnp.asarray(xi, dtype=jnp.float32)), np.float64)


def drifting_square(n_side=10, step=0.3, drift_deg=1.0):
    """A square loop trajectory with yaw drift; ends where it started."""
    gt, est = [np.eye(4)], [np.eye(4)]
    yaw_step = np.deg2rad(90.0) / n_side
    drift = np.deg2rad(drift_deg)
    step_gt = exp([0, 0, 0, step, 0, 0])
    for s in range(4):
        for k in range(n_side):
            turn = exp([0, yaw_step if k == n_side - 1 else 0, 0, 0, 0, 0])
            gt.append(gt[-1] @ step_gt @ turn)
            bad = exp([0, drift, 0, 0, 0, 0])
            est.append(est[-1] @ step_gt @ turn @ bad)
    return gt, est


def make_slice(points, ts, pose=None):
    n = len(points)
    return CloudSlice(
        points=points.astype(np.float32),
        colors=np.full((n, 3), 128, np.uint8),
        weights=np.full(n, 10.0),
        dimension="XPlus",
        pose=np.eye(4) if pose is None else np.asarray(pose, np.float64),
        timestamp_us=int(ts),
        frame_index=0,
        processed={
            "points": points.astype(np.float32),
            "colors": np.full((n, 3), 128, np.uint8),
            "normals": np.zeros((n, 3), np.float32),
            "weights": np.full(n, 10.0),
        },
    )


def test_loop_closure_deforms_map():
    cfg = tiny_test_config(isam_thresh=100.0, dense_sampling_rate=0.5)
    md = MapDeformation(cfg)
    gt, est = drifting_square()
    times = [int(k * 1e6 / 3) for k in range(len(gt))]
    rng = np.random.default_rng(0)
    for k, (T, ts) in enumerate(zip(est, times)):
        md.add_frame_pose(ts, T)
        # a small cloud patch around each pose (in the DRIFTED frame, as
        # the frontend would have placed it)
        pts = T[:3, 3][None, :] + rng.uniform(-0.1, 0.1, (30, 3))
        md.add_slice(make_slice(pts, ts))

    end_err_before = np.linalg.norm(md.graph.poses[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_before > 0.2  # drift accumulated

    # loop constraint: last frame is physically at the first frame's place
    T_1_2 = np.linalg.inv(gt[0]) @ gt[-1]
    inl1 = rng.uniform(-0.5, 0.5, (50, 3))
    inl2 = (inl1 - T_1_2[:3, 3]) @ T_1_2[:3, :3]  # same points in frame-2 coords
    c = LoopConstraint(
        time1=times[0], time2=times[-1], T_1_2=T_1_2,
        inliers1=inl1, inliers2=inl2, icp_score=0.001,
    )
    accepted = md.add_loop(c)
    assert accepted
    end_err_after = np.linalg.norm(md.graph.poses[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_after < end_err_before * 0.5
    # the pool followed the correction: last slice sits near its
    # (corrected) pose
    last = md.slices[-1]
    d = np.linalg.norm(last.processed["points"].mean(axis=0) - last.pose[:3, 3])
    assert d < 0.4


def test_late_slice_rebased_onto_corrected_trajectory():
    """A slice added AFTER an accepted loop must be re-based by
    isamPose * rawPose^-1 (Deformation.cpp:377) — otherwise post-loop
    slices keep the frontend's uncorrected placement and the map forks."""
    cfg = tiny_test_config(isam_thresh=100.0, dense_sampling_rate=0.5)
    md = MapDeformation(cfg)
    gt, est = drifting_square()
    times = [int(k * 1e6 / 3) for k in range(len(gt))]
    rng = np.random.default_rng(1)
    for T, ts in zip(est, times):
        md.add_frame_pose(ts, T)
        pts = T[:3, 3][None, :] + rng.uniform(-0.1, 0.1, (30, 3))
        md.add_slice(make_slice(pts, ts))
    T_1_2 = np.linalg.inv(gt[0]) @ gt[-1]
    inl1 = rng.uniform(-0.5, 0.5, (50, 3))
    inl2 = (inl1 - T_1_2[:3, 3]) @ T_1_2[:3, :3]
    assert md.add_loop(
        LoopConstraint(
            time1=times[0], time2=times[-1], T_1_2=T_1_2,
            inliers1=inl1, inliers2=inl2, icp_score=0.001,
        )
    )

    # the frontend keeps emitting with its (still-drifted) placement:
    # continue the raw trajectory one more step from the pre-correction
    # raw pose
    raw_next = est[-1] @ exp([0, 0, 0, 0.3, 0, 0])
    ts_next = times[-1] + int(1e6 / 3)
    md.add_frame_pose(ts_next, raw_next)
    raw_pts = raw_next[:3, 3][None, :] + rng.uniform(-0.1, 0.1, (30, 3))
    md.add_slice(make_slice(raw_pts, ts_next, pose=raw_next))

    # the corrected node estimate chains off the optimised trajectory
    corrected = md.graph.poses[md.graph.node_id(ts_next)]
    late = md.slices[-1]
    # raw placement was far from the corrected node...
    assert np.linalg.norm(raw_next[:3, 3] - corrected[:3, 3]) > 0.2
    # ...but the pooled points landed around the corrected one
    d = np.linalg.norm(late.processed["points"].mean(axis=0) - corrected[:3, 3])
    assert d < 0.15
    # and the slice pose was rewritten consistently
    np.testing.assert_allclose(late.pose[:3, 3], corrected[:3, 3], atol=0.1)


def test_bad_loop_rejected():
    cfg = tiny_test_config(isam_thresh=0.5)
    md = MapDeformation(cfg)
    gt, est = drifting_square(drift_deg=0.0)  # clean trajectory
    times = [int(k * 1e6 / 3) for k in range(len(gt))]
    for T, ts in zip(est, times):
        md.add_frame_pose(ts, T)
    before = [p.copy() for p in md.graph.poses]
    # absurd loop: claims the end is 5 m away from where odometry says
    bad = np.eye(4)
    bad[:3, 3] = [5.0, 5.0, 0.0]
    c = LoopConstraint(
        time1=times[0], time2=times[-1], T_1_2=bad,
        inliers1=np.zeros((0, 3)), inliers2=np.zeros((0, 3)), icp_score=0.001,
    )
    accepted = md.add_loop(c)
    assert not accepted
    assert md.n_loops_rejected == 1
    after = md.graph.poses
    for b, a in zip(before, after):
        np.testing.assert_allclose(a, b, atol=0.05)  # rollback restored
