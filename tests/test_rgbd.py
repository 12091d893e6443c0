import numpy as np
import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics, tiny_test_config
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.rgbd import build_rgbd_pyramid, rgbd_icp_odometry
from kintinuous_tpu.tracking.odometry import build_map_pyramid

CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=60.0, width=160, height=120)
LEVELS = 3
ITERS = (6, 5, 4)


def frame_data(T_wc):
    depth_mm, rgb = render_frame(Scene.default(), CAM, T_wc)
    depth = pp.depth_to_metres(jnp.array(depth_mm.astype(np.float32)))
    intensity = pp.rgb_to_intensity(jnp.array(rgb))
    maps = build_map_pyramid(CAM, depth, LEVELS)
    rgbd = build_rgbd_pyramid(intensity, depth, LEVELS)
    return maps, rgbd


def recover(xi, use_icp, tol_t, tol_r):
    T_b = np.array(se3.exp_se3(jnp.array(xi, dtype=jnp.float32)))
    maps_a, rgbd_a = frame_data(np.eye(4))
    maps_b, rgbd_b = frame_data(T_b)
    pred = maps_a if use_icp else None
    f = jax.jit(
        lambda ca, cb, ra, rb: rgbd_icp_odometry(
            CAM, cb, rb, ra, maps_a if use_icp else None, ITERS
        )
    )
    T_est, cnt, sigma = f(maps_a, maps_b, rgbd_a, rgbd_b)
    err = np.array(
        se3.log_se3(jnp.array(np.linalg.inv(T_b) @ np.array(T_est), dtype=jnp.float32))
    )
    assert float(cnt) > 200, f"rgb inliers {cnt}"
    assert np.linalg.norm(err[3:]) < tol_t, f"trans err {err}"
    assert np.linalg.norm(err[:3]) < tol_r, f"rot err {err}"


def test_rgbd_only_small_motion():
    recover([0.01, -0.005, 0.008, 0.01, -0.01, 0.015], use_icp=False,
            tol_t=0.006, tol_r=0.006)


def test_rgbd_plus_icp_combined():
    recover([0.015, 0.01, -0.01, 0.02, 0.01, -0.015], use_icp=True,
            tol_t=0.004, tol_r=0.004)


def test_rgbd_jump_guard():
    """A solution that would jump > 0.3 m must be rejected to identity."""
    maps_a, rgbd_a = frame_data(np.eye(4))
    # current frame is a totally different view -> garbage correspondences
    T_far = np.eye(4)
    T_far[:3, 3] = [0.0, 0.0, -1.5]
    Ry = np.array([[np.cos(2.6), 0, np.sin(2.6)], [0, 1, 0], [-np.sin(2.6), 0, np.cos(2.6)]])
    T_far[:3, :3] = Ry
    maps_b, rgbd_b = frame_data(T_far)
    T_est, cnt, _ = rgbd_icp_odometry(CAM, maps_b, rgbd_b, rgbd_a, None, ITERS)
    t_norm = np.linalg.norm(np.array(T_est)[:3, 3])
    assert t_norm < 0.3  # either converged small or rejected to identity


def test_tracker_rgbd_mode_end_to_end():
    from kintinuous_tpu.tracking.tracker import Tracker

    cam = CameraIntrinsics(fx=70.0, fy=70.0, cx=40.0, cy=30.0, width=80, height=60)
    cfg = tiny_test_config(static_mode=True, icp_plus_rgbd=True, camera=cam)
    poses = orbit_trajectory(12, radius=0.1, angle_deg=5.0)
    tracker = Tracker(cfg)
    for i, T in enumerate(poses):
        depth_mm, rgb = render_frame(Scene.default(), cam, T)
        tracker.process_frame(depth_mm, rgb, int(i * 1e6 / 30))
    tracker.flush()
    from kintinuous_tpu.eval.ate import absolute_trajectory_error

    stamps = np.arange(len(poses)) / 30.0
    ate, n = absolute_trajectory_error(
        stamps, np.array(poses), np.array(tracker.stamps_us) / 1e6,
        np.array(tracker.poses),
    )
    assert n == len(poses)
    assert ate < 0.03, f"RGBD+ICP tracker ATE {ate*100:.1f} cm"
