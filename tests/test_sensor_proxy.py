"""Structured-light sensor model + fr1/desk proxy sequence.

BASELINE.md's accuracy metric is ATE on TUM fr1/desk, which cannot be
fetched in this environment (no egress — see BENCH_NOTES). These tests
pin the highest-fidelity proxy instead: a Kinect-v1-class noise model
(quadratic axial noise, disparity quantisation, lateral jitter,
discontinuity dropout, rolling-shutter rows) over a cluttered desk
scene with handheld motion, tracked end-to-end.
"""

import numpy as np

from kintinuous_tpu.config import CameraIntrinsics, tiny_test_config
from kintinuous_tpu.eval.ate import absolute_trajectory_error
from kintinuous_tpu.io.synth import (
    Scene,
    SensorModel,
    desk_scene,
    handheld_trajectory,
    render_frame,
    render_frame_sensor,
)
from kintinuous_tpu.tracking.tracker import Tracker

CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=60.0, width=160, height=120)


def test_sensor_model_noise_statistics():
    """Axial noise grows with depth; quantisation coarsens with depth;
    discontinuity pixels drop out; range gate enforced."""
    scene = desk_scene()
    T = np.eye(4)
    rng = np.random.default_rng(0)
    model = SensorModel(readout_s=0.0)
    clean, _ = render_frame(scene, CAM, T)
    noisy, _ = render_frame_sensor(scene, CAM, T, model, rng)

    both = (clean > 0) & (noisy > 0)
    assert both.mean() > 0.5
    # some pixels valid in the clean render are dropped by the model
    dropped = (clean > 0) & (noisy == 0)
    assert dropped.any()
    # range gate: nothing closer than min_z survives
    assert noisy[(clean > 0) & (clean < model.min_z * 1000)].sum() == 0
    # quantisation: far depths land on a coarser grid than 1 mm
    far_vals = np.unique(noisy[(noisy > 2200)])
    assert len(far_vals) < (far_vals.max() - far_vals.min()) * 0.8


def test_axial_noise_grows_quadratically():
    """sigma_z(z) follows the Nguyen et al. quadratic: isolate the
    axial term (lateral/quantisation off) on a flat wall at two
    stand-off distances and compare residual spread."""
    axial_only = SensorModel(
        lateral_px=0.0, quant_mm_per_m2=0.0, edge_jump_mm=1e9, readout_s=0.0
    )
    stds = []
    for dist in (1.2, 2.2):
        T = np.eye(4)
        T[2, 3] = 2.0 - dist  # plain box room: back wall at z=2
        rng = np.random.default_rng(1)
        clean, _ = render_frame(Scene(), CAM, T)
        noisy, _ = render_frame_sensor(Scene(), CAM, T, axial_only, rng)
        patch = np.s_[40:80, 60:100]  # flat centre
        stds.append((noisy[patch].astype(float) - clean[patch]).std())
    expected = (0.0012 + 0.0019 * (2.2 - 0.4) ** 2) / (
        0.0012 + 0.0019 * (1.2 - 0.4) ** 2
    )
    assert stds[1] / stds[0] > expected * 0.6
    assert stds[1] / stds[0] < expected * 1.6


def test_rolling_shutter_rows_shift():
    """With a fast inter-frame yaw the rolling-shutter render differs
    between top and bottom rows relative to a global-shutter render."""
    scene = desk_scene()
    T = np.eye(4)
    yaw = np.deg2rad(3.0)
    T2 = np.eye(4)
    T2[:3, :3] = np.array(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]]
    )
    model = SensorModel(lateral_px=0.0, axial_a=0.0, axial_b=0.0,
                        quant_mm_per_m2=0.0, edge_jump_mm=1e9)
    rng = np.random.default_rng(0)
    gs, _ = render_frame_sensor(scene, CAM, T, model, rng)
    rs, _ = render_frame_sensor(scene, CAM, T, model, rng, T_next=T2)
    top = slice(0, 20)
    bot = slice(100, 120)
    d_top = np.abs(gs[top].astype(float) - rs[top].astype(float)).mean()
    d_bot = np.abs(gs[bot].astype(float) - rs[bot].astype(float)).mean()
    # later rows have rotated further from the global-shutter pose
    assert d_bot > d_top * 1.5


def test_desk_proxy_tracks_within_bound():
    """End-to-end: handheld sweep over the desk scene through the full
    sensor model, tracked with FUSED ICP+RGB-D — the desk view is
    dominated by y/z-normal planes, so geometric-only ICP is degenerate
    along x and noise makes it slide (the same reason the reference
    recommends -ri for handheld logs); the photometric term pins the
    sliding direction. Bound is test-scale (160x120, 31 mm voxels,
    lateral noise scaled to this focal length); the production-scale
    number is the bench's proxy_desk row."""
    cfg = tiny_test_config(
        camera=CAM,
        volume_size=4.0,
        volume_resolution=128,
        fast_mode=True,
        static_mode=True,
        icp_plus_rgbd=True,
        pyramid_levels=4,
        icp_iterations=(0, 10, 5, 0),
        bilateral_radius=2,
        extraction_capacity=200_000,
        band_cap=2048,
    )
    poses = handheld_trajectory(n_frames=60, sweep_deg=25, radius=0.8)
    # lateral_px is calibrated for the real sensor's fx=525; at fx=140
    # the metric-equivalent jitter is 0.8 * 140 / 525 ~= 0.2 px
    model = SensorModel(lateral_px=0.2)
    rng = np.random.default_rng(5)
    scene = desk_scene()
    tracker = Tracker(cfg)
    for i, T in enumerate(poses):
        T_next = poses[i + 1] if i + 1 < len(poses) else None
        d, c = render_frame_sensor(scene, CAM, T, model, rng, T_next)
        tracker.process_frame(d, c, int(i * 1e6 / 30))
    tracker.flush()
    stamps = np.arange(len(poses)) / 30.0
    ate, n = absolute_trajectory_error(
        stamps, np.array(poses),
        np.array(tracker.stamps_us) / 1e6, np.array(tracker.poses),
    )
    assert n == len(poses)
    assert ate < 0.18, f"desk proxy ATE {ate*100:.1f} cm"


def test_living_room_proxy_tracks_with_shifting():
    """End-to-end lr kt2-proxy slice: the living-room scene's viewpoints
    are dominated by a single wall/floor plane (ICL-NUIM's low-geometry
    regime — BASELINE config 2 pairs it with fused -ri), swept far
    enough that the dynamic cube SHIFTS. Fused ICP+RGB-D + the
    constant-velocity prior must hold tracking through the sweep."""
    from kintinuous_tpu.io.synth import (
        living_room_scene,
        living_room_trajectory,
    )

    cfg = tiny_test_config(
        camera=CAM,
        volume_size=4.0,
        volume_resolution=128,
        fast_mode=True,
        dynamic_cube=True,
        icp_plus_rgbd=True,
        odom_prior_weight=0.01,
        pyramid_levels=4,
        icp_iterations=(0, 10, 5, 0),
        bilateral_radius=2,
        extraction_capacity=200_000,
        band_cap=2048,
        voxel_shift=8,
    )
    poses = living_room_trajectory(n_frames=90)
    model = SensorModel(lateral_px=0.2)
    rng = np.random.default_rng(9)
    scene = living_room_scene()
    tracker = Tracker(cfg)
    for i, T in enumerate(poses):
        T_next = poses[i + 1] if i + 1 < len(poses) else None
        d, c = render_frame_sensor(scene, CAM, T, model, rng, T_next)
        tracker.process_frame(d, c, int(i * 1e6 / 30))
    tracker.flush()
    stamps = np.arange(len(poses)) / 30.0
    ate, n = absolute_trajectory_error(
        stamps, np.array(poses),
        np.array(tracker.stamps_us) / 1e6, np.array(tracker.poses),
    )
    assert n == len(poses)
    n_shift = int((np.array(tracker.shift_log) != 0).any(axis=1).sum())
    assert n_shift >= 1, "sweep must engage volume shifting"
    assert ate < 0.20, f"lr proxy ATE {ate*100:.1f} cm"
