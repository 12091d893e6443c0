"""Sharded tracking step on the 8-virtual-device CPU mesh, plus
equivalence against the single-chip step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig
from kintinuous_tpu.io.synth import Scene, render_frame
from kintinuous_tpu.ops.tsdf import make_volume
from kintinuous_tpu.parallel.sharded import make_sharded_state, make_sharded_step
from kintinuous_tpu.tracking.tracker import Tracker, TrackerState, make_step

CFG = KintinuousConfig(
    camera=CameraIntrinsics(fx=70.0, fy=70.0, cx=32.0, cy=24.0, width=64, height=48),
    volume_size=3.0,
    volume_resolution=64,
    voxel_shift=4,
    pyramid_levels=2,
    icp_iterations=(3, 2),
    bilateral_radius=2,
    extraction_capacity=50_000,
    raycast_max_range=2.2,
)


def frames(n):
    from kintinuous_tpu.io.synth import orbit_trajectory

    return [
        render_frame(Scene.default(), CFG.camera, T)
        for T in orbit_trajectory(n, radius=0.05, angle_deg=3.0)
    ]


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), axis_names=("z",))


def test_dryrun_entrypoints_exist():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    new_state, out = fn(*args)
    assert np.isfinite(np.asarray(out.pose_global)).all()


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_single_chip(mesh):
    """Two frames through the sharded step must match the single-chip
    tracker's pose and fused volume."""
    fs = frames(3)

    # single chip
    tr = Tracker(CFG)
    for i, (d, c) in enumerate(fs):
        tr.process_frame(d, c, i * 33333)
    tr.flush()
    pose_single = tr.poses[-1]
    vol_single = np.asarray(tr.state.vol.tsdf)

    # sharded
    state = make_sharded_state(CFG, mesh)
    step_ext = make_sharded_step(CFG, mesh, use_odometry=False)
    step_odo = make_sharded_step(CFG, mesh, use_odometry=True)
    eye = jnp.eye(4, dtype=jnp.float32)
    with mesh:
        for i, (d, c) in enumerate(fs):
            dj = jnp.asarray(d.astype(np.float32))
            cj = jnp.asarray(c.astype(np.float32))
            if i == 0:
                state, out = step_ext(state, dj, cj, eye)
            else:
                state, out = step_odo(state, dj, cj, eye)
    np.testing.assert_allclose(
        np.asarray(out.pose_global), pose_single, atol=5e-4
    )
    vol_sharded = np.asarray(jax.device_get(state.vol.tsdf))
    np.testing.assert_allclose(vol_sharded, vol_single, atol=1e-4)


def test_slab_raycast_matches_allgather(mesh):
    """The zero-gather slab raycast must reproduce the all_gather
    baseline's predictions (same volume, same pose)."""
    fs = frames(2)
    eye = jnp.eye(4, dtype=jnp.float32)

    results = []
    for slab in (True, False):
        state = make_sharded_state(CFG, mesh)
        step_ext = make_sharded_step(CFG, mesh, use_odometry=False,
                                     slab_raycast=slab)
        step_odo = make_sharded_step(CFG, mesh, use_odometry=True,
                                     slab_raycast=slab)
        with mesh:
            for i, (d, c) in enumerate(fs):
                dj = jnp.asarray(d.astype(np.float32))
                cj = jnp.asarray(c.astype(np.float32))
                st = step_ext if i == 0 else step_odo
                state, out = st(state, dj, cj, eye)
        results.append(
            (np.asarray(jax.device_get(state.pred_vmap)),
             np.asarray(jax.device_get(state.pred_nmap)),
             np.asarray(out.pose_global))
        )
    (va, na, pa), (vb, nb, pb) = results
    np.testing.assert_allclose(pa, pb, atol=1e-5)
    hits_a = np.isfinite(va).all(axis=0)
    hits_b = np.isfinite(vb).all(axis=0)
    # identical hit sets and matching positions/normals
    assert (hits_a == hits_b).mean() > 0.995
    both = hits_a & hits_b
    np.testing.assert_allclose(va[:, both], vb[:, both], atol=1e-4)
    np.testing.assert_allclose(na[:, both], nb[:, both], atol=1e-3)


def _sorted_rows(a):
    a = np.asarray(a)
    order = np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    return a[order]


def test_sharded_shift_extraction_matches_single_chip(mesh):
    """Ground-truth replay along +x across shift thresholds: the
    sharded step's slab-local band extraction must emit the SAME point
    set as the single-chip tracker (no map loss under sharding —
    KintinuousTracker.cpp:675-831 semantics)."""
    from kintinuous_tpu.parallel.tracker import ShardedTracker
    from kintinuous_tpu.io.synth import straight_trajectory

    poses = straight_trajectory(25, distance=1.0, axis=0)
    scene = Scene.default()

    single = Tracker(CFG)
    sharded = ShardedTracker(CFG, mesh=mesh)
    last = None
    for i, T in enumerate(poses):
        depth_mm, rgb = render_frame(scene, CFG.camera, T)
        delta = (
            (np.linalg.inv(last) @ T).astype(np.float32)
            if last is not None else np.eye(4, dtype=np.float32)
        )
        ts = int(i * 1e6 / 30)
        single.process_frame(depth_mm, rgb, ts, ext_delta=delta)
        sharded.process_frame(depth_mm, rgb, ts, ext_delta=delta)
        last = T
    single.flush()
    sharded.flush()

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
        assert abs(len(a.points) - len(b.points)) == 0, (
            f"{a.dimension}: {len(a.points)} vs {len(b.points)} points"
        )
        np.testing.assert_allclose(
            _sorted_rows(a.points), _sorted_rows(b.points), atol=1e-5
        )

    fa = single.finalise()
    fb = sharded.finalise()
    assert len(fa.points) == len(fb.points)
    np.testing.assert_allclose(
        _sorted_rows(fa.points), _sorted_rows(fb.points), atol=1e-5
    )


@pytest.mark.parametrize("fast", [False, True], ids=["slow", "fast"])
def test_engine_multichip_end_to_end(mesh, tmp_path, fast):
    """Full engine (log -> tracker -> slice processor -> saves) on
    devices=4: saved .pcd/.poses must match the devices=1 run — for
    both the dense path and the blocked fast path."""
    from kintinuous_tpu.io.pcd import load_pcd
    from kintinuous_tpu.io.synth import generate_klg, straight_trajectory
    from kintinuous_tpu.io.tum import load_trajectory
    from kintinuous_tpu.runtime.engine import SlamEngine

    log = str(tmp_path / "walk.klg")
    gt = str(tmp_path / "walk.gt")
    poses = straight_trajectory(25, distance=1.0, axis=0)
    generate_klg(log, CFG.camera, poses, gt_path=gt)

    outs = {}
    for n in (1, 4):
        cfg = CFG.replace(
            log_file=log, trajectory_file=gt, devices=n, fast_mode=fast,
            save_file=str(tmp_path / f"out{n}"),
        )
        engine = SlamEngine(cfg).run()
        outs[n] = engine.save()

    s1, p1 = load_trajectory(outs[1]["poses"])
    s4, p4 = load_trajectory(outs[4]["poses"])
    np.testing.assert_allclose(s4, s1, atol=1e-9)
    np.testing.assert_allclose(np.array(p4), np.array(p1), atol=1e-4)
    c1 = load_pcd(outs[1]["cloud"])
    c4 = load_pcd(outs[4]["cloud"])
    assert len(c1["points"]) > 100
    # slice processing (cull/downsample) runs per slice on both paths;
    # identical inputs -> identical outputs
    assert abs(len(c4["points"]) - len(c1["points"])) <= 2
    np.testing.assert_allclose(
        _sorted_rows(c4["points"]), _sorted_rows(c1["points"]), atol=1e-4
    )


def test_sharded_dense_rgbd_matches_single_chip(mesh):
    """Fused ICP+RGB-D on the DENSE sharded path (the last --devices
    matrix hole: round-3 guarded it to fast_mode) must track like the
    single-chip dense fused tracker (RGBDOdometry.cpp:165-393 role)."""
    cfg = CFG.replace(icp_plus_rgbd=True)
    fs = frames(4)

    tr = Tracker(cfg)
    for i, (d, c) in enumerate(fs):
        tr.process_frame(d, c, i * 33333)
    tr.flush()
    pose_single = tr.poses[-1]

    state = make_sharded_state(cfg, mesh)
    step_ext = make_sharded_step(cfg, mesh, use_odometry=False)
    step_odo = make_sharded_step(cfg, mesh, use_odometry=True)
    eye = jnp.eye(4, dtype=jnp.float32)
    with mesh:
        for i, (d, c) in enumerate(fs):
            dj = jnp.asarray(d.astype(np.float32))
            cj = jnp.asarray(c.astype(np.float32))
            if i == 0:
                state, out = step_ext(state, dj, cj, eye)
            else:
                state, out = step_odo(state, dj, cj, eye)
    # the sharded fused solver phases its iterations like fast_sharded
    # (nearest coarse taps), not byte-identically to rgbd_icp_odometry,
    # so poses agree to sub-voxel rather than bitwise
    assert float(out.icp_count) > 100.0
    np.testing.assert_allclose(
        np.asarray(out.pose_global), pose_single, atol=5e-3
    )


def test_dense_sharded_incremental_mesh_matches_single_chip(mesh):
    """DENSE-path sharded incremental mesh (the last NotImplementedError
    in the tree, VERDICT r4 next-round #9): band mesh patches emitted by
    the z-slab-sharded dense step must equal the single-chip dense
    tracker's `_band_mesh_patches` — same psum-assembly design as the
    fast path (parallel/fast_sharded.mesh_axis) but with the dense
    single-chip wrap-addressing convention so coords are bit-equal."""
    from kintinuous_tpu.parallel.tracker import ShardedTracker
    from kintinuous_tpu.io.synth import straight_trajectory

    cfg = CFG.replace(
        mesh=True,
        online_deformation=True,
        mesh_vertex_capacity=60_000,
        mesh_face_capacity=120_000,
    )
    assert cfg.incremental_mesh and not cfg.fast_mode
    poses = straight_trajectory(25, distance=1.0, axis=0)
    scene = Scene.default()

    single = Tracker(cfg)
    sharded = ShardedTracker(cfg, mesh=mesh)
    last = None
    for i, T in enumerate(poses):
        depth_mm, rgb = render_frame(scene, cfg.camera, T)
        delta = (
            (np.linalg.inv(last) @ T).astype(np.float32)
            if last is not None else np.eye(4, dtype=np.float32)
        )
        ts = int(i * 1e6 / 30)
        single.process_frame(depth_mm, rgb, ts, ext_delta=delta)
        sharded.process_frame(depth_mm, rgb, ts, ext_delta=delta)
        last = T
    single.flush()
    sharded.flush()

    assert len(single.mesh_patches) >= 1, "no mesh patch fired — test broken"
    assert len(sharded.mesh_patches) == len(single.mesh_patches)
    for a, b in zip(single.mesh_patches, sharded.mesh_patches):
        assert len(a.vertices) == len(b.vertices)
        assert len(a.faces) == len(b.faces)
        np.testing.assert_allclose(
            _sorted_rows(a.vertices), _sorted_rows(b.vertices), atol=1e-5
        )
        np.testing.assert_array_equal(
            _sorted_rows(a.cells.astype(np.float64)),
            _sorted_rows(b.cells.astype(np.float64)),
        )
