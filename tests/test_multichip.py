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
                state, pose_g = step_ext(state, dj, cj, eye)
            else:
                state, pose_g = step_odo(state, dj, cj, eye)
    np.testing.assert_allclose(np.asarray(pose_g), pose_single, atol=5e-4)
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
                state, pose_g = st(state, dj, cj, eye)
        results.append(
            (np.asarray(jax.device_get(state.pred_vmap)),
             np.asarray(jax.device_get(state.pred_nmap)),
             np.asarray(pose_g))
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
