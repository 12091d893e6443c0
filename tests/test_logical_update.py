"""Incremental dense-logical maintenance (interpret mode, CPU).

The fast tracker keeps a dense (R,R,R) bf16 mirror of the blocked
volume and refreshes only the (bz,by)-row-pairs each frame's integrate
touches (ops/pallas_raycast.update_logical_pairs), instead of the full
per-frame deblock. These tests pin the invariant the raycast depends
on: after any update, the mirror is bit-equal to a full
build_logical_bf16 of the blocked volume.
"""

import numpy as np
import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig
from kintinuous_tpu.io.synth import Scene, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.blocked import BLOCK, make_blocked_volume
from kintinuous_tpu.ops.pallas_integrate import integrate_pallas
from kintinuous_tpu.ops.pallas_raycast import (
    build_logical_bf16,
    update_logical_pairs,
)

CAM = CameraIntrinsics(
    fx=140.0, fy=140.0, cx=80.0, cy=60.0, width=160, height=120
)


def _pairs(ids, B):
    n_pairs = (B * B) // 2
    bm = np.zeros(n_pairs, bool)
    bm[np.asarray(ids) // (2 * B)] = True
    lst = np.zeros(n_pairs, np.int32)
    idx = np.nonzero(bm)[0]
    lst[: len(idx)] = idx
    return jnp.asarray(lst), jnp.int32(len(idx))


def test_update_selected_pairs_matches_full_deblock():
    R = 64
    B = R // BLOCK
    rng = np.random.default_rng(0)
    n_rows = B ** 3
    tsdf = rng.standard_normal((n_rows, 4, 128)).astype(np.float32)
    vol_t = jnp.asarray(tsdf)

    full = build_logical_bf16(
        make_blocked_volume(R)._replace(tsdf=vol_t), R, interpret=True
    )

    # start from a stale mirror built from DIFFERENT data, then refresh
    # a scattered subset of row-pairs: refreshed pairs must match the
    # full deblock bit-exactly, untouched pairs must keep stale values
    stale_t = jnp.asarray(
        rng.standard_normal((n_rows, 4, 128)).astype(np.float32)
    )
    stale = build_logical_bf16(
        make_blocked_volume(R)._replace(tsdf=stale_t), R, interpret=True
    )
    touched_blocks = np.array([0, 5, B * B - 1, 3 * B + 2, n_rows - 1])
    pairs, cnt = _pairs(touched_blocks, B)
    upd = update_logical_pairs(vol_t, stale, pairs, cnt, R, interpret=True)

    upd_n = np.asarray(upd)
    full_n = np.asarray(full)
    stale_n = np.asarray(stale)
    pair_dirty = np.zeros((B * B) // 2, bool)
    pair_dirty[np.asarray(touched_blocks) // (2 * B)] = True
    for p in range((B * B) // 2):
        r0 = 2 * p
        bz, by = r0 // B, r0 % B
        sl = np.s_[bz * 8 : bz * 8 + 8, by * 8 : by * 8 + 16, :]
        want = full_n[sl] if pair_dirty[p] else stale_n[sl]
        np.testing.assert_array_equal(upd_n[sl], want)


def test_integrate_pallas_maintains_logical():
    cfg = KintinuousConfig(
        camera=CAM, volume_size=3.0, volume_resolution=64,
        fast_mode=True, bilateral_radius=2, band_cap=512,
    )
    cam = cfg.camera
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    depth_mm, rgb = render_frame(Scene.default(), cam, np.eye(4))
    depth_m = pp.depth_to_metres(
        jnp.asarray(depth_mm, jnp.float32), cfg.max_depth
    )
    cw = jnp.ones_like(depth_m)
    vol = make_blocked_volume(cfg.volume_resolution)
    logical = jnp.zeros((64, 64, 64), jnp.bfloat16)
    for _ in range(2):
        vol, logical = integrate_pallas(
            vol, cam, depth_m, jnp.asarray(rgb, jnp.float32), cw, pose,
            cfg.voxel_size, cfg.trunc_dist, 128.0, band_cap=cfg.band_cap,
            interpret=True, logical=logical,
        )
    full = build_logical_bf16(vol, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(logical), np.asarray(full))


def test_integrate_pallas_dirty_all_rebuilds_everything():
    cfg = KintinuousConfig(
        camera=CAM, volume_size=3.0, volume_resolution=64,
        fast_mode=True, bilateral_radius=2, band_cap=512,
    )
    cam = cfg.camera
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    depth_mm, rgb = render_frame(Scene.default(), cam, np.eye(4))
    depth_m = pp.depth_to_metres(
        jnp.asarray(depth_mm, jnp.float32), cfg.max_depth
    )
    cw = jnp.ones_like(depth_m)
    vol = make_blocked_volume(cfg.volume_resolution)
    # mirror is deliberately GARBAGE: dirty_all=True (the shift-frame
    # path, where the blocked volume was rolled under the mirror) must
    # rebuild every row-pair regardless of what the plan touched
    garbage = jnp.full((64, 64, 64), 7.0, jnp.bfloat16)
    vol, logical = integrate_pallas(
        vol, cam, depth_m, jnp.asarray(rgb, jnp.float32), cw, pose,
        cfg.voxel_size, cfg.trunc_dist, 128.0, band_cap=cfg.band_cap,
        interpret=True, logical=garbage, dirty_all=jnp.bool_(True),
    )
    full = build_logical_bf16(vol, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(logical), np.asarray(full))


def test_fast_tracker_pallas_logical_matches_fast_path():
    """Single-chip pallas tracker (incremental dense mirror + shift
    rebuild) must track like the XLA fast path on a shifting GT walk:
    the mirror feeds the raycast, so any staleness shows up as pose
    divergence or missing shifts."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_fast_tracker import fast_cfg, run

    from kintinuous_tpu.io.synth import straight_trajectory

    poses = straight_trajectory(12, distance=0.55, axis=0)
    ref = run(fast_cfg(), poses, use_gt=True)
    pl = run(fast_cfg(pallas=True), poses, use_gt=True)

    assert pl.state.logical is not None
    np.testing.assert_array_equal(
        np.array(pl.shift_log), np.array(ref.shift_log)
    )
    assert any(s[0] != 0 for s in np.array(pl.shift_log)), "no shift fired"
    np.testing.assert_allclose(
        np.array(pl.poses), np.array(ref.poses), atol=2e-3
    )
