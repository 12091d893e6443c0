"""Equivalence of the fast (block-classified) TSDF path vs the dense
reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from kintinuous_tpu.config import tiny_test_config
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.ops import tsdf as dense
from kintinuous_tpu.ops.blocked import (
    BlockedVolume,
    blocked_to_dense,
    dense_to_blocked,
)
from kintinuous_tpu.ops.tsdf_fast import (
    BAND,
    FREE,
    OUT,
    build_depth_tables,
    classify_blocks,
    integrate_fast,
)
from tests.test_tsdf import CAM, CFG, SPHERE_CAM, SPHERE_R, cam_pose_at_center, sphere_depth


def setup(wrap=None):
    depth = jnp.array(sphere_depth(CAM, SPHERE_CAM, SPHERE_R))
    rgb = jnp.full((CAM.height, CAM.width, 3), 128.0, jnp.float32)
    disc = jnp.zeros(depth.shape, bool)
    vol = dense.make_volume(CFG.volume_resolution)
    if wrap is not None:
        vol = vol._replace(wrap=jnp.array(wrap, jnp.int32))
    T = cam_pose_at_center()
    return vol, depth, rgb, disc, T


def both(vol, depth, rgb, disc, T, n=1):
    vd = vf = vol
    fd = jax.jit(
        lambda v: dense.integrate(
            v, CAM, depth, rgb, disc, T, CFG.voxel_size, CFG.trunc_dist, z_chunk=32
        )
    )
    ff = jax.jit(
        lambda v: integrate_fast(
            v, CAM, depth, rgb, disc, T, CFG.voxel_size, CFG.trunc_dist,
            band_cap=1024, cell=8, dilate=1,
        )
    )
    vfb = to_blocked(vf)
    for _ in range(n):
        vd = fd(vd)
        vfb = ff(vfb)
    return vd, from_blocked(vfb)


def to_blocked(v):
    return BlockedVolume(
        tsdf=dense_to_blocked(v.tsdf), cw=dense_to_blocked(v.cw),
        wrap=v.wrap, origin=v.origin,
    )


def from_blocked(v):
    return dense.VolumeState(
        tsdf=blocked_to_dense(v.tsdf), cw=blocked_to_dense(v.cw),
        wrap=v.wrap, origin=v.origin,
    )


def test_fast_equals_dense_single_frame():
    vol, depth, rgb, disc, T = setup()
    vd, vf = both(vol, depth, rgb, disc, T, n=1)
    np.testing.assert_allclose(np.asarray(vf.tsdf), np.asarray(vd.tsdf), atol=2e-5)
    wd = np.asarray(vd.cw >> 24)
    wf = np.asarray(vf.cw >> 24)
    np.testing.assert_array_equal(wf, wd)
    # colours equal too
    np.testing.assert_allclose(
        np.asarray(vf.cw & 0xFFFFFF, dtype=np.int64),
        np.asarray(vd.cw & 0xFFFFFF, dtype=np.int64),
        atol=1,
    )


def test_fast_equals_dense_multi_frame_and_wrap():
    vol, depth, rgb, disc, T = setup(wrap=[8, 16, 24])  # multiples of 8
    vd, vf = both(vol, depth, rgb, disc, T, n=3)
    np.testing.assert_allclose(np.asarray(vf.tsdf), np.asarray(vd.tsdf), atol=5e-5)
    np.testing.assert_array_equal(np.asarray(vf.cw >> 24), np.asarray(vd.cw >> 24))


def fine_setup():
    """Finer volume (R=128) so block footprints fit the mip coverage —
    required for FREE classification to be possible at the tiny camera."""
    cfg = tiny_test_config(volume_resolution=128)
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)  # flat wall
    rgb = jnp.full((CAM.height, CAM.width, 3), 90.0, jnp.float32)
    disc = jnp.zeros(depth.shape, bool)
    vol = dense.make_volume(128)
    T = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    return cfg, vol, depth, rgb, disc, T


def test_classification_fractions():
    cfg, vol, depth, rgb, disc, T = fine_setup()
    tables = build_depth_tables(CAM, depth, rgb, disc, cell=8, dilate=2)
    cls = np.asarray(
        classify_blocks(
            vol, CAM, tables, T, cfg.voxel_size, cfg.trunc_dist, cell=8, dilate=2
        )
    )
    n = cls.size
    frac_band = (cls == BAND).sum() / n
    assert frac_band < 0.30, f"band fraction too high: {frac_band}"
    assert (cls == FREE).sum() > 10  # free space in front of the wall
    assert (cls == OUT).sum() > n // 2  # behind the wall + out of frustum


def test_fast_equals_dense_with_carve():
    cfg, vol, depth, rgb, disc, T = fine_setup()
    vd = dense.integrate(
        vol, CAM, depth, rgb, disc, T, cfg.voxel_size, cfg.trunc_dist, z_chunk=32
    )
    vf = from_blocked(integrate_fast(
        to_blocked(vol), CAM, depth, rgb, disc, T, cfg.voxel_size, cfg.trunc_dist,
        band_cap=4096, cell=8, dilate=2,
    ))
    np.testing.assert_allclose(np.asarray(vf.tsdf), np.asarray(vd.tsdf), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(vf.cw >> 24), np.asarray(vd.cw >> 24))


def test_band_cap_degrades_gracefully():
    vol, depth, rgb, disc, T = setup()
    vf = from_blocked(integrate_fast(
        to_blocked(vol), CAM, depth, rgb, disc, T, CFG.voxel_size, CFG.trunc_dist,
        band_cap=128, cell=8, dilate=1,
    ))
    # with a tiny cap most band blocks are skipped, but nothing crashes
    # and the free-space carve still happened
    assert (np.asarray(vf.cw >> 24) > 0).sum() > 0
