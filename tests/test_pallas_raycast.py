"""Pallas tile raycast vs the XLA gather raycast (interpret mode).

Runs the Pallas kernel in interpreter mode on CPU against
ops/raycast_fast.raycast_fast on a small fused volume; hits found by
both must agree to bf16/interpolation tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.blocked import make_blocked_volume
from kintinuous_tpu.ops.pallas_raycast import raycast_pallas
from kintinuous_tpu.ops.raycast_fast import raycast_fast
from kintinuous_tpu.ops.tsdf_fast import integrate_fast

CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=60.0, width=160, height=120)


def _fused_volume():
    cfg = KintinuousConfig(
        camera=CAM, volume_size=3.0, volume_resolution=128,
        fast_mode=True, bilateral_radius=2, band_cap=2048,
    )
    cam = cfg.camera
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    depth_mm, rgb = render_frame(Scene.default(), cam, np.eye(4))
    depth_m = pp.depth_to_metres(jnp.asarray(depth_mm, jnp.float32), cfg.max_depth)
    disc = pp.depth_discontinuity_mask(depth_m, radius=3, jump_m=0.2)
    vol = make_blocked_volume(cfg.volume_resolution)
    vol = integrate_fast(
        vol, cam, depth_m, jnp.asarray(rgb, jnp.float32), disc, pose,
        cfg.voxel_size, cfg.trunc_dist, 128.0, band_cap=cfg.band_cap,
    )
    return cfg, vol, pose, depth_m


def test_pallas_matches_xla_raycast():
    cfg, vol, pose, depth_m = _fused_volume()
    cam_half = cfg.camera.at_level(1)
    depth_half = pp.pyr_down_depth(depth_m, sigma=0.09)

    a = raycast_fast(vol, cam_half, pose, None, depth_half,
                     cfg.voxel_size, cfg.volume_size, cfg.trunc_dist)
    b = raycast_pallas(vol, cam_half, pose, None, depth_half,
                       cfg.voxel_size, cfg.volume_size, cfg.trunc_dist,
                       interpret=True)

    da = np.asarray(a.depth)
    db = np.asarray(b.depth)
    hits_a = da > 0
    hits_b = db > 0
    both = hits_a & hits_b
    # the pallas path must find the surface for the vast majority of
    # pixels the gather path finds
    assert both.sum() > 0.9 * hits_a.sum()
    # and agree on depth to interpolation/bf16 tolerance
    dd = np.abs(da[both] - db[both])
    assert np.median(dd) < 2e-3, np.median(dd)
    assert np.quantile(dd, 0.95) < float(cfg.voxel_size), np.quantile(dd, 0.95)

    # normals agree in direction
    na = np.moveaxis(np.asarray(a.nmap), 0, -1)[both]
    nb = np.moveaxis(np.asarray(b.nmap), 0, -1)[both]
    dots = np.sum(na * nb, axis=-1)
    ok = np.isfinite(dots)
    assert np.median(dots[ok]) > 0.99


def test_pallas_fallback_pixels_use_measurement():
    cfg, vol, pose, depth_m = _fused_volume()
    cam_half = cfg.camera.at_level(1)
    depth_half = pp.pyr_down_depth(depth_m, sigma=0.09)
    b = raycast_pallas(vol, cam_half, pose, None, depth_half,
                       cfg.voxel_size, cfg.volume_size, cfg.trunc_dist,
                       interpret=True)
    # nearly every pixel with a depth measurement gets SOME prediction
    # (image borders lack screen-space normals and may stay NaN)
    db = np.asarray(b.depth)
    dh = np.asarray(depth_half)
    measured = dh > 0
    assert (db[measured] > 0).mean() > 0.95
    vm = np.asarray(b.vmap)
    assert np.isfinite(vm[:, measured]).mean() > 0.95


def test_pallas_fallback_fraction_exported_and_small():
    """The exported fallback fraction (VERDICT r1 weak #4) must be a
    valid scalar and small on a realistic fused scene — a high value
    means tiles' VMEM regions are missing their depth segments and
    tracking is silently degrading toward frame-to-frame."""
    cfg, vol, pose, depth_m = _fused_volume()
    cam_half = cfg.camera.at_level(1)
    depth_half = pp.pyr_down_depth(depth_m, sigma=0.09)

    r = raycast_pallas(vol, cam_half, pose, None, depth_half,
                       cfg.voxel_size, cfg.volume_size, cfg.trunc_dist,
                       interpret=True)
    frac = float(np.asarray(r.fallback_frac))
    assert 0.0 <= frac <= 1.0
    assert frac < 0.05, f"pallas raycast fallback fraction {frac:.3f} too high"
    # the gather path reports 0 by construction
    a = raycast_fast(vol, cam_half, pose, None, depth_half,
                     cfg.voxel_size, cfg.volume_size, cfg.trunc_dist)
    assert float(np.asarray(a.fallback_frac)) == 0.0
