"""Pallas band-block integration vs the XLA fast path (interpret mode).

Geometry (tsdf, weights) must match integrate_fast up to the bf16
hi/lo ray split (~6e-5 relative ray error). Colour is sampled at half
resolution in the Pallas path, so colour equality is only exact for
locally-uniform colour images (which the sphere scene uses).
"""

import numpy as np
import jax
import jax.numpy as jnp

from kintinuous_tpu.ops import tsdf as dense
from kintinuous_tpu.ops.blocked import (
    BlockedVolume,
    blocked_to_dense,
    dense_to_blocked,
)
from kintinuous_tpu.ops.pallas_integrate import integrate_pallas
from kintinuous_tpu.ops.tsdf_fast import integrate_fast
from tests.test_tsdf import (
    CAM,
    CFG,
    SPHERE_CAM,
    SPHERE_R,
    cam_pose_at_center,
    sphere_depth,
)


def to_blocked(v):
    return BlockedVolume(
        tsdf=dense_to_blocked(v.tsdf), cw=dense_to_blocked(v.cw),
        wrap=v.wrap, origin=v.origin,
    )


def setup(sphere_cam=SPHERE_CAM):
    depth = jnp.array(sphere_depth(CAM, sphere_cam, SPHERE_R))
    rgb = jnp.full((CAM.height, CAM.width, 3), 128.0, jnp.float32)
    disc = jnp.zeros(depth.shape, bool)
    vol = to_blocked(dense.make_volume(CFG.volume_resolution))
    T = cam_pose_at_center()
    return vol, depth, rgb, disc, T


def run_both(vol, depth, rgb, disc, T, n=1):
    ff = jax.jit(
        lambda v: integrate_fast(
            v, CAM, depth, rgb, disc, T, CFG.voxel_size, CFG.trunc_dist,
            band_cap=2048,
        )
    )
    fp = jax.jit(
        lambda v: integrate_pallas(
            v, CAM, depth, rgb, disc, T, CFG.voxel_size, CFG.trunc_dist,
            band_cap=2048, fb_cap=512, interpret=True,
        )
    )
    va = vb = vol
    for _ in range(n):
        va = ff(va)
        vb = fp(vb)
    return va, vb


def check_match(va, vb, tsdf_atol=5e-3):
    ta = np.asarray(blocked_to_dense(va.tsdf))
    tb = np.asarray(blocked_to_dense(vb.tsdf))
    ca = np.asarray(blocked_to_dense(va.cw))
    cb = np.asarray(blocked_to_dense(vb.cw))
    wa = ca >> 24
    wb = cb >> 24
    # weights: identical except where the bf16 ray split flips the
    # sdf >= -trunc boundary (must be vanishingly rare)
    frac_w = (wa != wb).mean()
    assert frac_w < 1e-3, f"weight mismatch fraction {frac_w}"
    same = wa == wb
    np.testing.assert_allclose(tb[same], ta[same], atol=tsdf_atol)
    # uniform colour scene -> colour equal wherever both fused
    both = (wa > 0) & (wb > 0) & same
    for sh in (16, 8, 0):
        a = (ca >> sh) & 0xFF
        b = (cb >> sh) & 0xFF
        assert (np.abs(a[both].astype(int) - b[both].astype(int)) <= 1).all()


def test_pallas_matches_fast_single_frame():
    vol, depth, rgb, disc, T = setup()
    va, vb = run_both(vol, depth, rgb, disc, T, n=1)
    check_match(va, vb)


def test_pallas_matches_fast_multi_frame():
    vol, depth, rgb, disc, T = setup()
    va, vb = run_both(vol, depth, rgb, disc, T, n=3)
    check_match(va, vb)


def test_pallas_close_sphere_uses_fallback():
    # camera nearly touching the sphere: near blocks are unstable or
    # oversized -> fallback path must keep the result exact
    vol, depth, rgb, disc, T = setup(sphere_cam=np.array([0.0, 0.0, 0.72]))
    va, vb = run_both(vol, depth, rgb, disc, T, n=1)
    check_match(va, vb)


def test_pallas_wrap_matches_fast():
    """Nonzero (8-multiple) wrap: in-kernel mod addressing must match
    integrate_fast's logical-coordinate band path (the multi-chip fast
    path keeps cyclical wrap, tsdf_volume.cu:612-615 semantics)."""
    vol, depth, rgb, disc, T = setup()
    vol = vol._replace(wrap=jnp.array([8, 16, 8], jnp.int32))
    va, vb = run_both(vol, depth, rgb, disc, T, n=1)
    check_match(va, vb)


def test_pallas_slab_split_matches_full():
    """Integrating two block-z half-slabs with resolution/z_block_offset
    must be bit-identical to integrating the full volume (slab-local
    multi-chip integrate, parallel/fast_sharded.py)."""
    from kintinuous_tpu.ops.tsdf_fast import BLOCK

    vol, depth, rgb, disc, T = setup()
    vol = vol._replace(wrap=jnp.array([0, 8, 16], jnp.int32))
    R = CFG.volume_resolution
    B = R // BLOCK
    full = jax.jit(
        lambda v: integrate_pallas(
            v, CAM, depth, rgb, disc, T, CFG.voxel_size, CFG.trunc_dist,
            band_cap=2048, fb_cap=512, interpret=True,
        )
    )(vol)
    half = (B // 2) * B * B
    parts = []
    for i in range(2):
        s = vol._replace(
            tsdf=vol.tsdf[i * half : (i + 1) * half],
            cw=vol.cw[i * half : (i + 1) * half],
        )
        parts.append(
            jax.jit(
                lambda v, off=i * (B // 2): integrate_pallas(
                    v, CAM, depth, rgb, disc, T, CFG.voxel_size,
                    CFG.trunc_dist, band_cap=2048, fb_cap=512,
                    interpret=True, resolution=R, z_block_offset=off,
                )
            )(s)
        )
    ts = np.concatenate([np.asarray(p.tsdf) for p in parts], axis=0)
    cs = np.concatenate([np.asarray(p.cw) for p in parts], axis=0)
    np.testing.assert_array_equal(ts, np.asarray(full.tsdf))
    np.testing.assert_array_equal(cs, np.asarray(full.cw))
