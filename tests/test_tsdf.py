import numpy as np
import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics, tiny_test_config
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.ops import tsdf as tsdf_ops
from kintinuous_tpu.ops.extract import extract_points
from kintinuous_tpu.ops.raycast import raycast

CFG = tiny_test_config()
CAM = CFG.camera


def sphere_depth(cam: CameraIntrinsics, center, radius):
    """Analytic depth map of a sphere in the camera frame."""
    u, v = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
    d = np.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, np.ones_like(u, float)], -1)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    oc = -np.asarray(center, float)
    b = dn @ oc
    c = oc @ oc - radius * radius
    disc = b * b - c
    t = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0)), 0.0)
    z = np.where(t > 0, t * dn[..., 2], 0.0)
    return z.astype(np.float32)


def cam_pose_at_center():
    """Camera at the volume-box center, axes aligned with the volume."""
    t = jnp.array([CFG.volume_size / 2] * 3, jnp.float32)
    return se3.make_T(jnp.eye(3), t)


SPHERE_CAM = np.array([0.0, 0.0, 1.2])  # sphere center in camera frame
SPHERE_R = 0.4


def fused_sphere_volume(n_frames=3, wrap=None):
    depth = jnp.array(sphere_depth(CAM, SPHERE_CAM, SPHERE_R))
    rgb = jnp.full((CAM.height, CAM.width, 3), 128.0, jnp.float32)
    disc = jnp.zeros(depth.shape, bool)
    vol = tsdf_ops.make_volume(CFG.volume_resolution)
    if wrap is not None:
        vol = vol._replace(wrap=jnp.array(wrap, jnp.int32))
    T = cam_pose_at_center()
    fuse = jax.jit(
        lambda v: tsdf_ops.integrate(
            v, CAM, depth, rgb, disc, T,
            CFG.voxel_size, CFG.trunc_dist, z_chunk=32,
        )
    )
    for _ in range(n_frames):
        vol = fuse(vol)
    return vol, T, depth


def test_integrate_creates_surface():
    vol, T, depth = fused_sphere_volume()
    from kintinuous_tpu.ops.tsdf import unpack_cw
    import jax.numpy as _jnp
    w = np.array(unpack_cw(vol.cw)[0])
    assert w.max() == 3.0  # three fused frames
    t = np.array(vol.tsdf)
    assert (t < -0.5).sum() > 0 and (t > 0.5).sum() > 0  # inside & outside


def test_integrate_weight_cap():
    depth = jnp.array(sphere_depth(CAM, SPHERE_CAM, SPHERE_R))
    rgb = jnp.zeros((CAM.height, CAM.width, 3), jnp.float32)
    disc = jnp.zeros(depth.shape, bool)
    vol = tsdf_ops.make_volume(CFG.volume_resolution)
    T = cam_pose_at_center()
    fuse = jax.jit(
        lambda v: tsdf_ops.integrate(
            v, CAM, depth, rgb, disc, T,
            CFG.voxel_size, CFG.trunc_dist, max_weight=4.0, z_chunk=32,
        )
    )
    for _ in range(7):
        vol = fuse(vol)
    from kintinuous_tpu.ops.tsdf import unpack_cw
    assert np.array(unpack_cw(vol.cw)[0]).max() == 4.0


def test_raycast_roundtrip():
    vol, T, depth_in = fused_sphere_volume()
    rc = jax.jit(
        lambda v: raycast(
            v, CAM, T, CFG.voxel_size, CFG.volume_size, CFG.trunc_dist,
            min_range=0.3, max_range=2.5,
        )
    )(vol)
    depth_out = np.array(rc.depth)
    din = np.array(depth_in)
    both = (din > 0) & (depth_out > 0)
    # the sphere subtends a solid angle; most of its pixels must be hit
    assert both.sum() > 0.7 * (din > 0).sum()
    err = np.abs(depth_out[both] - din[both])
    assert np.median(err) < CFG.voxel_size  # surface localised within a voxel
    # normals at the sphere's front pole point back at the camera (-z)
    cy, cx = int(CAM.cy), int(CAM.cx)
    n = np.array(rc.nmap[:, cy, cx])
    assert n[2] < -0.9


def test_raycast_miss_is_nan():
    vol = tsdf_ops.make_volume(CFG.volume_resolution)
    T = cam_pose_at_center()
    rc = raycast(
        vol, CAM, T, CFG.voxel_size, CFG.volume_size, CFG.trunc_dist,
        min_range=0.3, max_range=2.5,
    )
    assert np.isnan(np.array(rc.vmap)).all()
    assert (np.array(rc.depth) == 0).all()


def test_wrap_invariance():
    """Fusing with a nonzero wrap must produce the same logical content."""
    vol0, _, _ = fused_sphere_volume(n_frames=1)
    wrap = [5, 11, 23]
    vol1, _, _ = fused_sphere_volume(n_frames=1, wrap=wrap)
    # physical = (logical + wrap) % R  =>  rolling physical back by wrap
    # on each axis aligns the two volumes. arrays are [z,y,x].
    t1 = np.roll(np.array(vol1.tsdf), (-wrap[2], -wrap[1], -wrap[0]), axis=(0, 1, 2))
    np.testing.assert_allclose(t1, np.array(vol0.tsdf), atol=1e-6)
    w1 = np.roll(np.array(vol1.cw), (-wrap[2], -wrap[1], -wrap[0]), axis=(0, 1, 2))
    np.testing.assert_array_equal(w1, np.array(vol0.cw))


def test_clear_band_simple_and_wrapped():
    R = 16
    vol = tsdf_ops.make_volume(R)
    from kintinuous_tpu.ops.tsdf import pack_cw
    ones_cw = pack_cw(jnp.ones((R, R, R)), jnp.zeros((R, R, R)), jnp.zeros((R, R, R)), jnp.zeros((R, R, R)))
    vol = vol._replace(tsdf=jnp.ones((R, R, R)), cw=ones_cw)
    out = tsdf_ops.clear_band(vol, axis=0, lo=2, hi=5)  # x in [2,5)
    t = np.array(out.tsdf)
    assert (t[:, :, 2:5] == 0).all() and (t[:, :, :2] == 1).all() and (t[:, :, 5:] == 1).all()
    # with wrap: logical band lands at shifted physical indices
    vol2 = vol._replace(wrap=jnp.array([3, 0, 0], jnp.int32))
    out2 = tsdf_ops.clear_band(vol2, axis=0, lo=14, hi=2)  # wraps logical 14,15,0,1
    t2 = np.array(out2.tsdf)
    cleared = np.where(t2[0, 0] == 0)[0]
    np.testing.assert_array_equal(cleared, [1, 2, 3, 4])  # physical (14+3)%16=1 ... (1+3)%16=4


def test_trilinear_exact_on_linear_field():
    R = 16
    z, y, x = np.meshgrid(np.arange(R), np.arange(R), np.arange(R), indexing="ij")
    field = (2.0 * x + 3.0 * y - z).astype(np.f4 if hasattr(np, "f4") else np.float32)
    wrap = jnp.zeros(3, jnp.int32)
    pos = jnp.array([[3.25, 4.5, 7.75], [0.0, 0.0, 0.0], [10.1, 2.9, 3.3]], jnp.float32)
    val, corners, frac = tsdf_ops.trilinear_sample(jnp.array(field), wrap, pos)
    expect = 2.0 * pos[:, 0] + 3.0 * pos[:, 1] - pos[:, 2]
    np.testing.assert_allclose(np.array(val), np.array(expect), atol=1e-4)
    grad = tsdf_ops.trilinear_gradient(corners, frac)
    np.testing.assert_allclose(np.array(grad), np.tile([2.0, 3.0, -1.0], (3, 1)), atol=1e-4)


def test_extract_sphere_points():
    vol, T, _ = fused_sphere_volume()
    R = CFG.volume_resolution
    res = jax.jit(
        lambda v: extract_points(
            v, jnp.zeros(3, jnp.int32), (R, R, R), CFG.voxel_size,
            capacity=CFG.extraction_capacity,
        )
    )(vol)
    cnt = int(res.count)
    assert 100 < cnt < CFG.extraction_capacity
    pts = np.array(res.points[:cnt])
    center_local = np.array([CFG.volume_size / 2] * 3) + SPHERE_CAM  # cam at center, +z fwd
    r = np.linalg.norm(pts - center_local, axis=1)
    # only the camera-facing hemisphere was observed; all points near radius
    assert np.median(np.abs(r - SPHERE_R)) < CFG.voxel_size
    colors = np.array(res.colors[:cnt])
    assert (np.abs(colors - 128.0) < 1.0).mean() > 0.9  # fused grey colour
    assert (np.array(res.weights[:cnt]) >= 1.0).all()


def test_extract_band_subset():
    vol, T, _ = fused_sphere_volume()
    R = CFG.volume_resolution
    # full extraction vs. union of two half-bands along x
    full = extract_points(
        vol, jnp.zeros(3, jnp.int32), (R, R, R), CFG.voxel_size, capacity=120000
    )
    lowr = extract_points(
        vol, jnp.zeros(3, jnp.int32), (R // 2, R, R), CFG.voxel_size, capacity=120000
    )
    uppr = extract_points(
        vol, jnp.array([R // 2, 0, 0], jnp.int32), (R // 2, R, R), CFG.voxel_size,
        capacity=120000,
    )
    n_full, n_lo, n_up = int(full.count), int(lowr.count), int(uppr.count)
    # band split loses only the crossings straddling the cut plane
    assert abs(n_full - (n_lo + n_up)) < 0.02 * n_full + 50


def test_color_fusion_weight_angle():
    """Wrkc = min(1, |n_z|/0.75)*2 (tsdf_volume.cu:622-625): full weight
    fronto-parallel, reduced at grazing incidence, 0 at discontinuities;
    -dc (angle=False) gives 2 everywhere valid."""
    from kintinuous_tpu.ops.maps import color_fusion_weight

    H, W = CAM.height, CAM.width
    u = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0)
    # plane tilted hard around the y axis: depth ramps with u
    x_over_z = (u - CAM.cx) / CAM.fx
    flat = np.full((H, W), 1.5, np.float32)
    tilted = 1.0 / np.maximum(1.0 - 1.6 * x_over_z, 0.2)  # strong slant
    disc = np.zeros((H, W), bool)
    disc[10, 10] = True

    w_flat = np.asarray(color_fusion_weight(CAM, jnp.array(flat), jnp.array(disc)))
    w_tilt = np.asarray(color_fusion_weight(CAM, jnp.array(tilted), jnp.array(disc)))
    interior = np.zeros((H, W), bool)
    interior[2:-2, 2:-2] = True
    interior[10, 10] = False
    assert w_flat[interior].min() > 1.9  # fronto-parallel: ~2
    assert w_flat[10, 10] == 0.0  # discontinuity suppressed
    # grazing region of the tilted plane fuses with clearly less weight
    assert np.median(w_tilt[interior]) < 1.6
    assert np.median(w_tilt[interior]) > 0.3

    w_off = np.asarray(color_fusion_weight(
        CAM, jnp.array(tilted), jnp.array(disc), angle=False))
    valid = interior & (w_off > 0)
    assert (w_off[valid] == 2.0).all()
