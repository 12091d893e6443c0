"""TSDF volume state + fusion + band clears (jnp).

TPU-native redesign of src/frontend/cuda/tsdf_volume.cu and the volume
containers (src/frontend/TSDFVolume.{h,cpp}, ColorVolume.{h,cpp}):

- the volume lives as donated HBM-resident jax arrays inside the jitted
  tracking step — the role of DeviceArray2D<short> (TSDFVolume.cpp:69);
- colour and fusion weight are packed into ONE uint32 per voxel
  (weight<<24 | r<<16 | g<<8 | b), mirroring the reference's uchar4
  with weight in .w (ColorVolume.cpp:58-64, tsdf_volume.cu:616-621) —
  on TPU this is also the layout-correct choice: any volume-sized
  array with a trailing dim of 3 gets lane-padded ~42x by the tiler;
- `integrate` <- integrateTsdfVolume's scaleDepth+tsdf23 pair
  (tsdf_volume.cu:490-639): instead of one CUDA thread marching z per
  (x,y) column, we sweep physical z-chunks with fully vectorised
  COMPONENT-WISE projection (no (...,3) temporaries) and a gather from
  the depth image — the TPU-friendly direction for this access pattern;
- `clear_band` <- the 12 clearVolume{X,Y,Z}{,Back}{,c} kernels
  (tsdf_volume.cu:117-448) collapse into ONE masked elementwise pass;
- cyclical addressing: physical = (logical + wrap) mod R, the same
  rolling-buffer trick as tsdf_volume.cu:612-615.

Conventions (shared with ops/raycast.py, ops/extract.py,
ops/surface_nets.py):
- arrays are indexed [z, y, x]; coordinate/wrap vectors are [x, y, z];
- logical voxel g in [0,R)^3 has local-world center (g + 0.5) * voxel;
  the volume box is [0, volume_size]^3 in "local" metres;
- tsdf=0 & weight=0 means unseen; fused tsdf is in [-1, 1].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics


class VolumeState(NamedTuple):
    """The rolling TSDF + colour volume (a jit-donatable pytree)."""

    tsdf: jnp.ndarray  # (R,R,R) f32 [z,y,x], truncated signed distance in [-1,1]
    cw: jnp.ndarray  # (R,R,R) u32 packed weight<<24 | r<<16 | g<<8 | b
    wrap: jnp.ndarray  # (3,) i32 [x,y,z] cyclical offset: phys = (logical+wrap) % R
    origin: jnp.ndarray  # (3,) f32 [x,y,z] global metres of local (0,0,0) corner


def pack_cw(weight, r, g, b):
    """weight (0..255 float/int), colour channels (0..255) -> uint32."""
    w = jnp.clip(weight, 0, 255).astype(jnp.uint32)
    return (
        (w << 24)
        | (jnp.clip(r, 0, 255).astype(jnp.uint32) << 16)
        | (jnp.clip(g, 0, 255).astype(jnp.uint32) << 8)
        | jnp.clip(b, 0, 255).astype(jnp.uint32)
    )


def unpack_cw(cw):
    """uint32 -> (weight, r, g, b) float32."""
    w = (cw >> 24).astype(jnp.float32)
    r = ((cw >> 16) & 0xFF).astype(jnp.float32)
    g = ((cw >> 8) & 0xFF).astype(jnp.float32)
    b = (cw & 0xFF).astype(jnp.float32)
    return w, r, g, b


def make_volume(resolution: int) -> VolumeState:
    R = resolution
    return VolumeState(
        tsdf=jnp.zeros((R, R, R), jnp.float32),
        cw=jnp.zeros((R, R, R), jnp.uint32),
        wrap=jnp.zeros((3,), jnp.int32),
        origin=jnp.zeros((3,), jnp.float32),
    )


def scale_depth(cam: CameraIntrinsics, depth_m: jnp.ndarray) -> jnp.ndarray:
    """Convert a z-depth map to per-pixel ray lengths (reference
    scaleDepth, tsdf_volume.cu:490-538). 0 stays 0 (invalid)."""
    H, W = depth_m.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    xl = (u - cam.cx) / cam.fx
    yl = (v - cam.cy) / cam.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    return jnp.where(depth_m > 0, depth_m * lam, 0.0)


def integrate(
    vol: VolumeState,
    cam: CameraIntrinsics,
    depth_m: jnp.ndarray,  # (H,W) metres, 0 invalid (bilateral-filtered)
    rgb: jnp.ndarray,  # (H,W,3) f32 0..255
    color_w: jnp.ndarray,  # (H,W) colour fusion weight [0,2] (0 = no
    # colour: invalid normal / depth discontinuity); a bool mask is
    # accepted as legacy shorthand for where(mask, 0, 2)
    T_cam_to_local: jnp.ndarray,  # (4,4) camera->local-volume metres
    voxel_size: float,
    trunc_dist: float,
    max_weight: float = 128.0,
    z_chunk: int = 64,
    z_phys_offset=0,
) -> VolumeState:
    """Fuse one frame into the volume (reference tsdf23,
    tsdf_volume.cu:540-639, incl. the discontinuity colour guard and
    the weight cap at 128, :486).

    Multi-chip: vol.tsdf may be a z-SLAB of a larger cube — pass the
    slab's first physical z index as z_phys_offset; wrap arithmetic
    uses the full resolution taken from the (unsharded) y dimension.
    """
    Rz = vol.tsdf.shape[0]  # local slab depth
    R = vol.tsdf.shape[1]  # full resolution (y dim is never sharded)
    z_chunk = min(z_chunk, Rz)
    assert Rz % z_chunk == 0
    H, W = depth_m.shape

    from kintinuous_tpu.ops.maps import quantize_color_w

    if color_w.dtype == jnp.bool_:
        color_w = jnp.where(color_w, 0.0, 2.0)
    q_w = quantize_color_w(color_w)  # u32 0..255
    ray_len = scale_depth(cam, depth_m)  # (H,W)
    flat_ray = ray_len.reshape(-1)
    flat_q = q_w.reshape(-1)
    # pack the rgb frame once; single u32 gather in the sweep
    rgb_u32 = pack_cw(
        jnp.zeros(rgb.shape[:2]), rgb[..., 0], rgb[..., 1], rgb[..., 2]
    ).reshape(-1)

    Tinv = jnp.linalg.inv(T_cam_to_local)
    Rcl, tcl = Tinv[:3, :3], Tinv[:3, 3]

    wrap = vol.wrap  # [x,y,z]
    p_idx = jnp.arange(R, dtype=jnp.int32)
    gx = jnp.mod(p_idx - wrap[0], R)
    gy = jnp.mod(p_idx - wrap[1], R)
    wx = (gx.astype(jnp.float32) + 0.5) * voxel_size  # (R,) local x per phys x
    wy = (gy.astype(jnp.float32) + 0.5) * voxel_size  # (R,) local y per phys y

    # camera-frame coords are affine in (wx, wy, wz): precompute the
    # separable pieces so the sweep only does broadcast adds (never
    # materialising a (...,3) tensor)
    cx_x = Rcl[0, 0] * wx  # (R,)
    cy_x = Rcl[1, 0] * wx
    cz_x = Rcl[2, 0] * wx
    cx_y = Rcl[0, 1] * wy
    cy_y = Rcl[1, 1] * wy
    cz_y = Rcl[2, 1] * wy

    def body(ci, carry):
        tsdf, cw = carry
        z0 = ci * z_chunk
        pz = z_phys_offset + z0 + jnp.arange(z_chunk, dtype=jnp.int32)
        gz = jnp.mod(pz - wrap[2], R)
        wz = (gz.astype(jnp.float32) + 0.5) * voxel_size  # (C,)

        def bc(vx, vy, vz, t):  # (R,)x,(R,)y,(C,)z -> (C,R,R)
            return (
                vx[None, None, :] + vy[None, :, None] + vz[:, None, None] + t
            )

        x = bc(cx_x, cx_y, Rcl[0, 2] * wz, tcl[0])
        y = bc(cy_x, cy_y, Rcl[1, 2] * wz, tcl[1])
        z = bc(cz_x, cz_y, Rcl[2, 2] * wz, tcl[2])
        zs = jnp.maximum(z, 1e-6)
        ui = jnp.round(x / zs * cam.fx + cam.cx).astype(jnp.int32)
        vi = jnp.round(y / zs * cam.fy + cam.cy).astype(jnp.int32)
        in_img = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)

        samp_ray = flat_ray[idx]  # (C,R,R)
        valid = in_img & (samp_ray > 0)

        vox_ray = jnp.sqrt(x * x + y * y + z * z)
        sdf = samp_ray - vox_ray
        fuse = valid & (sdf >= -trunc_dist)
        tsdf_new = jnp.minimum(1.0, sdf / trunc_dist)

        t_old = jax.lax.dynamic_slice_in_dim(tsdf, z0, z_chunk, 0)
        cw_old = jax.lax.dynamic_slice_in_dim(cw, z0, z_chunk, 0)
        w_old, r_old, g_old, b_old = unpack_cw(cw_old)

        w_upd = jnp.where(fuse, jnp.minimum(w_old + 1.0, max_weight), w_old)
        t_upd = jnp.where(
            fuse,
            (t_old * w_old + tsdf_new) / jnp.maximum(w_old + 1.0, 1.0),
            t_old,
        )
        # colour: view-angle-weighted running average, fused when the
        # pixel has a usable normal (w_c > 0) or the voxel is still
        # black (bootstrap) — tsdf_volume.cu:622-636
        samp_q = flat_q[idx].astype(jnp.float32)
        w_c = samp_q / 127.5
        samp_rgb = rgb_u32[idx]
        _, r_new, g_new, b_new = unpack_cw(samp_rgb)
        black = (r_old + g_old + b_old) == 0
        cfuse = fuse & ((samp_q > 0) | black)
        inv_w = 1.0 / jnp.maximum(w_old + w_c, 1e-6)

        def mix(old, new):
            return jnp.where(cfuse, (old * w_old + w_c * new) * inv_w, old)

        cw_upd = pack_cw(w_upd, mix(r_old, r_new), mix(g_old, g_new), mix(b_old, b_new))

        tsdf = jax.lax.dynamic_update_slice_in_dim(tsdf, t_upd, z0, 0)
        cw = jax.lax.dynamic_update_slice_in_dim(cw, cw_upd, z0, 0)
        return tsdf, cw

    tsdf, cw = jax.lax.fori_loop(0, Rz // z_chunk, body, (vol.tsdf, vol.cw))
    return vol._replace(tsdf=tsdf, cw=cw)


def clear_band(vol: VolumeState, axis: int, lo, hi) -> VolumeState:
    """Zero tsdf/weight/colour for logical coords `axis` in [lo, hi)
    (mod R). Replaces all 12 clearVolume* kernels
    (tsdf_volume.cu:117-448) with one masked elementwise pass.

    axis: 0=x, 1=y, 2=z (semantic). lo/hi may be traced ints; the band
    wraps mod R, and lo==hi clears nothing.
    """
    R = vol.tsdf.shape[0]
    wrap = vol.wrap[axis]
    phys = jnp.arange(R, dtype=jnp.int32)
    logical = jnp.mod(phys - wrap, R)
    lo = jnp.mod(lo, R)
    hi = jnp.mod(hi, R)
    in_band = jnp.where(
        lo <= hi,
        (logical >= lo) & (logical < hi),
        (logical >= lo) | (logical < hi),
    )
    # broadcast along the right array dimension: axis x->2, y->1, z->0
    dim = 2 - axis
    shape = [1, 1, 1]
    shape[dim] = R
    mask = in_band.reshape(shape)
    keep = jnp.logical_not(mask)
    return vol._replace(
        tsdf=vol.tsdf * keep,
        cw=jnp.where(keep, vol.cw, jnp.uint32(0)),
    )


def trilinear_sample(tsdf: jnp.ndarray, wrap: jnp.ndarray, pos_vox: jnp.ndarray):
    """Trilinearly sample the wrapped volume at fractional logical voxel
    coordinates (reference readInterpolated, ray_caster.cu:350-378).

    tsdf: (R,R,R) [z,y,x]; wrap: (3,)[x,y,z];
    pos_vox: (...,3) [x,y,z] in voxel-center units (g+0.5 convention ->
    pass local_pos/voxel_size - 0.5).

    Returns (value, corner_values (...,8), frac (...,3)) so callers can
    reuse the 8 corners for analytic gradients.
    """
    R = tsdf.shape[0]
    base = jnp.floor(pos_vox).astype(jnp.int32)  # (...,3)
    frac = pos_vox - base
    flat = tsdf.reshape(-1)

    def corner(cx, cy, cz):
        ix = jnp.mod(base[..., 0] + cx + wrap[0], R)
        iy = jnp.mod(base[..., 1] + cy + wrap[1], R)
        iz = jnp.mod(base[..., 2] + cz + wrap[2], R)
        return flat[(iz * R + iy) * R + ix]

    c000 = corner(0, 0, 0)
    c100 = corner(1, 0, 0)
    c010 = corner(0, 1, 0)
    c110 = corner(1, 1, 0)
    c001 = corner(0, 0, 1)
    c101 = corner(1, 0, 1)
    c011 = corner(0, 1, 1)
    c111 = corner(1, 1, 1)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    val = c0 * (1 - fz) + c1 * fz
    corners = jnp.stack([c000, c100, c010, c110, c001, c101, c011, c111], axis=-1)
    return val, corners, frac


def trilinear_gradient(corners: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    """Analytic gradient of the trilinear interpolant wrt voxel coords,
    from the 8 corner values — replaces the reference's 6 extra
    interpolated taps for normals (ray_caster.cu:380-420) with zero
    extra memory traffic."""
    c000, c100, c010, c110, c001, c101, c011, c111 = [
        corners[..., i] for i in range(8)
    ]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    dx = (
        (c100 - c000) * (1 - fy) * (1 - fz)
        + (c110 - c010) * fy * (1 - fz)
        + (c101 - c001) * (1 - fy) * fz
        + (c111 - c011) * fy * fz
    )
    dy = (
        (c010 - c000) * (1 - fx) * (1 - fz)
        + (c110 - c100) * fx * (1 - fz)
        + (c011 - c001) * (1 - fx) * fz
        + (c111 - c101) * fx * fz
    )
    dz = (
        (c001 - c000) * (1 - fx) * (1 - fy)
        + (c101 - c100) * fx * (1 - fy)
        + (c011 - c010) * (1 - fx) * fy
        + (c111 - c110) * fx * fy
    )
    return jnp.stack([dx, dy, dz], axis=-1)
