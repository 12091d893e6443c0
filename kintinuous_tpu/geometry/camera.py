"""Pinhole camera projection helpers (jnp).

Role of the reference's Intr struct + per-kernel projection code
(src/frontend/cuda/internal.h:249-273, maps.cu:122-138).
"""

from __future__ import annotations

import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics


def intrinsics_matrix(cam: CameraIntrinsics, dtype=jnp.float32):
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]], dtype=dtype
    )


def unproject(cam: CameraIntrinsics, depth):
    """Depth map (H,W) in metres -> vertex map (3,H,W) in camera frame.

    Invalid depth (<=0 or nan) produces nan vertices, matching the
    reference's NaN-poisoned vmap convention (maps.cu:70-78).
    """
    H, W = depth.shape
    u = jnp.arange(W, dtype=depth.dtype)[None, :]
    v = jnp.arange(H, dtype=depth.dtype)[:, None]
    valid = jnp.isfinite(depth) & (depth > 0)
    z = jnp.where(valid, depth, jnp.nan)
    x = (u - cam.cx) / cam.fx * z
    y = (v - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=0)


def project(cam: CameraIntrinsics, pts):
    """Points (...,3) in camera frame -> pixel coords (...,2) (u,v) + valid mask.

    valid requires z > 0 and the projected pixel inside the image.
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    zsafe = jnp.where(z > 1e-6, z, 1.0)
    u = x / zsafe * cam.fx + cam.cx
    v = y / zsafe * cam.fy + cam.cy
    valid = (
        (z > 1e-6)
        & (u >= 0)
        & (u <= cam.width - 1)
        & (v >= 0)
        & (v <= cam.height - 1)
        & jnp.isfinite(u)
        & jnp.isfinite(v)
    )
    return jnp.stack([u, v], axis=-1), valid


def bilinear_sample(img, uv, valid=None):
    """Sample (H,W) image at float pixel coords uv (...,2) bilinearly.

    Out-of-range coords are clamped; combine with the `valid` mask from
    project() for gating. NaN-safe only if the image is NaN-free.
    """
    H, W = img.shape[-2], img.shape[-1]
    u = jnp.clip(uv[..., 0], 0.0, W - 1.000001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.000001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    flat = img.reshape(img.shape[:-2] + (H * W,))

    def take(vv, uu):
        return jnp.take(flat, vv * W + uu, axis=-1)

    s = (
        take(v0, u0) * (1 - du) * (1 - dv)
        + take(v0, u1) * du * (1 - dv)
        + take(v1, u0) * (1 - du) * dv
        + take(v1, u1) * du * dv
    )
    if valid is not None:
        s = jnp.where(valid, s, jnp.nan)
    return s


def nearest_sample(img, uv):
    """Nearest-neighbour sample of (H,W) img at uv (...,2)."""
    H, W = img.shape[-2], img.shape[-1]
    u = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    flat = img.reshape(img.shape[:-2] + (H * W,))
    return jnp.take(flat, v * W + u, axis=-1)
