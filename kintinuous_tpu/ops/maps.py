"""Vertex/normal map ops (jnp).

TPU-native equivalents of src/frontend/cuda/maps.cu:
  create_vmap     <- createVMap (:122-138)
  create_nmap     <- createNMap (:139-154)
  transform_maps  <- tranformMaps (:203-226)
  resize_vmap     <- resizeVMap (:298-307)
  resize_nmap     <- resizeNMap (:298-307)

Maps are (3, H, W) float32 with NaN marking invalid entries, the same
poisoning convention as the reference's three-plane layout
(maps.cu:70-78) but channel-major for TPU lane tiling.
"""

from __future__ import annotations

import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics
from kintinuous_tpu.geometry.camera import unproject


def create_vmap(cam: CameraIntrinsics, depth_m: jnp.ndarray) -> jnp.ndarray:
    """(H,W) metres (0=invalid) -> (3,H,W) camera-frame vertices."""
    return unproject(cam, jnp.where(depth_m > 0, depth_m, jnp.nan))


def create_nmap(vmap: jnp.ndarray) -> jnp.ndarray:
    """Cross-product normals from right/down neighbours, normalized.

    n(y,x) = normalize( (v(y,x+1)-v(y,x)) x (v(y+1,x)-v(y,x)) ),
    NaN on the last row/col and wherever any operand is invalid
    (reference createNMap, maps.cu:139-154).
    """
    v = vmap
    right = jnp.pad(v[:, :, 1:], ((0, 0), (0, 0), (0, 1)), constant_values=jnp.nan)
    down = jnp.pad(v[:, 1:, :], ((0, 0), (0, 1), (0, 0)), constant_values=jnp.nan)
    a = right - v
    b = down - v
    n = jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )
    norm = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    return jnp.where(norm > 1e-12, n / norm, jnp.nan)


def transform_maps(vmap: jnp.ndarray, nmap: jnp.ndarray, T: jnp.ndarray):
    """Apply a rigid transform to both maps (reference tranformMaps,
    maps.cu:203-226). T: (4,4); vmap/nmap: (3,H,W)."""
    R = T[:3, :3]
    t = T[:3, 3]
    v = jnp.einsum("ij,jhw->ihw", R, vmap) + t[:, None, None]
    n = jnp.einsum("ij,jhw->ihw", R, nmap)
    return v, n


def _avg_pool2(m: jnp.ndarray) -> jnp.ndarray:
    """2x2 NaN-aware average downsample of (3,H,W)."""
    C, H, W = m.shape
    He, We = (H // 2) * 2, (W // 2) * 2
    q = m[:, :He, :We].reshape(C, He // 2, 2, We // 2, 2)
    # a sample is valid only if all channels are finite
    valid = jnp.isfinite(q).all(axis=0, keepdims=True)
    s = jnp.where(valid, q, 0.0).sum(axis=(2, 4))
    cnt = valid.astype(m.dtype).sum(axis=(2, 4))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.nan)


def resize_vmap(vmap: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution vertex map by validity-aware 2x2 averaging
    (reference resizeVMap, maps.cu:298-307)."""
    return _avg_pool2(vmap)


def resize_nmap(nmap: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution normal map: 2x2 average then renormalize
    (reference resizeNMap normalized flag, maps.cu:298-307)."""
    n = _avg_pool2(nmap)
    norm = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    return jnp.where(norm > 1e-12, n / norm, jnp.nan)


def color_fusion_weight(cam, depth_m, disc_mask, angle: bool = True):
    """Per-pixel colour fusion weight Wrkc (reference tsdf23 colour
    path, tsdf_volume.cu:622-625): min(1, |n_z|/0.75) * 2 from the
    CURRENT frame's normal map in camera frame; 0 where the normal is
    invalid or the pixel sits on a depth discontinuity (the role of
    scaleDepth's negative no_color flag, :490-538). `angle=False` is
    the reference's -dc switch (disableColorAngleWeight)."""
    import jax.numpy as jnp

    vmap = create_vmap(cam, depth_m)
    nmap = create_nmap(vmap)
    nz = jnp.abs(nmap[2])
    valid = jnp.isfinite(nmap).all(axis=0) & (depth_m > 0)
    if angle:
        w = jnp.minimum(1.0, nz / 0.75) * 2.0
    else:
        w = jnp.full_like(nz, 2.0)
    return jnp.where(valid & jnp.logical_not(disc_mask), w, 0.0)


def quantize_color_w(w):
    """Colour weight [0,2] -> u8 (shared by every integrate path so
    the dense/fast/pallas results stay bit-comparable)."""
    import jax.numpy as jnp

    return jnp.clip(jnp.round(w * 127.5), 0, 255).astype(jnp.uint32)
