"""Depth/intensity preprocessing ops (jnp, fully XLA-fusible).

TPU-native equivalents of the reference's bilateral_pyrdown.cu kernel
family (src/frontend/cuda/bilateral_pyrdown.cu):
  bilateral_filter      <- bilateralFilter (:332-343, sigmas :56-57)
  pyr_down_depth        <- pyrDown (:344-355) depth-aware 2x downsample
  pyr_down_gauss        <- pyrDownGaussF / pyrDownUcharGauss (:356-403)
  depth_to_metres       <- shortDepthToMetres (:404-412)
  rgb_to_intensity      <- imageBGRToIntensity (:413-421, luma :247-258)
  sobel_gradients       <- computeDerivativeImages (:300-330)

All window ops are expressed as sums of statically-shifted copies of a
zero-padded array — XLA fuses these into a single VPU loop; there is no
benefit to hand-writing Pallas for them at these sizes.

Convention: depth maps are float32 with 0 marking invalid pixels
(easier to fuse than NaN; vertex maps downstream use NaN like the
reference's vmaps).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shifted(img, dy, dx, pad_value=0.0):
    """img shifted so result[y,x] = img[y+dy, x+dx], edges -> pad_value."""
    H, W = img.shape
    r = max(abs(dy), abs(dx))
    padded = jnp.pad(img, r, constant_values=pad_value)
    return jax.lax.dynamic_slice(padded, (r + dy, r + dx), (H, W))


def bilateral_filter(
    depth_mm: jnp.ndarray,
    sigma_depth_mm: float = 30.0,
    sigma_space: float = 4.5,
    radius: int = 6,
) -> jnp.ndarray:
    """Edge-preserving depth smoothing.

    depth_mm: (H, W) float32 depth in millimetres, 0 = invalid.
    Matches the reference's parameterisation (sigma_color=30mm in
    depth units, sigma_space=4.5px, window radius 6 ->13x13,
    bilateral_pyrdown.cu:56-60).
    """
    valid = depth_mm > 0
    inv2_d = 0.5 / (sigma_depth_mm * sigma_depth_mm)
    inv2_s = 0.5 / (sigma_space * sigma_space)
    wsum = jnp.zeros_like(depth_mm)
    vsum = jnp.zeros_like(depth_mm)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            n = _shifted(depth_mm, dy, dx)
            nvalid = n > 0
            diff = n - depth_mm
            w = jnp.exp(-(diff * diff) * inv2_d - (dy * dy + dx * dx) * inv2_s)
            w = jnp.where(nvalid, w, 0.0)
            wsum = wsum + w
            vsum = vsum + w * n
    out = jnp.where(wsum > 0, vsum / jnp.maximum(wsum, 1e-12), 0.0)
    return jnp.where(valid, out, 0.0)


def _subsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Every-2nd-pixel subsample via reshape (NOT a strided slice: XLA
    lowers strided slices of shifted images to scalar gathers on TPU —
    measured ~0.9 ms per 320x240 slice — while reshape+unit-slice is a
    plain relayout copy)."""
    H, W = img.shape
    He, We = (H // 2) * 2, (W // 2) * 2
    return img[:He, :We].reshape(H // 2, 2, W // 2, 2)[:, 0, :, 0]


def pyr_down_depth(depth: jnp.ndarray, sigma: float = 3.0 * 30.0) -> jnp.ndarray:
    """Depth-aware 2x downsample: averages the 5x5 neighbourhood around
    each even pixel, rejecting neighbours further than `sigma` from the
    centre value (avoids mixing across depth discontinuities —
    reference pyrDown, bilateral_pyrdown.cu:344-355).

    Works for depth in mm or metres; pass sigma in the same units.
    The window sums run at full resolution (fused VPU passes) and the
    result is subsampled once — computing at output resolution would
    force 25 strided-slice gathers (see _subsample2).
    """
    ssum = jnp.zeros_like(depth)
    cnt = jnp.zeros_like(depth)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            n = _shifted(depth, dy, dx)
            ok = (n > 0) & (jnp.abs(n - depth) < sigma)
            ssum = ssum + jnp.where(ok, n, 0.0)
            cnt = cnt + ok.astype(depth.dtype)
    out = jnp.where(cnt > 0, ssum / jnp.maximum(cnt, 1.0), 0.0)
    return _subsample2(jnp.where(depth > 0, out, 0.0))


_BINOMIAL5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def pyr_down_gauss(img: jnp.ndarray) -> jnp.ndarray:
    """Plain 5x5 binomial blur + stride-2 downsample for intensity
    images (reference pyrDownGaussF, bilateral_pyrdown.cu:356-379)."""
    H, W = img.shape
    k = _BINOMIAL5.astype(img.dtype)
    # separable: rows then cols, via shifts (cheap, fusible)
    tmp = jnp.zeros_like(img)
    for i, dy in enumerate(range(-2, 3)):
        tmp = tmp + k[i] * _shifted(img, dy, 0, pad_value=0.0)
    out = jnp.zeros_like(img)
    for i, dx in enumerate(range(-2, 3)):
        out = out + k[i] * _shifted(tmp, 0, dx, pad_value=0.0)
    return _subsample2(out)


def depth_to_metres(depth_mm: jnp.ndarray, max_depth_m: float = 6.0) -> jnp.ndarray:
    """uint16/float mm -> float32 metres; 0 marks invalid, far-clip to 0
    (reference shortDepthToMetres with its cutoff,
    bilateral_pyrdown.cu:404-412)."""
    d = depth_mm.astype(jnp.float32) * 1e-3
    return jnp.where((d > 0) & (d < max_depth_m), d, 0.0)


def rgb_to_intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3) uint8 RGB -> (H,W) float32 luma in [0,255]
    (reference imageBGRToIntensity, coefficients
    bilateral_pyrdown.cu:247-258)."""
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    return 0.299 * r + 0.587 * g + 0.114 * b


def sobel_gradients(img: jnp.ndarray):
    """3x3 Sobel dI/dx, dI/dy scaled by 1/8 (reference
    computeDerivativeImages, bilateral_pyrdown.cu:300-330)."""
    s = partial(_shifted, img)
    gx = (
        (s(-1, 1) + 2.0 * s(0, 1) + s(1, 1))
        - (s(-1, -1) + 2.0 * s(0, -1) + s(1, -1))
    ) * 0.125
    gy = (
        (s(1, -1) + 2.0 * s(1, 0) + s(1, 1))
        - (s(-1, -1) + 2.0 * s(-1, 0) + s(-1, 1))
    ) * 0.125
    return gx, gy


def depth_discontinuity_mask(
    depth_m: jnp.ndarray, radius: int = 3, jump_m: float = 0.2
) -> jnp.ndarray:
    """True where a 7x7 window contains a depth jump > jump_m relative
    to the centre — used to suppress colour bleeding at silhouettes
    during fusion (reference scaleDepth's negative-sign flag,
    tsdf_volume.cu:490-538)."""
    out = jnp.zeros(depth_m.shape, dtype=bool)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            n = _shifted(depth_m, dy, dx)
            out = out | ((n > 0) & (jnp.abs(n - depth_m) > jump_m))
    return out & (depth_m > 0)
