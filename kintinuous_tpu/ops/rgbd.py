"""Photometric (RGB-D) odometry terms (jnp).

TPU-native equivalent of the reference's dense photometric tracking:
  rgb_system   <- computeRgbResidual + rgbStep fused
                  (src/frontend/cuda/reduce.cu:668-791, :423-607)
  rgbd_icp_odometry <- RGBDOdometry::getIncrementalTransformation
                  (src/frontend/RGBDOdometry.cpp:165-393)

The reference runs a correspondence kernel producing a DataTerm image,
downloads sigma statistics, then a second weighted reduction per
iteration. Here both passes are fused jnp stages inside one jit: the
residual pass computes sigma on device, the weighted system falls out
of a masked einsum, and the fused ICP+RGB solve
(A = A_rgb + w^2 A_icp, w=10, RGBDOdometry.cpp:316-321) stays on
device.

Residual convention: r0 = I_prev(pi(T x)) - I_curr(x); linearised
r(xi) = r0 + a . xi with a = [p x g, g], g = image-gradient chain rule;
the solve returns xi = A^-1 (-sum w a r0) and composes T <- exp(xi) T,
matching the ICP update direction in ops/reduce.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.ops.reduce import (
    GNSystem,
    icp_associate,
    icp_build_from_assoc,
    icp_step,
    pack_maps,
    solve_gn,
)

# squared minimum gradient magnitudes per level, finest first
# (reference RGBDOdometry.cpp:109-113)
MIN_GRAD2 = (12.0 ** 2, 5.0 ** 2, 3.0 ** 2, 1.0 ** 2)
MAX_DEPTH_DELTA = 0.07  # metres (RGBDOdometry.cpp:40)


def pack_prev_texture(
    int_prev: jnp.ndarray,
    gradx_prev: jnp.ndarray,
    grady_prev: jnp.ndarray,
    depth_prev: jnp.ndarray,
) -> jnp.ndarray:
    """(H,W) x4 channels -> (H*W, 4) row texture.

    One contiguous 16 B row gather fetches all four previous-frame
    channels per bilinear corner — the img_rows pattern of
    ops/tsdf_fast.build_depth_tables (contiguous row gathers run ~3x
    faster than scalar gathers on TPU and amortise the channels into
    one fetch). Built once per level, reused across GN iterations."""
    tex = jnp.stack(
        [int_prev, gradx_prev, grady_prev, depth_prev], axis=-1
    ).reshape(-1, 4)
    (tex,) = jax.lax.optimization_barrier((tex,))
    return tex


def _nearest_rows(tex: jnp.ndarray, H: int, W: int, uv: jnp.ndarray):
    """Nearest-neighbour sample of an (H*W, C) row texture: ONE row
    gather per pixel (vs four for bilinear). Used for all but the final
    GN iterations of a level — early iterations only need the gradient
    direction, and the single gather is ~4x cheaper."""
    u = jnp.clip(jnp.round(uv[..., 0]), 0.0, W - 1.0).astype(jnp.int32)
    v = jnp.clip(jnp.round(uv[..., 1]), 0.0, H - 1.0).astype(jnp.int32)
    idx = (v * W + u).reshape(-1)
    return tex[idx].reshape(*uv.shape[:-1], tex.shape[-1])


def _bilinear_rows(tex: jnp.ndarray, H: int, W: int, uv: jnp.ndarray):
    """Bilinear sample of an (H*W, C) row texture at uv (...,2): four
    row gathers instead of 4*C scalar gathers; weights are applied per
    row so each channel gets exactly bilinear_sample's arithmetic."""
    u = jnp.clip(uv[..., 0], 0.0, W - 1.000001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.000001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)

    def corner(vv, uu):
        idx = (vv * W + uu).reshape(-1)
        return tex[idx].reshape(*uu.shape, tex.shape[-1])

    return (
        corner(v0, u0) * (1 - du) * (1 - dv)
        + corner(v0, u1) * du * (1 - dv)
        + corner(v1, u0) * (1 - du) * dv
        + corner(v1, u1) * du * dv
    )


def rgb_system(
    cam: CameraIntrinsics,
    T_curr_to_prev: jnp.ndarray,
    vmap_curr: jnp.ndarray,  # (3,h,w) current camera-frame vertices
    int_curr: jnp.ndarray,  # (h,w) current intensity
    tex_prev: jnp.ndarray,  # (H*W,4) packed [int|gradx|grady|depth] (pack_prev_texture)
    prev_hw: Tuple[int, int],
    min_grad2: float,
    max_depth_delta: float = MAX_DEPTH_DELTA,
    axis_name: Optional[str] = None,
    bilinear: bool = True,
) -> GNSystem:
    """One weighted photometric normal-equation build at one level.

    Multi-chip: vmap_curr/int_curr may hold only this device's pixel-row
    block (tex_prev stays full). axis_name psums the sigma statistics so
    the robust weights match the single-chip values; the caller psums
    the returned A/b/count like the ICP systems."""
    R = T_curr_to_prev[:3, :3]
    t = T_curr_to_prev[:3, 3]
    p = jnp.einsum("ij,jhw->ihw", R, vmap_curr) + t[:, None, None]
    px, py, pz = p[0], p[1], p[2]
    zs = jnp.maximum(pz, 1e-6)
    u = px / zs * cam.fx + cam.cx
    v = py / zs * cam.fy + cam.cy
    H, W = prev_hw
    in_img = (pz > 0) & (u >= 1) & (u <= W - 2) & (v >= 1) & (v <= H - 2)
    uv = jnp.stack([u, v], axis=-1)
    uv = jnp.where(in_img[..., None], uv, 1.0)

    samp = (
        _bilinear_rows(tex_prev, H, W, uv) if bilinear
        else _nearest_rows(tex_prev, H, W, uv)
    )
    i_prev = samp[..., 0]
    gx = samp[..., 1]
    gy = samp[..., 2]
    d_prev = samp[..., 3]

    finite = jnp.isfinite(vmap_curr).all(axis=0)
    mask = (
        in_img
        & finite
        & (d_prev > 0)
        & (jnp.abs(d_prev - pz) < max_depth_delta)  # occlusion gate (:754-770)
        & (gx * gx + gy * gy > min_grad2)  # texture gate (:109-113)
    )
    diff = i_prev - int_curr

    # sigma pass (reference computeRgbResidual statistics, :668-791)
    m = mask.astype(jnp.float32)
    ssum = jnp.sum(jnp.where(mask, diff * diff, 0.0))
    scnt = m.sum()
    if axis_name is not None:
        ssum = jax.lax.psum(ssum, axis_name)
        scnt = jax.lax.psum(scnt, axis_name)
    sigma = jnp.sqrt(ssum / jnp.maximum(scnt, 1.0))
    w = jnp.where(mask, 1.0 / (sigma + jnp.abs(diff) + 1e-3), 0.0)

    # chain rule g = dI/dp
    g0 = gx * cam.fx / zs
    g1 = gy * cam.fy / zs
    g2 = -(g0 * px + g1 * py) / zs
    pxg = jnp.stack(
        [
            py * g2 - pz * g1,
            pz * g0 - px * g2,
            px * g1 - py * g0,
        ],
        axis=0,
    )
    a = jnp.concatenate([pxg, jnp.stack([g0, g1, g2], axis=0)], axis=0)  # (6,h,w)
    a = jnp.where(mask[None], a, 0.0).reshape(6, -1)
    wr = jnp.where(mask, -w * diff, 0.0).reshape(-1)
    wsqrt = jnp.sqrt(w).reshape(-1)
    aw = a * wsqrt[None]
    A = jnp.einsum("in,jn->ij", aw, aw)
    b = jnp.einsum("in,n->i", a, wr)
    return GNSystem(A=A, b=b, count=m.sum(), residual=sigma)


class RGBDFramePyramid(NamedTuple):
    """Per-level previous-frame photometric data carried in tracker state."""

    intensity: Tuple[jnp.ndarray, ...]
    gradx: Tuple[jnp.ndarray, ...]
    grady: Tuple[jnp.ndarray, ...]
    depth: Tuple[jnp.ndarray, ...]


def build_rgbd_pyramid(intensity: jnp.ndarray, depth_m: jnp.ndarray, levels: int):
    """Intensity + Sobel + depth pyramids (RGBDOdometry.cpp:140-187)."""
    from kintinuous_tpu.ops import preprocess as pp

    ints, gxs, gys, ds = [], [], [], []
    i, d = intensity, depth_m
    for l in range(levels):
        gx, gy = pp.sobel_gradients(i)
        ints.append(i)
        gxs.append(gx)
        gys.append(gy)
        ds.append(d)
        if l + 1 < levels:
            i = pp.pyr_down_gauss(i)
            d = pp.pyr_down_depth(d, sigma=0.09)
    return RGBDFramePyramid(
        intensity=tuple(ints), gradx=tuple(gxs), grady=tuple(gys), depth=tuple(ds)
    )


def rgbd_icp_odometry(
    cam: CameraIntrinsics,
    curr_pyr,  # MapPyramid of current frame (vmap, nmap per level)
    curr_rgbd: RGBDFramePyramid,
    prev_rgbd: RGBDFramePyramid,
    pred_pyr,  # MapPyramid for ICP terms (raycast prediction) or None
    iterations: Sequence[int],
    icp_weight: float = 10.0,
    dist_thresh: float = 0.10,
    angle_thresh_deg: float = 20.0,
    jump_reject_m: float = 0.3,
    min_inliers: float = 30.0,
    reassoc_every: int = 1,
    T_init=None,
    T_prior=None,
    prior_weight=0.0,
):
    """Fused dense RGB-D (+ optional ICP) coarse-to-fine odometry.

    T_prior (+ prior_weight, possibly a traced scalar): constant-
    velocity motion prior on the fused system
    (ops/reduce.add_motion_prior); T_init warm-starts the solve.

    Returns (T_curr_to_prev, rgb_inliers, sigma). The 0.3 m jump guard
    (RGBDOdometry.cpp:383-387) rejects divergent solutions to identity.

    reassoc_every > 1 freezes the ICP projective association for groups
    of GN steps (the expensive gather; ops/reduce.icp_solve_level does
    the same for the ICP-only tracker). The photometric term re-samples
    every iteration regardless — its gather IS the residual.
    """
    levels = len(curr_pyr)
    sin_t = math.sin(math.radians(angle_thresh_deg))
    use_prior = T_prior is not None
    T0 = T_init if T_init is not None else jnp.eye(4, dtype=jnp.float32)
    T = T0
    count = jnp.float32(0.0)
    sigma = jnp.float32(0.0)
    w2 = icp_weight * icp_weight
    for l in range(levels - 1, -1, -1):
        iters = int(iterations[l]) if l < len(iterations) else 0
        if iters == 0:
            continue
        cam_l = cam.at_level(l)
        vc, nc = curr_pyr[l]
        mg2 = MIN_GRAD2[min(l, len(MIN_GRAD2) - 1)]
        # packed once per level, gathered by every GN iteration
        tex_prev = pack_prev_texture(
            prev_rgbd.intensity[l], prev_rgbd.gradx[l],
            prev_rgbd.grady[l], prev_rgbd.depth[l],
        )
        prev_hw = prev_rgbd.intensity[l].shape
        if pred_pyr is not None:
            vp, np_ = pred_pyr[l]
            packed_icp = pack_maps(vp, np_)
            icp_hw = vp.shape[1:]

        def fused_solve(T, rgb, icp):
            A, b = rgb.A, rgb.b
            if icp is not None:
                # intensity-gradient units dwarf metric ICP units by ~1e4;
                # trace-normalise each system so icp_weight (=10, reference
                # RGBDOdometry.cpp:316-321) sets the actual balance
                s_rgb = 1.0 / (jnp.trace(A) + 1e-12)
                s_icp = 1.0 / (jnp.trace(icp.A) + 1e-12)
                A = s_rgb * A + w2 * s_icp * icp.A
                b = s_rgb * b + w2 * s_icp * icp.b
            if use_prior:
                from kintinuous_tpu.ops.reduce import add_motion_prior

                A, b = add_motion_prior(A, b, T, T_prior, prior_weight)
            xi, ok = solve_gn(A, b)
            ok = ok & (rgb.count >= min_inliers)
            T_new = se3.exp_se3(xi) @ T
            return jnp.where(ok, T_new, T), rgb.count, rgb.residual

        # early iterations sample the previous-frame texture nearest-
        # neighbour (one row gather); only the final FINE iterations pay
        # the 4-gather bilinear — the sub-voxel accuracy only matters
        # once the warp has converged. Coarse iterations additionally
        # run on every other pixel ROW: the photometric cost is the
        # gather, and half the rows still over-determine a 6-DoF step
        # by ~6000x at 320x240 (the bilinear fine pass uses all rows).
        FINE = 1
        n_coarse = max(iters - FINE, 0)
        n_fine = iters - n_coarse
        vc_half = vc[:, ::2, :]
        int_half = curr_rgbd.intensity[l][::2, :]

        def run_phase(carry, n_iters, bilinear):
            if n_iters == 0:
                return carry
            T, count, sigma = carry
            vc_l = vc if bilinear else vc_half
            int_l = curr_rgbd.intensity[l] if bilinear else int_half

            if pred_pyr is None or reassoc_every <= 1:
                def body(_, c):
                    T, _, _ = c
                    rgb = rgb_system(
                        cam_l, T, vc_l,
                        int_l, tex_prev, prev_hw,
                        mg2, bilinear=bilinear,
                    )
                    icp = (
                        icp_step(cam_l, T, vc, nc, vp, np_, dist_thresh, sin_t)
                        if pred_pyr is not None else None
                    )
                    return fused_solve(T, rgb, icp)

                return jax.lax.fori_loop(0, n_iters, body, (T, count, sigma))

            n_groups = -(-n_iters // reassoc_every)

            def inner(_, c):
                T, _, _, d, n_t, in_img = c
                rgb = rgb_system(
                    cam_l, T, vc_l,
                    int_l, tex_prev, prev_hw,
                    mg2, bilinear=bilinear,
                )
                icp = icp_build_from_assoc(
                    T, vc, nc, d, n_t, in_img, dist_thresh, sin_t
                )
                T, cnt, res = fused_solve(T, rgb, icp)
                return T, cnt, res, d, n_t, in_img

            def outer(_, c):
                T, cnt, res = c
                d, n_t, in_img = icp_associate(cam_l, T, vc, packed_icp, icp_hw)
                T, cnt, res, *_ = jax.lax.fori_loop(
                    0, reassoc_every, inner, (T, cnt, res, d, n_t, in_img)
                )
                return T, cnt, res

            return jax.lax.fori_loop(0, n_groups, outer, (T, count, sigma))

        T, count, sigma = run_phase((T, count, sigma), n_coarse, False)
        T, count, sigma = run_phase((T, count, sigma), n_fine, True)
    # tracking-failure guard: reject > jump_reject_m translations
    # (RGBDOdometry.cpp:383-387); with a warm start active the rejected
    # frame falls back to the start (constant velocity) instead of a
    # full stop
    jump = jnp.linalg.norm(T[:3, 3])
    T = jnp.where(jump < jump_reject_m, T, T0)
    return T, count, sigma
