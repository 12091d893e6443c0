"""Warm-started raycast against the blocked volume.

The reference marches every ray from scratch each frame
(ray_caster.cu:298-348, ~300 steps at 512^3/6m); with TPU gathers at
~7-11ns/sample that is seconds per frame. This redesign exploits three
facts the CUDA kernel ignores:

  1. temporal coherence — the surface along a ray moves very little at
     30 Hz, so last frame's prediction (forward-warped by the new pose)
     plus the CURRENT frame's measured depth (which the model just
     absorbed during integration) give a warm start within a few voxels
     of the true crossing;
  2. a fixed +-window search around the warm start needs only ~6 nearest
     samples + Newton refinement per pixel instead of hundreds;
  3. gathers are latency-bound scalar ops, so halving their COUNT is the
     whole game: a per-frame "x-pair texture" packs bf16(tsdf[x]) and
     bf16(tsdf[x+1 mod R]) into one u32, making a full trilinear
     evaluation 4 gathers instead of 8 (the y/z corner pairs each fetch
     their x-pair in one shot). bf16 quantises TSDF to ~4e-3, i.e.
     ~0.1 mm of surface localisation at default trunc — far below the
     11.7 mm voxel.

Pixels with no warm start (fresh disocclusions with no measurement)
miss for one frame and recover the next. Prediction runs at HALF
resolution — the reference's own fastOdometry schedule skips the
full-res ICP level anyway (ICPOdometry.cpp:44-55).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics
from kintinuous_tpu.ops.blocked import BLOCK, BlockedVolume, flat_index
from kintinuous_tpu.ops.tsdf import unpack_cw


class FastRaycastResult(NamedTuple):
    vmap: jnp.ndarray  # (3,h,w) local metres, NaN = miss
    nmap: jnp.ndarray  # (3,h,w)
    color: jnp.ndarray  # (3,h,w)
    weight: jnp.ndarray  # (h,w)
    depth: jnp.ndarray  # (h,w) camera z (0 = miss)
    # fraction of valid rays answered by the measurement fallback rather
    # than the model (pallas region misses); 0.0 for the gather paths
    fallback_frac: jnp.ndarray | float = 0.0  # () f32


def build_pair_texture(tsdf_b: jnp.ndarray, xy_blocks: int | None = None) -> jnp.ndarray:
    """(B^3,4,128) f32 -> (B^3,512) u32 where entry v holds
    (bf16(t[x]) << 16) | bf16(t[x+1 mod R]) for the voxel at offset v
    and its +x neighbour (wrapping across block and volume boundaries).

    One elementwise pass + a block-row roll (~2 ms at 512^3), amortised
    over ~1M raycast taps that each save 4 scalar gathers.

    xy_blocks: pass the x/y block count when tsdf_b holds only a
    block-z SLAB of a larger volume (multi-chip fast path); the leading
    dim is then Bz*B*B with Bz != B."""
    B = xy_blocks if xy_blocks is not None else round(tsdf_b.shape[0] ** (1 / 3))
    Bz = tsdf_b.shape[0] // (B * B)
    flat = tsdf_b.reshape(Bz * B * B, 512)
    t = flat.reshape(Bz, B, B, BLOCK, BLOCK, BLOCK)  # [bz,by,bx,dz,dy,dx]
    left = t[..., 1:]  # value at dx+1 for dx in 0..6
    nxt = jnp.roll(t, -1, axis=2)[..., :1]  # dx=0 of block bx+1 (mod B)
    xplus = jnp.concatenate([left, nxt], axis=-1).reshape(flat.shape)
    hi = (jax.lax.bitcast_convert_type(flat.astype(jnp.bfloat16), jnp.uint16)
          .astype(jnp.uint32) << 16)
    lo = jax.lax.bitcast_convert_type(xplus.astype(jnp.bfloat16), jnp.uint16
                                      ).astype(jnp.uint32)
    return hi | lo


def _unpack_pair(p: jnp.ndarray):
    a = jax.lax.bitcast_convert_type(
        (p >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (p & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return a, b


def _nearest_pairs(pairs, R, wrap, pos_vox):
    """Nearest-voxel tsdf sample at fractional logical coords (...,3):
    ONE u32 gather per sample (lane 0 of the x-pair)."""
    gi = jnp.round(pos_vox).astype(jnp.int32)
    px = jnp.mod(gi[..., 0] + wrap[0], R)
    py = jnp.mod(gi[..., 1] + wrap[1], R)
    pz = jnp.mod(gi[..., 2] + wrap[2], R)
    p = pairs.reshape(-1)[flat_index(R, pz, py, px)]
    return _unpack_pair(p)[0]


def _trilinear_pairs(pairs, R, wrap, pos_vox):
    """Trilinear value + corner values via 4 x-pair gathers (vs 8 scalar).
    Returns (val, corners[...,8], frac) with the c000..c111 order of
    ops/tsdf.trilinear_gradient."""
    base = jnp.floor(pos_vox).astype(jnp.int32)
    frac = pos_vox - base
    flat = pairs.reshape(-1)
    px = jnp.mod(base[..., 0] + wrap[0], R)

    def ypair(cy, cz):
        py = jnp.mod(base[..., 1] + cy + wrap[1], R)
        pz = jnp.mod(base[..., 2] + cz + wrap[2], R)
        return _unpack_pair(flat[flat_index(R, pz, py, px)])

    c000, c100 = ypair(0, 0)
    c010, c110 = ypair(1, 0)
    c001, c101 = ypair(0, 1)
    c011, c111 = ypair(1, 1)
    corners = jnp.stack(
        [c000, c100, c010, c110, c001, c101, c011, c111], axis=-1
    )
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    val = (c00 * (1 - fy) + c10 * fy) * (1 - fz) + (
        c01 * (1 - fy) + c11 * fy
    ) * fz
    return val, corners, frac


def raycast_fast(
    vol: BlockedVolume,
    cam: CameraIntrinsics,  # HALF-resolution intrinsics
    T_cam_to_local: jnp.ndarray,
    prev_vmap: Optional[jnp.ndarray],  # (3,h,w) previous prediction, local
    measured_depth: jnp.ndarray,  # (h,w) current filtered depth (m)
    voxel_size: float,
    volume_size: float,
    trunc_dist: float,
    window: int = 6,  # search samples around the warm start
) -> FastRaycastResult:
    from kintinuous_tpu.ops.tsdf import trilinear_gradient

    h, w = cam.height, cam.width
    B = round(vol.tsdf.shape[0] ** (1 / 3))
    R = B * BLOCK
    step = 0.8 * trunc_dist
    pairs = build_pair_texture(vol.tsdf)

    Rot = T_cam_to_local[:3, :3]
    o = T_cam_to_local[:3, 3]
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    rx = (u - cam.cx) / cam.fx
    ry = (v - cam.cy) / cam.fy
    lam = jnp.sqrt(rx * rx + ry * ry + 1.0)  # ray length per unit z
    ones = jnp.ones((h, w), jnp.float32)
    d_cam = jnp.stack([rx * ones, ry * ones, ones], axis=0)
    d = jnp.einsum("ij,jhw->ihw", Rot, d_cam)
    dn = d / jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    cos_z = jnp.einsum("j,jhw->hw", Rot[:, 2], dn)

    # ---- warm start: forward-warp previous prediction ---------------
    INF = jnp.float32(1e9)
    zbuf = jnp.full((h * w,), INF)
    if prev_vmap is not None:
        Tinv = jnp.linalg.inv(T_cam_to_local)
        pv = jnp.einsum(
            "ij,jhw->ihw", Tinv[:3, :3], prev_vmap
        ) + Tinv[:3, 3][:, None, None]
        pz = pv[2].reshape(-1)
        okp = jnp.isfinite(pz) & (pz > 0.05)
        uu = jnp.round(
            jnp.where(okp, pv[0].reshape(-1) / jnp.maximum(pz, 1e-6), 0.0) * cam.fx
            + cam.cx
        ).astype(jnp.int32)
        vv = jnp.round(
            jnp.where(okp, pv[1].reshape(-1) / jnp.maximum(pz, 1e-6), 0.0) * cam.fy
            + cam.cy
        ).astype(jnp.int32)
        okp = okp & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        idx = jnp.where(okp, vv * w + uu, h * w)
        zbuf = zbuf.at[idx].min(jnp.where(okp, pz, INF), mode="drop")
    zbuf = zbuf.reshape(h, w)

    # 3x3 min-dilation to fill splat holes (twice)
    def dil(x):
        p = jnp.pad(x, 1, constant_values=INF)
        out = x
        for dy in range(3):
            for dx in range(3):
                out = jnp.minimum(out, p[dy : dy + h, dx : dx + w])
        return out

    filled = dil(dil(zbuf))
    warm_z = jnp.where(zbuf < INF, zbuf, filled)
    # fallback: the just-integrated measurement predicts the model surface
    warm_z = jnp.where(
        warm_z < INF, warm_z, jnp.where(measured_depth > 0, measured_depth, INF)
    )
    has_warm = warm_z < INF
    t_warm = jnp.where(has_warm, warm_z * lam, 0.0)

    # ---- windowed search: nearest samples around the warm start ------
    t0 = t_warm - (window // 2) * step
    inv_vsz = 1.0 / voxel_size

    def sample_t(t):
        pos = o[:, None, None] + t[None] * dn
        pos_vox = jnp.moveaxis(pos, 0, -1) * inv_vsz - 0.5
        return _nearest_pairs(pairs, R, vol.wrap, pos_vox)

    ts = [t0 + i * step for i in range(window)]
    vals = [sample_t(t) for t in ts]
    found = jnp.zeros((h, w), bool)
    t_hit = jnp.zeros((h, w), jnp.float32)
    for i in range(window - 1):
        a, b = vals[i], vals[i + 1]
        crossing = jnp.logical_not(found) & (a > 0) & (b < 0)
        denom = a - b
        frac_t = jnp.where(jnp.abs(denom) > 1e-12, a / denom, 0.5)
        t_hit = jnp.where(crossing, ts[i] + step * frac_t, t_hit)
        found = found | crossing
    found = found & has_warm

    # ---- trilinear Newton refine + analytic normal -------------------
    # the windowed search uses nearest samples (cheap) whose crossing
    # estimate carries ~half-voxel noise; two Newton steps on the
    # trilinear field (value + analytic gradient) restore model-accurate
    # localisation — without this the prediction degenerates to the
    # measurement and tracking drifts. The LAST iteration's gradient is
    # reused as the surface normal (the position moves <half a voxel
    # after it, and trilinear gradients are only C0 across cells anyway)
    # — saving a third 4-gather trilinear evaluation per pixel.
    dn_hw = jnp.moveaxis(dn, 0, -1)  # (h,w,3)
    t_ref = t_hit
    grad = jnp.zeros((h, w, 3), jnp.float32)
    for _ in range(2):
        pos_vox = (
            jnp.moveaxis(o[:, None, None] + t_ref[None] * dn, 0, -1) * inv_vsz
            - 0.5
        )
        val, corners, frac = _trilinear_pairs(pairs, R, vol.wrap, pos_vox)
        grad = trilinear_gradient(corners, frac)  # d val / d voxel-coord
        dval_dt = jnp.sum(grad * dn_hw, axis=-1) * inv_vsz
        newton = jnp.where(jnp.abs(dval_dt) > 1e-6, val / dval_dt, 0.0)
        t_ref = t_ref - jnp.clip(newton, -2.0 * trunc_dist, 2.0 * trunc_dist)
    t_hit = jnp.where(found, t_ref, t_hit)
    pos_hit = o[:, None, None] + t_hit[None] * dn
    pos_vox = jnp.moveaxis(pos_hit, 0, -1) * inv_vsz - 0.5
    gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
    normal = jnp.moveaxis(grad / jnp.maximum(gnorm, 1e-12), -1, 0)
    ok = found & (gnorm[..., 0] > 1e-9)

    # nearest colour/weight
    gi = jnp.round(pos_vox).astype(jnp.int32)
    px = jnp.mod(gi[..., 0] + vol.wrap[0], R)
    py = jnp.mod(gi[..., 1] + vol.wrap[1], R)
    pz = jnp.mod(gi[..., 2] + vol.wrap[2], R)
    cw = vol.cw.reshape(-1)[flat_index(R, pz, py, px)]
    wgt, cr, cg, cb = unpack_cw(cw)

    nan = jnp.float32(jnp.nan)
    return FastRaycastResult(
        vmap=jnp.where(ok[None], pos_hit, nan),
        nmap=jnp.where(ok[None], normal, nan),
        color=jnp.where(ok[None], jnp.stack([cr, cg, cb], 0), 0.0),
        weight=jnp.where(ok, wgt, 0.0),
        depth=jnp.where(ok, t_hit * cos_z, 0.0),
    )
