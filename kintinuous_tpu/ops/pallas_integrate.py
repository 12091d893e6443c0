"""Pallas TPU TSDF integration: gather-free band-block fusion.

The XLA fast path (ops/tsdf_fast.integrate_fast) is bound by per-voxel
scalar HBM gathers of the depth image: band_cap x 512 voxels x ~7ns
~= 25 ms/frame at 512^3. This kernel removes those gathers the same way
ops/pallas_raycast removes the raycast's: each band block DMAs a small
image patch into VMEM and evaluates every nearest-pixel sample for its
512 voxels as one-hot MXU contractions.

Per band block (one grid step, dynamic grid = actual band count):
  - rows: the block's 512-voxel tsdf f32 and cw u32 rows arrive via
    BlockSpec index maps driven by the scalar-prefetched band ids and
    are written back in place (input_output_aliases) — zero XLA
    gather/scatter of volume rows;
  - a (6, PH, PW) bf16 patch of [ray_hi | ray_lo | r | g | b | q_w]
    is DMA'd (double-buffered across grid steps) around the block's
    image footprint: the per-pixel ray length is split into two bf16
    limbs (one-hot matmuls reproduce bf16 values exactly, so hi+lo
    recovers f32 ray to ~6e-5 relative); colour channels and the
    quantized view-angle colour weight q_w are integers <= 255, all
    bf16-exact and bit-identical to the XLA path's packing;
  - for each of 4 sublane chunks of 128 voxels: a one-hot (PW, 128)
    matmul collapses patch columns on the MXU, a sublane mask collapses
    rows on the VPU — nearest-pixel sampling with zero gathers;
  - the fusion update (running average with weight cap, discontinuity-
    gated colour mix) is the same formula as the dense path
    (reference src/frontend/cuda/tsdf_volume.cu:540-639 semantics).

Blocks whose image footprint cannot fit the patch window (very close
to the camera) are compacted into a capped fallback list and updated
by the exact XLA gather path. The result matches integrate_fast up to
the bf16 ray split (colour exactly).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kintinuous_tpu.config import CameraIntrinsics
from kintinuous_tpu.ops.tsdf import scale_depth
from kintinuous_tpu.ops.tsdf_fast import (
    BAND,
    BLOCK,
    FREE,
    build_depth_tables,
    classify_blocks,
)

PH_MAX, PW_MAX = 112, 256  # patch caps; y0 mult 16, x0 mult 128


def _patch_dims(H: int, W: int):
    """Static padded-image + patch dims for a camera size."""
    Hp = -(-H // 16) * 16
    Wp = -(-W // 128) * 128
    PH = min(PH_MAX, Hp)
    PW = min(PW_MAX, Wp)
    return Hp, Wp, PH, PW


def _integrate_kernel(
    # scalar prefetch
    ids_ref,  # (cap,) i32 band block ids
    y0_ref,  # (cap,) i32 patch top row (mult 16)
    x0_ref,  # (cap,) i32 patch left col (mult 128)
    params_ref,  # (16,) f32: Rcl rows (9), tcl (3), wrap (3), z_block_off
    # inputs
    img_ref,  # (6, Hp, Wp) bf16 [ray_hi|ray_lo|r|g|b|q_w] in HBM
    t_in,  # (1, 4, 128) f32 tsdf row block
    c_in,  # (1, 4, 128) u32 cw row block
    # outputs (aliased)
    t_out,
    c_out,
    # scratch
    patch,  # (2, 6, PH, PW) bf16 double-buffered
    sem,  # (2,) DMA
    *,
    B: int,
    R: int,
    W: int,
    H: int,
    PH: int,
    PW: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    voxel_size: float,
    trunc_dist: float,
    max_weight: float,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def start(j, sl):
        y0 = pl.multiple_of(y0_ref[j], 16)
        x0 = pl.multiple_of(x0_ref[j], 128)
        pltpu.make_async_copy(
            img_ref.at[:, pl.ds(y0, PH), pl.ds(x0, PW)],
            patch.at[sl], sem.at[sl],
        ).start()

    def wait(j, sl):
        y0 = pl.multiple_of(y0_ref[j], 16)
        x0 = pl.multiple_of(x0_ref[j], 128)
        pltpu.make_async_copy(
            img_ref.at[:, pl.ds(y0, PH), pl.ds(x0, PW)],
            patch.at[sl], sem.at[sl],
        ).wait()

    @pl.when(i == 0)
    def _():
        start(i, slot)

    @pl.when(i + 1 < n)
    def _():
        start(i + 1, nxt)

    bid = ids_ref[i]
    by = (bid // B) % B
    bx = bid % B
    y0 = y0_ref[i]
    x0 = x0_ref[i]

    r00, r01, r02 = params_ref[0], params_ref[1], params_ref[2]
    r10, r11, r12 = params_ref[3], params_ref[4], params_ref[5]
    r20, r21, r22 = params_ref[6], params_ref[7], params_ref[8]
    t0p, t1p, t2p = params_ref[9], params_ref[10], params_ref[11]
    # wrap offsets (multiples of 8, exact in f32) + slab block-z origin
    wrap_x = params_ref[12].astype(jnp.int32)
    wrap_y = params_ref[13].astype(jnp.int32)
    wrap_z = params_ref[14].astype(jnp.int32)
    bz = bid // (B * B) + params_ref[15].astype(jnp.int32)

    t_row = t_in[0]  # (4,128) f32
    c_row = c_in[0]  # (4,128) u32

    iota_pw = jax.lax.broadcasted_iota(jnp.int32, (PW, 128), 0)
    iota_ph = jax.lax.broadcasted_iota(jnp.int32, (PH, 128), 0)

    # --- per-voxel projection, full (4,128) shapes -------------------
    off = (
        jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    )
    # physical -> logical voxel coords (mod-wrap, integrate_fast:346-348
    # semantics; wrap=0 in the single-chip fast path, nonzero under the
    # multi-chip slab sharding which keeps the reference's cyclical
    # addressing, tsdf_volume.cu:612-615)
    pxi = bx * BLOCK + (off & 7)
    pyi = by * BLOCK + ((off >> 3) & 7)
    pzi = bz * BLOCK + (off >> 6)
    px = jax.lax.rem(pxi - wrap_x + R, R).astype(jnp.float32) + 0.5
    py = jax.lax.rem(pyi - wrap_y + R, R).astype(jnp.float32) + 0.5
    pz = jax.lax.rem(pzi - wrap_z + R, R).astype(jnp.float32) + 0.5
    wx = px * voxel_size
    wy = py * voxel_size
    wz = pz * voxel_size
    x = r00 * wx + r01 * wy + r02 * wz + t0p
    y = r10 * wx + r11 * wy + r12 * wz + t1p
    z = r20 * wx + r21 * wy + r22 * wz + t2p
    zs = jnp.maximum(z, 1e-6)
    ui = jnp.round(x / zs * fx + cx).astype(jnp.int32)
    vi = jnp.round(y / zs * fy + cy).astype(jnp.int32)
    in_img = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    pu = jnp.clip(ui - x0, 0, PW - 1)  # (4,128)
    pv = jnp.clip(vi - y0, 0, PH - 1)
    vox_ray = jnp.sqrt(x * x + y * y + z * z)

    wait(i, slot)
    P = patch[slot].reshape(6 * PH, PW)

    # --- sampling: one one-hot MXU collapse + masked reduces per chunk
    rays, crs, cgs, cbs, cqs = [], [], [], [], []
    for s in range(4):
        Wc = jnp.where(iota_pw == pu[s : s + 1], 1.0, 0.0).astype(
            jnp.bfloat16
        )
        D = jax.lax.dot_general(
            P, Wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
        )  # (6PH, 128)
        # one shared (PH,128) row mask; the ray limbs share pv, so the
        # hi+lo sum falls out of a single masked reduction of D0+D1
        M = jnp.where(iota_ph == pv[s : s + 1], 1.0, 0.0)
        rays.append(
            jnp.sum((D[0:PH] + D[PH : 2 * PH]) * M, 0, keepdims=True)
        )
        crs.append(jnp.sum(D[2 * PH : 3 * PH] * M, 0, keepdims=True))
        cgs.append(jnp.sum(D[3 * PH : 4 * PH] * M, 0, keepdims=True))
        cbs.append(jnp.sum(D[4 * PH : 5 * PH] * M, 0, keepdims=True))
        cqs.append(jnp.sum(D[5 * PH : 6 * PH] * M, 0, keepdims=True))
    samp_ray = jnp.concatenate(rays, 0)  # (4,128)
    r_new = jnp.concatenate(crs, 0)
    g_new = jnp.concatenate(cgs, 0)
    b_new = jnp.concatenate(cbs, 0)
    samp_q = jnp.concatenate(cqs, 0)
    w_c = samp_q / 127.5

    # --- fusion update (dense-path formulas), full (4,128) shapes ----
    sdf = samp_ray - vox_ray
    valid = in_img & (samp_ray > 0)
    fuse = valid & (sdf >= -trunc_dist)
    tsdf_new = jnp.minimum(1.0, sdf / trunc_dist)

    w_old = (c_row >> 24).astype(jnp.int32).astype(jnp.float32)
    r_old = ((c_row >> 16) & 0xFF).astype(jnp.int32).astype(jnp.float32)
    g_old = ((c_row >> 8) & 0xFF).astype(jnp.int32).astype(jnp.float32)
    b_old = (c_row & 0xFF).astype(jnp.int32).astype(jnp.float32)

    w_upd = jnp.where(fuse, jnp.minimum(w_old + 1.0, max_weight), w_old)
    t_upd = jnp.where(
        fuse,
        (t_row * w_old + tsdf_new) / jnp.maximum(w_old + 1.0, 1.0),
        t_row,
    )
    black = (r_old + g_old + b_old) == 0
    cfuse = fuse & ((samp_q > 0) | black)
    inv_w = 1.0 / jnp.maximum(w_old + w_c, 1e-6)

    def mix(old, new):
        return jnp.where(cfuse, (old * w_old + w_c * new) * inv_w, old)

    c_upd = (
        (jnp.clip(w_upd, 0, 255).astype(jnp.int32).astype(jnp.uint32) << 24)
        | (jnp.clip(mix(r_old, r_new), 0, 255)
           .astype(jnp.int32).astype(jnp.uint32) << 16)
        | (jnp.clip(mix(g_old, g_new), 0, 255)
           .astype(jnp.int32).astype(jnp.uint32) << 8)
        | jnp.clip(mix(b_old, b_new), 0, 255)
          .astype(jnp.int32).astype(jnp.uint32)
    )
    t_out[0] = t_upd
    c_out[0] = c_upd


def _carve_kernel(ids_ref, t_in, c_in, t_out, c_out, *, max_weight: float):
    """Uniform free-space update on one block row: tsdf -> 1 with
    weight+1 (no image data needed — the classifier proved the whole
    block lies in observed free space)."""
    t_row = t_in[0]
    c_row = c_in[0]
    w_old = (c_row >> 24).astype(jnp.int32).astype(jnp.float32)
    w_new = jnp.minimum(w_old + 1.0, max_weight)
    t_new = (t_row * w_old + 1.0) / jnp.maximum(w_old + 1.0, 1.0)
    c_new = (
        (w_new.astype(jnp.int32).astype(jnp.uint32) << 24)
        | (c_row & jnp.uint32(0x00FFFFFF))
    )
    t_out[0] = t_new
    c_out[0] = c_new


def _carve_pallas(t3, c3, ids, n, max_weight, interpret=False):
    n_rows = t3.shape[0]
    row_spec = pl.BlockSpec(
        (1, 4, 128), lambda i, ids: (ids[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[row_spec, row_spec],
        out_specs=[row_spec, row_spec],
    )
    return pl.pallas_call(
        functools.partial(_carve_kernel, max_weight=float(max_weight)),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, 4, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 4, 128), jnp.uint32),
        ),
        grid_spec=grid_spec,
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(ids, t3, c3)


class PallasBandLists(NamedTuple):
    t0_ids: jnp.ndarray  # (band_cap,) i32 — small (48-row) patch fits
    t0_y0: jnp.ndarray
    t0_x0: jnp.ndarray
    n_t0: jnp.ndarray
    pallas_ids: jnp.ndarray  # (t1_cap,) i32 — tier-1 patch fits
    pallas_y0: jnp.ndarray
    pallas_x0: jnp.ndarray
    n_pallas: jnp.ndarray  # () i32
    t2_ids: jnp.ndarray  # (t2_cap,) i32 — tier-2 (big) patch fits
    t2_y0: jnp.ndarray
    t2_x0: jnp.ndarray
    n_t2: jnp.ndarray
    fb_ids: jnp.ndarray  # (fb_cap,) i32 — no patch fits (z < ~0.4 m)
    n_fb: jnp.ndarray
    free_ids: jnp.ndarray
    n_free: jnp.ndarray


def _plan_blocks(
    vol,
    cam: CameraIntrinsics,
    tables,
    T_cam_to_local: jnp.ndarray,
    voxel_size: float,
    trunc_dist: float,
    R: int,
    band_cap: int,
    t1_cap: int,
    t2_cap: int,
    fb_cap: int,
    free_cap: int,
    Hp: int,
    PH0: int,
    PH: int,
    PW: int,
    PH2: int,
    PW2: int,
    Bz: int | None = None,
    z_block_offset=0,
) -> PallasBandLists:
    """Classify blocks, compute per-block patch corners + fits, compact
    pallas/fallback/free lists in one scatter. When vol is a physical
    block-z slab of a larger volume (multi-chip fast path), Bz is the
    slab's block count and z_block_offset its first block-z index."""
    B = R // BLOCK
    if Bz is None:
        Bz = B
    H, W = cam.height, cam.width
    Wp = -(-W // 128) * 128
    # the packed scatter below encodes y0 in 5 bits (y0>>4) and x0 in
    # 3 bits (x0>>7); wider/taller cameras would silently wrap the
    # fields and decode wrong patch origins (ADVICE r4)
    assert Hp <= 512 and Wp <= 1024, (
        "packed plan encoding requires Hp<=512, Wp<=1024 "
        f"(got Hp={Hp}, Wp={Wp})"
    )
    assert Bz * B * B < (1 << 23), "packed plan id field overflow"
    cls = classify_blocks(
        vol, cam, tables, T_cam_to_local, voxel_size, trunc_dist,
        resolution=R, z_blocks=Bz, z_block_offset=z_block_offset,
    )

    # block-centre projection + conservative pixel radius (same math as
    # classify_blocks)
    r_half = BLOCK * voxel_size * math.sqrt(3.0) / 2.0
    Tinv = jnp.linalg.inv(T_cam_to_local)
    Rcl, tcl = Tinv[:3, :3], Tinv[:3, 3]
    pb = jnp.arange(B, dtype=jnp.int32)
    pbz = jnp.arange(Bz, dtype=jnp.int32) + z_block_offset
    gx = jnp.mod(pb * BLOCK - vol.wrap[0], R).astype(jnp.float32) + BLOCK / 2.0
    gy = jnp.mod(pb * BLOCK - vol.wrap[1], R).astype(jnp.float32) + BLOCK / 2.0
    gz = jnp.mod(pbz * BLOCK - vol.wrap[2], R).astype(jnp.float32) + BLOCK / 2.0
    wx, wy, wz = gx * voxel_size, gy * voxel_size, gz * voxel_size

    def bc(vx, vy, vz, t):
        return vx[None, None, :] + vy[None, :, None] + vz[:, None, None] + t

    x = bc(Rcl[0, 0] * wx, Rcl[0, 1] * wy, Rcl[0, 2] * wz, tcl[0])
    y = bc(Rcl[1, 0] * wx, Rcl[1, 1] * wy, Rcl[1, 2] * wz, tcl[1])
    z = bc(Rcl[2, 0] * wx, Rcl[2, 1] * wy, Rcl[2, 2] * wz, tcl[2])

    # exact image-space bbox from the 8 projected block corners (the
    # projection of a convex cube bounds all its voxel projections);
    # +1 px margin for nearest-pixel rounding
    h = BLOCK / 2.0 * voxel_size
    a0 = Rcl[:, 0] * h
    a1 = Rcl[:, 1] * h
    a2 = Rcl[:, 2] * h
    BIGF = jnp.float32(1e9)
    umin = jnp.full_like(x, BIGF)
    umax = jnp.full_like(x, -BIGF)
    vmin = jnp.full_like(x, BIGF)
    vmax = jnp.full_like(x, -BIGF)
    zmin = jnp.full_like(x, BIGF)
    for s0 in (-1.0, 1.0):
        for s1 in (-1.0, 1.0):
            for s2 in (-1.0, 1.0):
                xc = x + s0 * a0[0] + s1 * a1[0] + s2 * a2[0]
                yc = y + s0 * a0[1] + s1 * a1[1] + s2 * a2[1]
                zc = z + s0 * a0[2] + s1 * a1[2] + s2 * a2[2]
                zs = jnp.maximum(zc, 1e-6)
                uc = xc / zs * cam.fx + cam.cx
                vc = yc / zs * cam.fy + cam.cy
                umin = jnp.minimum(umin, uc)
                umax = jnp.maximum(umax, uc)
                vmin = jnp.minimum(vmin, vc)
                vmax = jnp.maximum(vmax, vc)
                zmin = jnp.minimum(zmin, zc)
    stable = zmin > 0.1  # all corners safely in front of the camera

    ulo = jnp.clip(umin - 1.0, 0.0, W - 1.0)
    uhi = jnp.clip(umax + 1.0, 0.0, W - 1.0)
    vlo = jnp.clip(vmin - 1.0, 0.0, H - 1.0)
    vhi = jnp.clip(vmax + 1.0, 0.0, H - 1.0)

    def corner_fits(ph, pw):
        yy = jnp.clip((vlo.astype(jnp.int32) // 16) * 16, 0, Hp - ph)
        xx = jnp.clip((ulo.astype(jnp.int32) // 128) * 128, 0, Wp - pw)
        ok = (
            stable
            & (vhi <= (yy + (ph - 1)).astype(jnp.float32))
            & (uhi <= (xx + (pw - 1)).astype(jnp.float32))
        )
        return yy, xx, ok

    y0z, x0z, fits0 = corner_fits(PH0, PW)
    y0a, x0a, fits1 = corner_fits(PH, PW)
    y0b, x0b, fits2 = corner_fits(PH2, PW2)

    cf = cls.reshape(-1)
    band = cf == BAND
    t0_mask = band & fits0.reshape(-1)
    t1_mask = band & jnp.logical_not(fits0.reshape(-1)) & fits1.reshape(-1)
    rest = band & jnp.logical_not(fits0.reshape(-1)) & jnp.logical_not(
        fits1.reshape(-1)
    )
    t2_mask = rest & fits2.reshape(-1)
    fb_mask = rest & jnp.logical_not(fits2.reshape(-1))
    fr_mask = cf == FREE
    use2 = t2_mask.reshape(cls.shape)
    use0 = t0_mask.reshape(cls.shape)
    y0f = jnp.where(use0, y0z, jnp.where(use2, y0b, y0a)).reshape(-1)
    x0f = jnp.where(use0, x0z, jnp.where(use2, x0b, x0a)).reshape(-1)
    all_ids = jnp.arange(Bz * B * B, dtype=jnp.int32)

    i0 = jnp.cumsum(t0_mask.astype(jnp.int32)) - 1
    i1 = jnp.cumsum(t1_mask.astype(jnp.int32)) - 1
    i2 = jnp.cumsum(t2_mask.astype(jnp.int32)) - 1
    i3 = jnp.cumsum(fb_mask.astype(jnp.int32)) - 1
    i4 = jnp.cumsum(fr_mask.astype(jnp.int32)) - 1
    o1 = band_cap
    o2 = o1 + t1_cap
    o3 = o2 + t2_cap
    o4 = o3 + fb_cap
    total = o4 + free_cap
    dest = jnp.where(
        t0_mask & (i0 < band_cap), i0,
        jnp.where(
            t1_mask & (i1 < t1_cap), o1 + i1,
            jnp.where(
                t2_mask & (i2 < t2_cap), o2 + i2,
                jnp.where(
                    fb_mask & (i3 < fb_cap), o3 + i3,
                    jnp.where(fr_mask & (i4 < free_cap), o4 + i4, total),
                ),
            ),
        ),
    )
    # ONE packed scatter instead of three: a 262144-update scatter costs
    # ~1.2 ms at 512^3, so dropping two of them saves ~2.4 ms/frame.
    # id needs 18 bits; y0 is a multiple of 16 < 512 (5 bits); x0 a
    # multiple of 128 < 1024 (3 bits) -> id<<8 | (y0>>4)<<3 | x0>>7.
    packed_f = (all_ids << 8) | ((y0f >> 4) << 3) | (x0f >> 7)
    packed = jnp.zeros((total,), jnp.int32).at[dest].set(packed_f, mode="drop")
    ids = packed >> 8
    y0s = ((packed >> 3) & 31) << 4
    x0s = (packed & 7) << 7
    return PallasBandLists(
        t0_ids=ids[:o1],
        t0_y0=y0s[:o1],
        t0_x0=x0s[:o1],
        n_t0=jnp.minimum(t0_mask.sum(), band_cap),
        pallas_ids=ids[o1:o2],
        pallas_y0=y0s[o1:o2],
        pallas_x0=x0s[o1:o2],
        n_pallas=jnp.minimum(t1_mask.sum(), t1_cap),
        t2_ids=ids[o2:o3],
        t2_y0=y0s[o2:o3],
        t2_x0=x0s[o2:o3],
        n_t2=jnp.minimum(t2_mask.sum(), t2_cap),
        fb_ids=ids[o3:o4],
        n_fb=jnp.minimum(fb_mask.sum(), fb_cap),
        free_ids=ids[o4:],
        n_free=jnp.minimum(fr_mask.sum(), free_cap),
    )


def _build_images(cam, depth_m, rgb, color_w, Hp, Wp):
    """-> (6,Hp,Wp) bf16 [ray_hi | ray_lo | r | g | b | q_w] where q_w
    is the quantized colour fusion weight (integers <= 255, bf16-exact
    and bit-identical to the XLA path's aux byte)."""
    from kintinuous_tpu.ops.maps import quantize_color_w

    H, W = depth_m.shape
    ray = scale_depth(cam, depth_m)  # (H,W) f32, 0 = invalid
    hi = ray.astype(jnp.bfloat16).astype(jnp.float32)
    lo = ray - hi
    r = jnp.clip(rgb[..., 0].astype(jnp.float32), 0, 255)
    g = jnp.clip(rgb[..., 1].astype(jnp.float32), 0, 255)
    b = jnp.clip(rgb[..., 2].astype(jnp.float32), 0, 255)
    if color_w.dtype == jnp.bool_:
        color_w = jnp.where(color_w, 0.0, 2.0)
    q = quantize_color_w(color_w).astype(jnp.float32)
    img = jnp.stack([hi, lo, r, g, b, q], axis=0)
    img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W)))
    img = img.astype(jnp.bfloat16)
    (img,) = jax.lax.optimization_barrier((img,))
    return img


def _xla_band_update(
    vol, cam, tables, T_cam_to_local, voxel_size, trunc_dist, max_weight,
    ids, n, cap, R, z_block_offset=0,
):
    """Exact per-voxel gather path for fallback blocks (same math as
    tsdf_fast.integrate_fast's band section)."""
    B = R // BLOCK
    H, W = cam.height, cam.width
    tsdf, cw = vol.tsdf, vol.cw
    n_rows = tsdf.shape[0]
    valid_block = (jnp.arange(cap) < n)[:, None]

    t8 = tsdf[ids].reshape(cap, 512)
    c8 = cw[ids].reshape(cap, 512)
    bz = ids // (B * B) + z_block_offset
    by = (ids // B) % B
    bx = ids % B
    off = jnp.arange(512, dtype=jnp.int32)[None, :]
    px = (bx[:, None] * BLOCK) + (off & 7)
    py = (by[:, None] * BLOCK) + ((off >> 3) & 7)
    pz = (bz[:, None] * BLOCK) + (off >> 6)
    gx = jnp.mod(px - vol.wrap[0], R).astype(jnp.float32) + 0.5
    gy = jnp.mod(py - vol.wrap[1], R).astype(jnp.float32) + 0.5
    gz = jnp.mod(pz - vol.wrap[2], R).astype(jnp.float32) + 0.5
    wx, wy, wz = gx * voxel_size, gy * voxel_size, gz * voxel_size

    Tinv = jnp.linalg.inv(T_cam_to_local)
    Rcl, tcl = Tinv[:3, :3], Tinv[:3, 3]
    x = Rcl[0, 0] * wx + Rcl[0, 1] * wy + Rcl[0, 2] * wz + tcl[0]
    y = Rcl[1, 0] * wx + Rcl[1, 1] * wy + Rcl[1, 2] * wz + tcl[1]
    z = Rcl[2, 0] * wx + Rcl[2, 1] * wy + Rcl[2, 2] * wz + tcl[2]
    zs = jnp.maximum(z, 1e-6)
    ui = jnp.round(x / zs * cam.fx + cam.cx).astype(jnp.int32)
    vi = jnp.round(y / zs * cam.fy + cam.cy).astype(jnp.int32)
    in_img = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    pidx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)

    irow = tables.img_rows[pidx.reshape(-1)].reshape(*pidx.shape, 2)
    samp_ray = irow[..., 0]
    samp_aux = jax.lax.bitcast_convert_type(irow[..., 1], jnp.uint32)
    samp_q = (samp_aux >> 24).astype(jnp.float32)
    w_c = samp_q / 127.5
    r_new = ((samp_aux >> 16) & 0xFF).astype(jnp.float32)
    g_new = ((samp_aux >> 8) & 0xFF).astype(jnp.float32)
    b_new = (samp_aux & 0xFF).astype(jnp.float32)

    valid = in_img & (samp_ray > 0) & valid_block
    vox_ray = jnp.sqrt(x * x + y * y + z * z)
    sdf = samp_ray - vox_ray
    fuse = valid & (sdf >= -trunc_dist)
    tsdf_new = jnp.minimum(1.0, sdf / trunc_dist)

    w_old = (c8 >> 24).astype(jnp.float32)
    r_old = ((c8 >> 16) & 0xFF).astype(jnp.float32)
    g_old = ((c8 >> 8) & 0xFF).astype(jnp.float32)
    b_old = (c8 & 0xFF).astype(jnp.float32)
    w_upd = jnp.where(fuse, jnp.minimum(w_old + 1.0, max_weight), w_old)
    t_upd = jnp.where(
        fuse, (t8 * w_old + tsdf_new) / jnp.maximum(w_old + 1.0, 1.0), t8
    )
    black = (r_old + g_old + b_old) == 0
    cfuse = fuse & ((samp_q > 0) | black)
    inv_w = 1.0 / jnp.maximum(w_old + w_c, 1e-6)

    def mix(old, new):
        return jnp.where(cfuse, (old * w_old + w_c * new) * inv_w, old)

    c_upd = (
        (jnp.clip(w_upd, 0, 255).astype(jnp.uint32) << 24)
        | (jnp.clip(mix(r_old, r_new), 0, 255).astype(jnp.uint32) << 16)
        | (jnp.clip(mix(g_old, g_new), 0, 255).astype(jnp.uint32) << 8)
        | jnp.clip(mix(b_old, b_new), 0, 255).astype(jnp.uint32)
    )
    safe_rows = jnp.where(valid_block[:, 0], ids, n_rows)
    tsdf = tsdf.at[safe_rows].set(t_upd.reshape(cap, 4, 128), mode="drop")
    cw = cw.at[safe_rows].set(c_upd.reshape(cap, 4, 128), mode="drop")
    return vol._replace(tsdf=tsdf, cw=cw)


def integrate_pallas(
    vol,  # BlockedVolume (full volume, or a physical block-z slab)
    cam: CameraIntrinsics,
    depth_m: jnp.ndarray,
    rgb: jnp.ndarray,
    color_w: jnp.ndarray,  # (H,W) colour weight [0,2] or legacy bool mask
    T_cam_to_local: jnp.ndarray,
    voxel_size: float,
    trunc_dist: float,
    max_weight: float = 128.0,
    band_cap: int = 8192,
    t1_cap: int = 4096,
    t2_cap: int = 1024,
    fb_cap: int = 128,
    free_cap: int = 12288,
    interpret: bool = False,
    resolution: int | None = None,
    z_block_offset=0,
    logical=None,
    dirty_all=None,
):
    """Wrap offsets must be multiples of 8 (fast-path invariant; the
    single-chip tracker keeps wrap 0 by physically rolling the volume).
    resolution/z_block_offset: as integrate_fast — pass the FULL volume
    resolution and this slab's first block-z index when vol holds only a
    block-z slab (multi-chip fast path, parallel/fast_sharded.py).

    logical: optional (R,R,R) bf16 dense logical mirror of the volume
    (DONATED). When given, every (bz,by)-row-pair this frame's plan
    touches (band tiers + fb + carved free blocks) is refreshed in
    place after fusion and (vol, logical) is returned — the raycast
    then skips its full per-frame deblock (pallas_raycast.
    update_logical_pairs). dirty_all: traced bool — force a full
    rebuild (shift frames, where the blocked volume was rolled)."""
    if resolution is None:
        B = round(vol.tsdf.shape[0] ** (1 / 3))
        R = B * BLOCK
    else:
        R = resolution
        B = R // BLOCK
    Bz = vol.tsdf.shape[0] // (B * B)
    H, W = depth_m.shape
    Hp, Wp, PH, PW = _patch_dims(H, W)
    PH0 = min(48, Hp)
    PH2 = min(224, Hp)
    PW2 = min(512, Wp)
    tables = build_depth_tables(cam, depth_m, rgb, color_w)
    plan = _plan_blocks(
        vol, cam, tables, T_cam_to_local, voxel_size, trunc_dist, R,
        band_cap, t1_cap, t2_cap, fb_cap, free_cap,
        Hp, PH0, PH, PW, PH2, PW2,
        Bz=Bz, z_block_offset=z_block_offset,
    )
    img = _build_images(cam, depth_m, rgb, color_w, Hp, Wp)

    Tinv = jnp.linalg.inv(T_cam_to_local)
    params = jnp.concatenate(
        [
            Tinv[:3, :3].reshape(-1),
            Tinv[:3, 3],
            jnp.asarray(vol.wrap, jnp.float32).reshape(3),
            jnp.asarray(z_block_offset, jnp.float32).reshape(1),
        ]
    )

    n_rows = vol.tsdf.shape[0]
    t3 = vol.tsdf  # (B^3, 4, 128) natively
    c3 = vol.cw

    def run_tier(t3, c3, n, ids, y0s, x0s, ph, pw):
        kern = functools.partial(
            _integrate_kernel,
            B=B, R=R, W=W, H=H, PH=ph, PW=pw,
            fx=float(cam.fx), fy=float(cam.fy),
            cx=float(cam.cx), cy=float(cam.cy),
            voxel_size=float(voxel_size),
            trunc_dist=float(trunc_dist),
            max_weight=float(max_weight),
        )
        row_spec = pl.BlockSpec(
            (1, 4, 128), lambda i, ids, y0, x0, pr: (ids[i], 0, 0),
            memory_space=pltpu.VMEM,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                row_spec,
                row_spec,
            ],
            out_specs=[row_spec, row_spec],
            scratch_shapes=[
                pltpu.VMEM((2, 6, ph, pw), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((n_rows, 4, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_rows, 4, 128), jnp.uint32),
            ),
            grid_spec=grid_spec,
            input_output_aliases={5: 0, 6: 1},
            interpret=interpret,
        )(ids, y0s, x0s, params, img, t3, c3)

    t3, c3 = run_tier(
        t3, c3, plan.n_t0, plan.t0_ids, plan.t0_y0, plan.t0_x0, PH0, PW,
    )
    t3, c3 = run_tier(
        t3, c3, plan.n_pallas, plan.pallas_ids, plan.pallas_y0,
        plan.pallas_x0, PH, PW,
    )
    t3, c3 = run_tier(
        t3, c3, plan.n_t2, plan.t2_ids, plan.t2_y0, plan.t2_x0, PH2, PW2,
    )
    vol = vol._replace(tsdf=t3, cw=c3)

    # fallback blocks: exact XLA gather path
    vol = _xla_band_update(
        vol, cam, tables, T_cam_to_local, voxel_size, trunc_dist,
        max_weight, plan.fb_ids, plan.n_fb, fb_cap, R,
        z_block_offset=z_block_offset,
    )

    # FREE carve: uniform update on compacted rows, in place
    t3, c3 = _carve_pallas(
        vol.tsdf, vol.cw, plan.free_ids, plan.n_free, max_weight,
        interpret=interpret,
    )
    vol = vol._replace(tsdf=t3, cw=c3)
    if logical is None:
        return vol

    assert Bz == B, "incremental logical update is single-chip only"
    from kintinuous_tpu.ops.pallas_raycast import update_logical_pairs

    nb = 2 * B
    n_pairs = (B * B) // 2
    bm = jnp.zeros((n_pairs,), jnp.bool_)
    for ids, n in (
        (plan.t0_ids, plan.n_t0), (plan.pallas_ids, plan.n_pallas),
        (plan.t2_ids, plan.n_t2), (plan.fb_ids, plan.n_fb),
        (plan.free_ids, plan.n_free),
    ):
        p = jnp.where(
            jnp.arange(ids.shape[0], dtype=jnp.int32) < n, ids // nb, n_pairs
        )
        bm = bm.at[p].set(True, mode="drop")
    if dirty_all is not None:
        bm = bm | dirty_all
    cnt = bm.sum().astype(jnp.int32)
    dest = jnp.where(
        bm, jnp.cumsum(bm.astype(jnp.int32)) - 1, n_pairs
    )
    pairs = jnp.zeros((n_pairs,), jnp.int32).at[dest].set(
        jnp.arange(n_pairs, dtype=jnp.int32), mode="drop"
    )
    logical = update_logical_pairs(
        vol.tsdf, logical, pairs, cnt, R, interpret=interpret
    )
    return vol, logical
