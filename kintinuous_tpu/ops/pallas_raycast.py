"""Pallas TPU raycast: gather-free tile raycasting on the MXU.

The XLA fast path (ops/raycast_fast.py) is bound by scalar HBM gathers
(~15 taps/pixel at ~5-7ns each). This kernel removes gathers entirely:

  - the frame's TSDF is laid out as a dense LOGICAL (R,R,R) bf16 array
    (blocked->dense + un-wrap roll, one bandwidth pass per frame);
  - pixels are processed in 16x16 tiles; each tile DMAs one
    (RZ,RY,RX) voxel region around its warm-start depth segment into
    VMEM (tile rays are coherent: the region covers every tap of every
    pixel in the tile for any camera orientation);
  - every trilinear tap for all 256 pixels of a tile is evaluated as a
    separable two-hot contraction: one (RZ*RY, RX) @ (RX, 256) MXU
    matmul collapses x, tiny VPU contractions collapse y and z. The
    same machinery yields analytic gradients (derivative weights) for
    Newton refinement and surface normals.

Cost model vs measurement (512^3, 320x240, reconciled r5 with
tools/profile_raycast.py — the r4 header's "~2 ms" modelled ONLY the
pass-1 MXU contractions + tile DMA at peak): measured 12.2 ms total =
  4.6 ms  blocked->dense bf16 deblock (768 MB moved at ~170 GB/s —
          the per-dx one-hot matmuls have <=64-wide contractions, so
          the pass is dispatch/efficiency-bound, not BW-bound; ~3 ms
          of headroom remains here)
  3.9 ms  window march (5 taps x ~0.78 ms; the (2304,256)@(256,128)
          tap matmuls run at ~30% MXU utilisation with the VPU y/z
          collapses and two-hot weight builds in the shadow)
  2.1 ms  Newton refine (2 iters x value+gradient taps)
  1.6 ms  XLA prologue (warm start, per-tile median) + second-chance
          pass + colour/normal post
Still ~3x faster than the XLA gather path (~25-45 ms).

r5: the deblock leg is OFF the per-frame path — the fast tracker keeps
a dense bf16 mirror of the volume as state and integrate refreshes only
the ~10% of (bz,by) row-pairs its plan touched (update_logical_pairs
below; full rebuild only on shift frames, where the blocked volume was
rolled). raycast_pallas(logical=...) then starts directly at the
window march.

Pixels whose taps leave their tile's region (depth discontinuities far
from the tile median, missing warm start) fall back to measurement-
derived vertex/normal maps computed in XLA (the warm start IS the
measurement, so this is the same surface estimate minus model fusion).

Reference behaviour being replaced: src/frontend/cuda/ray_caster.cu
:298-425 (per-pixel march + trilinear refine + gradient normals).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kintinuous_tpu.config import CameraIntrinsics
from kintinuous_tpu.ops.blocked import BLOCK, BlockedVolume, blocked_to_dense, flat_index
from kintinuous_tpu.ops.raycast_fast import FastRaycastResult
from kintinuous_tpu.ops.tsdf import unpack_cw

TILE = 16  # pixel tile edge


def _region_extents(R: int) -> Tuple[int, int, int]:
    """Static VMEM region size (z,y,x) for volume resolution R.

    x is the lane dimension: HBM slices must start at multiples of 128
    there, so the x extent is 256 — any <=120-voxel x-range then fits a
    128-aligned window wherever it lands. z/y extents must cover the
    window span (~11 voxels at default trunc) + the tile's angular
    spread (~8 voxels/side at 3 m) + the tile's depth spread; PIXELS
    whose taps leave the (median-centred) region get a SECOND pass
    re-centred on the missed pixels before falling back to measurement
    maps. Measured at 512^3 (single orbit frame, one pass):
    48^2 -> 10.96 ms / 7.5% fallback, 56^2 -> 12.49 / 7.0%,
    64^2 -> 14.13 / 6.3%. Shrinking pass 1 to 40^2 was measured SLOWER
    overall (20.8 ms): the extra misses light up many more pass-2
    tiles than the smaller region saves. 48^2 + second chance:
    13.6 ms / 1.4% fallback."""
    return min(48, R), min(48, R), min(256, R)


def _deblock_kernel(in_ref, s_ref, e_ref, out_ref, *, byh: int, B: int):
    """Blocked rows -> dense slab via selection-matrix matmuls.

    XLA's 6D transpose for blocked->dense costs ~24 ms at 512^3 (it
    relayouts scalar-ish); expressing the shuffle as two one-hot MXU
    matmuls per x-offset runs at ~4 ms. out[dz, (by,dy), (bx,dx)] =
    in[(by,bx), (dz,dy,dx)]:
      M_dx[by,bx,k]   = sum_cell in[by,bx,cell] * S_dx[cell,k]
      out_dx[by,k,c]  = sum_bx  M_dx[by,bx,k]  * E_dx[bx,c]
    with S/E exact one-hots (bf16 one-hot matmul preserves bf16 values).
    """
    x = in_ref[:].astype(jnp.bfloat16)
    xb = x.reshape(byh, B, 4, 128)  # [by, bx, cell_hi, cell_lo]
    acc = jnp.zeros((byh, 64, B * 8), jnp.float32)  # [by, k=(dz,dy), x]
    for dx in range(8):
        # Mosaic matmuls need a single contracting dim: contract the
        # lane axis per sublane piece and accumulate the 4 pieces
        M = jnp.zeros((byh, B, 64), jnp.float32)
        for q in range(4):
            M = M + jax.lax.dot_general(
                xb[:, :, q, :], s_ref[dx, q],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        part = jax.lax.dot_general(
            M.astype(jnp.bfloat16), e_ref[dx], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        acc = acc + part
    a4 = acc.reshape(byh, 8, 8, B * 8)  # [by, dz, dy, x]
    out = a4.transpose(1, 0, 2, 3).reshape(8, byh * 8, B * 8)
    out_ref[:] = out.astype(jnp.bfloat16)


def _build_sel(B: int):
    import numpy as _np

    k = _np.arange(64)
    S = _np.zeros((8, 512, 64), _np.float32)
    E = _np.zeros((8, B, B * 8), _np.float32)
    bx = _np.arange(B)
    for dx in range(8):
        S[dx, k * 8 + dx, k] = 1.0
        E[dx, bx, bx * 8 + dx] = 1.0
    S = S.reshape(8, 4, 128, 64)  # cell split (sublane, lane) to match
    return (jnp.asarray(S, jnp.bfloat16), jnp.asarray(E, jnp.bfloat16))


def build_logical_bf16(
    vol: BlockedVolume, R: int, interpret: bool = False
) -> jnp.ndarray:
    """Blocked (B^3,4,128) f32 -> dense LOGICAL (R,R,R) bf16.

    Requires vol.wrap == 0: the fast tracker keeps the window wrap-free
    by physically rolling the blocked volume on (rare) shift frames, so
    logical == physical and volume edges are true edges."""
    B = R // BLOCK
    byh = min(16, B)
    S, E = _build_sel(B)
    out = pl.pallas_call(
        functools.partial(_deblock_kernel, byh=byh, B=B),
        grid=(B, B // byh),
        in_specs=[
            pl.BlockSpec(
                (byh * B, 4, 128),
                lambda bz, i, _nb=B // byh: (bz * _nb + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, byh * 8, R), lambda bz, i: (bz, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((R, R, R), jnp.bfloat16),
        interpret=interpret,
    )(vol.tsdf, S, E)
    return out


PAIRS_PER_CELL = 4  # dirty row-pairs refreshed per grid cell


def _update_logical_kernel(
    pairs_ref,  # (n_pairs,) i32 compacted dirty row-pair ids (SMEM)
    cnt_ref,  # (1,) i32 dirty count
    tsdf_hbm,  # (B^3,4,128) f32 blocked volume (HBM)
    s_ref, e_ref,  # one-hot selection tables (VMEM)
    _log_in,  # aliased logical (never read; aliasing preserves clean rows)
    out_hbm,  # (R,R,R) bf16 logical (HBM, aliased with _log_in)
    scr_in, scr_f32, scr_bf, sem_in, sem_out,
    *, B: int, ppc: int,
):
    """Refresh `cnt` dirty (bz,by)-row PAIRS of the dense logical bf16
    volume from the blocked f32 volume. A pair (rows 2p, 2p+1) is the
    smallest unit whose dense footprint (8,16,R) is bf16 tile-aligned
    on the sublane dim (16); rows within a pair are contiguous in the
    blocked layout (row-major (bz,by,bx)), so each pair is ONE 2B-block
    DMA. Compute is the same one-hot-matmul deblock as _deblock_kernel,
    batched over the cell's ppc pairs for MXU efficiency."""
    i = pl.program_id(0)
    base = i * ppc
    cnt = cnt_ref[0]

    def in_copy(j):
        r0 = pairs_ref[base + j] * 2
        return pltpu.make_async_copy(
            tsdf_hbm.at[pl.ds(r0 * B, 2 * B)],
            scr_in.at[pl.ds(j * 2 * B, 2 * B)],
            sem_in,
        )

    @pl.when(base < cnt)
    def _():
        # issue every in-DMA before waiting: the cell pays ONE DMA
        # latency epoch instead of ppc serialized round trips
        for j in range(ppc):

            @pl.when(base + j < cnt)
            def _(j=j):
                in_copy(j).start()

        for j in range(ppc):

            @pl.when(base + j < cnt)
            def _(j=j):
                in_copy(j).wait()

        byh = 2 * ppc
        x = scr_in[:].astype(jnp.bfloat16)
        xb = x.reshape(byh, B, 4, 128)
        acc = jnp.zeros((byh, 64, B * 8), jnp.float32)
        for dx in range(8):
            M = jnp.zeros((byh, B, 64), jnp.float32)
            for q in range(4):
                M = M + jax.lax.dot_general(
                    xb[:, :, q, :], s_ref[dx, q],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
            acc = acc + jax.lax.dot_general(
                M.astype(jnp.bfloat16), e_ref[dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        a4 = acc.reshape(byh, 8, 8, B * 8)  # [row, dz, dy, x]

        def out_copy(j):
            r0 = pairs_ref[base + j] * 2
            bz = r0 // B
            by = r0 - bz * B
            return pltpu.make_async_copy(
                scr_bf.at[j],
                out_hbm.at[pl.ds(bz * 8, 8), pl.ds(by * 8, 16), :],
                sem_out,
            )

        for j in range(ppc):
            # f32 staging: sublane halves [0:8)/[8:16) are f32-tile
            # aligned (bf16's 16-sublane tile would make them partial)
            scr_f32[j, :, 0:8, :] = a4[2 * j]
            scr_f32[j, :, 8:16, :] = a4[2 * j + 1]
            scr_bf[j] = scr_f32[j].astype(jnp.bfloat16)

            @pl.when(base + j < cnt)
            def _(j=j):
                out_copy(j).start()

        for j in range(ppc):

            @pl.when(base + j < cnt)
            def _(j=j):
                out_copy(j).wait()


def update_logical_pairs(
    tsdf: jnp.ndarray,  # (B^3,4,128) f32 blocked
    logical: jnp.ndarray,  # (R,R,R) bf16, DONATED (aliased in place)
    pairs: jnp.ndarray,  # (B*B//2,) i32 compacted dirty pair ids
    count: jnp.ndarray,  # () i32
    R: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """In-place refresh of dirty row-pairs of the dense logical volume.

    The frame's integrate touches only its band + carved-free blocks
    (~2-3% of blocks, ~10% of (bz,by) rows measured on orbit frames at
    512^3), so refreshing just those rows replaces the 4.6 ms full
    deblock with ~0.5 ms on non-shift frames; shift frames pass
    count == n_pairs (full rebuild after the blocked roll)."""
    B = R // BLOCK
    assert B % 2 == 0, "incremental logical update requires even B"
    n_pairs = (B * B) // 2
    ppc = PAIRS_PER_CELL
    S, E = _build_sel(B)
    # DYNAMIC grid over exactly the active cells (the dirty list is
    # compacted to the front): a typical frame dirties ~10% of pairs,
    # and a static n_pairs/ppc grid paid ~measurable per-cell stepping
    # cost on the ~90% skipped cells (same trick as the raycast's
    # second-chance pass)
    n_cells = (count.astype(jnp.int32) + ppc - 1) // ppc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((ppc * 2 * B, 4, 128), jnp.float32),
            pltpu.VMEM((ppc, 8, 16, B * 8), jnp.float32),
            pltpu.VMEM((ppc, 8, 16, B * 8), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_update_logical_kernel, B=B, ppc=ppc),
        out_shape=jax.ShapeDtypeStruct((R, R, R), jnp.bfloat16),
        grid_spec=grid_spec,
        input_output_aliases={5: 0},
        interpret=interpret,
    )(pairs, count.reshape(1), tsdf, S, E, logical)


def _raycast_kernel(
    # scalar prefetch
    corners_ref,  # (T,5) i32: z0,y0,x0, valid, tile id (pass 2 compacts
    #               miss tiles to the grid front, so id != program_id)
    params_ref,  # (24,) f32
    # inputs
    vol_ref,  # (R,R,R) bf16 in HBM
    warm_ref,  # (8,128) f32 tile-major block; rows 0-1 hold the 256 px
    # outputs (same tile-major packing)
    t_ref, found_ref, gx_ref, gy_ref, gz_ref,
    # scratch
    vreg, sem,
    *, ntx: int, ext: Tuple[int, int, int], window: int,
    step: float, trunc: float, newton: int,
):
    EZ, EY, EX = ext
    i = pl.program_id(0)
    # offsets are aligned by the corner computation; the hints let
    # Mosaic prove the HBM slice respects the (8,128) bf16 tiling
    z0 = pl.multiple_of(corners_ref[i, 0], 8)
    y0 = pl.multiple_of(corners_ref[i, 1], 8)
    x0 = pl.multiple_of(corners_ref[i, 2], 128)
    valid_tile = corners_ref[i, 3] > 0
    tile_id = corners_ref[i, 4]

    ox = params_ref[0]
    oy = params_ref[1]
    oz = params_ref[2]
    inv_vsz = params_ref[3]
    fx = params_ref[4]
    fy = params_ref[5]
    cx = params_ref[6]
    cy = params_ref[7]
    # rotation, row-major
    r00, r01, r02 = params_ref[8], params_ref[9], params_ref[10]
    r10, r11, r12 = params_ref[11], params_ref[12], params_ref[13]
    r20, r21, r22 = params_ref[14], params_ref[15], params_ref[16]

    zero8 = jnp.zeros((8, 128), jnp.float32)
    t_ref[:] = zero8
    found_ref[:] = zero8
    gx_ref[:] = zero8
    gy_ref[:] = zero8
    gz_ref[:] = zero8

    @pl.when(valid_tile)
    def _():
        dma = pltpu.make_async_copy(
            vol_ref.at[pl.ds(z0, EZ), pl.ds(y0, EY), pl.ds(x0, EX)],
            vreg, sem,
        )
        dma.start()
        dma.wait()
        Vflat = vreg[:].reshape(EZ * EY, EX)  # bf16

        # lanes = 128 pixels; the 256-px tile is two half-tiles (Mosaic
        # does not lane-reshape 256 <-> 2x128, so never materialise 256)
        P = 128
        ty = tile_id // ntx
        tx = tile_id % ntx
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (EX, P), 0)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (EY, P), 0)
        iota_z = jax.lax.broadcasted_iota(jnp.int32, (EZ, P), 0)
        x0f = (x0).astype(jnp.float32)
        y0f = (y0).astype(jnp.float32)
        z0f = (z0).astype(jnp.float32)

        for hp in range(2):
            p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) + hp * P
            u = (tx * TILE + (p % TILE)).astype(jnp.float32)
            v = (ty * TILE + (p // TILE)).astype(jnp.float32)
            rxc = (u - cx) / fx
            ryc = (v - cy) / fy
            dxx = r00 * rxc + r01 * ryc + r02
            dyy = r10 * rxc + r11 * ryc + r12
            dzz = r20 * rxc + r21 * ryc + r22
            inv_n = jax.lax.rsqrt(dxx * dxx + dyy * dyy + dzz * dzz)
            dnx, dny, dnz = dxx * inv_n, dyy * inv_n, dzz * inv_n

            warm = warm_ref[hp : hp + 1, :]  # (1,128)
            has_warm = warm > 0.0
            t0 = warm - (window // 2) * step

            def tap(t, want_grad):
                """Trilinear value (+ optional gradient) at o + t*dn.
                All arrays (1,P)."""
                vx = (ox + t * dnx) * inv_vsz - 0.5 - x0f
                vy = (oy + t * dny) * inv_vsz - 0.5 - y0f
                vz = (oz + t * dnz) * inv_vsz - 0.5 - z0f
                inreg = (
                    (vx >= 0.0) & (vx <= EX - 1.001)
                    & (vy >= 0.0) & (vy <= EY - 1.001)
                    & (vz >= 0.0) & (vz <= EZ - 1.001)
                )
                vx = jnp.clip(vx, 0.0, EX - 1.002)
                vy = jnp.clip(vy, 0.0, EY - 1.002)
                vz = jnp.clip(vz, 0.0, EZ - 1.002)
                ix = jnp.floor(vx)
                iy = jnp.floor(vy)
                iz = jnp.floor(vz)
                fxv = vx - ix
                fyv = vy - iy
                fzv = vz - iz
                ixi = ix.astype(jnp.int32)
                iyi = iy.astype(jnp.int32)
                izi = iz.astype(jnp.int32)

                # two-hot interpolation weights
                Wx = jnp.where(iota_x == ixi, 1.0 - fxv,
                               jnp.where(iota_x == ixi + 1, fxv, 0.0))
                Wy = jnp.where(iota_y == iyi, 1.0 - fyv,
                               jnp.where(iota_y == iyi + 1, fyv, 0.0))
                Wz = jnp.where(iota_z == izi, 1.0 - fzv,
                               jnp.where(iota_z == izi + 1, fzv, 0.0))

                # collapse x on the MXU: (EZ*EY, EX) @ (EX, P)
                A = jax.lax.dot_general(
                    Vflat, Wx.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                ).reshape(EZ, EY, P)
                # collapse y, z on the VPU
                Bm = jnp.sum(A * Wy[None, :, :], axis=1)  # (EZ, P)
                val = jnp.sum(Bm * Wz, axis=0, keepdims=True)  # (1, P)
                if not want_grad:
                    return val, inreg, None, None, None

                Wxd = jnp.where(iota_x == ixi, -1.0,
                                jnp.where(iota_x == ixi + 1, 1.0, 0.0))
                Wyd = jnp.where(iota_y == iyi, -1.0,
                                jnp.where(iota_y == iyi + 1, 1.0, 0.0))
                Wzd = jnp.where(iota_z == izi, -1.0,
                                jnp.where(iota_z == izi + 1, 1.0, 0.0))
                Ad = jax.lax.dot_general(
                    Vflat, Wxd.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                ).reshape(EZ, EY, P)
                Bd = jnp.sum(Ad * Wy[None, :, :], axis=1)
                gxv = jnp.sum(Bd * Wz, axis=0, keepdims=True)
                By = jnp.sum(A * Wyd[None, :, :], axis=1)
                gyv = jnp.sum(By * Wz, axis=0, keepdims=True)
                gzv = jnp.sum(Bm * Wzd, axis=0, keepdims=True)
                return val, inreg, gxv, gyv, gzv

            # ---- windowed crossing search ----------------------------
            found = jnp.zeros((1, P), jnp.bool_)
            ok_all = has_warm
            t_hit = jnp.zeros((1, P), jnp.float32)
            prev_val = jnp.zeros((1, P), jnp.float32)
            prev_t = t0
            for k in range(window):
                tk = t0 + k * step
                val, inreg, _, _, _ = tap(tk, False)
                ok_all = ok_all & inreg
                if k > 0:
                    crossing = (
                        jnp.logical_not(found) & (prev_val > 0) & (val < 0)
                    )
                    denom = prev_val - val
                    frac = jnp.where(
                        jnp.abs(denom) > 1e-12, prev_val / denom, 0.5
                    )
                    t_hit = jnp.where(crossing, prev_t + step * frac, t_hit)
                    found = found | crossing
                prev_val = val
                prev_t = tk
            found = found & ok_all

            # ---- Newton refinement -----------------------------------
            gxv = jnp.zeros((1, P), jnp.float32)
            gyv = jnp.zeros((1, P), jnp.float32)
            gzv = jnp.zeros((1, P), jnp.float32)
            for _ in range(newton):
                val, inreg, gxv, gyv, gzv = tap(t_hit, True)
                found = found & inreg
                dval_dt = (gxv * dnx + gyv * dny + gzv * dnz) * inv_vsz
                nstep = jnp.where(
                    jnp.abs(dval_dt) > 1e-6, val / dval_dt, 0.0
                )
                t_hit = t_hit - jnp.clip(nstep, -2.0 * trunc, 2.0 * trunc)

            t_ref[hp : hp + 1, :] = jnp.where(found, t_hit, 0.0)
            found_ref[hp : hp + 1, :] = found.astype(jnp.float32)
            gx_ref[hp : hp + 1, :] = gxv
            gy_ref[hp : hp + 1, :] = gyv
            gz_ref[hp : hp + 1, :] = gzv


def _warm_start(cam, T_cam_to_local, prev_vmap, measured_depth, h, w):
    """Forward-warped previous prediction + measured-depth fallback.
    Same policy as ops/raycast_fast.raycast_fast."""
    INF = jnp.float32(1e9)
    zbuf = jnp.full((h * w,), INF)
    if prev_vmap is not None:
        Tinv = jnp.linalg.inv(T_cam_to_local)
        pv = jnp.einsum("ij,jhw->ihw", Tinv[:3, :3], prev_vmap) + Tinv[:3, 3][
            :, None, None
        ]
        pz = pv[2].reshape(-1)
        okp = jnp.isfinite(pz) & (pz > 0.05)
        uu = jnp.round(
            jnp.where(okp, pv[0].reshape(-1) / jnp.maximum(pz, 1e-6), 0.0)
            * cam.fx + cam.cx
        ).astype(jnp.int32)
        vv = jnp.round(
            jnp.where(okp, pv[1].reshape(-1) / jnp.maximum(pz, 1e-6), 0.0)
            * cam.fy + cam.cy
        ).astype(jnp.int32)
        okp = okp & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        idx = jnp.where(okp, vv * w + uu, h * w)
        zbuf = zbuf.at[idx].min(jnp.where(okp, pz, INF), mode="drop")
    zbuf = zbuf.reshape(h, w)

    def dil(x):
        p = jnp.pad(x, 1, constant_values=INF)
        out = x
        for dy in range(3):
            for dx in range(3):
                out = jnp.minimum(out, p[dy : dy + h, dx : dx + w])
        return out

    filled = dil(dil(zbuf))
    warm_z = jnp.where(zbuf < INF, zbuf, filled)
    warm_z = jnp.where(
        warm_z < INF, warm_z,
        jnp.where(measured_depth > 0, measured_depth, INF),
    )
    return warm_z  # (h,w) camera z, INF = none


def raycast_pallas(
    vol: BlockedVolume,
    cam: CameraIntrinsics,  # HALF-resolution intrinsics
    T_cam_to_local: jnp.ndarray,
    prev_vmap: Optional[jnp.ndarray],
    measured_depth: jnp.ndarray,  # (h,w) filtered metres
    voxel_size: float,
    volume_size: float,
    trunc_dist: float,
    window: int = 5,
    newton: int = 2,
    interpret: bool = False,
    logical: Optional[jnp.ndarray] = None,
) -> FastRaycastResult:
    h, w = cam.height, cam.width
    B = round(vol.tsdf.shape[0] ** (1 / 3))
    R = B * BLOCK
    ext = _region_extents(R)
    EZ, EY, EX = ext
    step = 0.8 * trunc_dist
    inv_vsz = 1.0 / voxel_size

    h_pad = -(-h // TILE) * TILE
    w_pad = -(-w // TILE) * TILE
    nty, ntx = h_pad // TILE, w_pad // TILE
    T = nty * ntx

    Rot = T_cam_to_local[:3, :3]
    o = T_cam_to_local[:3, 3]

    # ---- ray directions + warm start (XLA) ---------------------------
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    rx = (u - cam.cx) / cam.fx
    ry = (v - cam.cy) / cam.fy
    lam = jnp.sqrt(rx * rx + ry * ry + 1.0)
    ones = jnp.ones((h, w), jnp.float32)
    d_cam = jnp.stack([rx * ones, ry * ones, ones], axis=0)
    d = jnp.einsum("ij,jhw->ihw", Rot, d_cam)
    dn = d / jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    cos_z = jnp.einsum("j,jhw->hw", Rot[:, 2], dn)

    warm_z = _warm_start(cam, T_cam_to_local, prev_vmap, measured_depth, h, w)
    INF = jnp.float32(1e9)
    has_warm = warm_z < INF
    t_warm = jnp.where(has_warm, warm_z * lam, 0.0)  # ray length

    # ---- per-tile region corners (XLA) -------------------------------
    tw = jnp.pad(t_warm, ((0, h_pad - h), (0, w_pad - w)))
    tiles = tw.reshape(nty, TILE, ntx, TILE).transpose(0, 2, 1, 3).reshape(
        T, TILE * TILE
    )
    tvalid = tiles > 0
    any_warm = tvalid.any(axis=1)

    # per-PIXEL segment endpoints (each pixel marches around its OWN
    # warm depth, so the region bbox must cover the tile's depth spread
    # — centring on the tile-mean depth alone left every straggler
    # pixel to the fallback, 10.4% of the orbit frame in r2)
    span = (window / 2.0 + 0.5) * step + 2.0 * trunc_dist
    dpad = jnp.pad(
        jnp.moveaxis(dn, 0, -1), ((0, h_pad - h), (0, w_pad - w), (0, 0))
    )
    dtiles = dpad.reshape(nty, TILE, ntx, TILE, 3).transpose(
        0, 2, 1, 3, 4
    ).reshape(T, TILE * TILE, 3)
    plo = o[None, None, :] + (tiles - span)[..., None] * dtiles
    phi = o[None, None, :] + (tiles + span)[..., None] * dtiles
    # centre the region on the MEDIAN of the per-pixel segment midpoints
    # (in voxel coords): the kernel masks out-of-region TAPS per pixel
    # (ok_all &= inreg), so a tile whose depth spread exceeds the region
    # still serves the majority of its pixels and only the stragglers
    # fall back. A bbox-midpoint centre let one outlier pixel displace
    # the region for the whole tile (part of the r2 10.4% fallback); a
    # whole-tile fits gate cost ~45% on cluttered scenes (VERDICT r1).
    # Median over a 1-in-4 pixel subsample: the full 256-wide sort cost
    # ~0.9 ms/frame and 64 samples centre the region just as well.
    pmid_vox = (0.5 * (plo + phi)) * inv_vsz - 0.5  # (T,256,3)
    pm = jnp.where(tvalid[..., None], pmid_vox, jnp.nan)[:, ::4, :]
    mid = jnp.clip(jnp.nanmedian(pm, axis=1), 0.0, R - 1.0)
    mid = jnp.where(jnp.isfinite(mid), mid, 0.0)
    lox = jnp.clip(
        jnp.floor(mid[:, 0] - EX / 2).astype(jnp.int32) & ~127, 0, R - EX
    )
    loy = jnp.clip(
        jnp.floor(mid[:, 1] - EY / 2).astype(jnp.int32) & ~7, 0, R - EY
    )
    loz = jnp.clip(
        jnp.floor(mid[:, 2] - EZ / 2).astype(jnp.int32) & ~7, 0, R - EZ
    )
    valid = any_warm.astype(jnp.int32)
    tile_ids = jnp.arange(T, dtype=jnp.int32)
    corners = jnp.stack([loz, loy, lox, valid, tile_ids], axis=1)  # (T,5)

    params = jnp.concatenate(
        [
            o,
            jnp.array([inv_vsz], jnp.float32),
            jnp.array([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
            Rot.reshape(-1),
            jnp.zeros((7,), jnp.float32),
        ]
    )  # (24,)

    # incrementally maintained dense logical (tracker fast path) skips
    # the full per-frame deblock — the single largest raycast stage
    vol_bf16 = (
        logical if logical is not None
        else build_logical_bf16(vol, R, interpret=interpret)
    )
    # tile-major packing: tile i -> rows [8i, 8i+8), 256 px in rows 0-1
    # (TPU block shapes need (8k, 128) tiles; (16,16) image blocks don't
    # lower — pack instead of fighting the layout)
    warm_tiles = jnp.pad(
        tiles.reshape(T, 2, 128), ((0, 0), (0, 6), (0, 0))
    ).reshape(T * 8, 128)

    kern = functools.partial(
        _raycast_kernel, ntx=ntx, ext=ext, window=window,
        step=float(step), trunc=float(trunc_dist), newton=newton,
    )
    def run_pass(corners_pass, grid_n):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (8, 128), lambda i, c, p: (c[i, 4], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (8, 128), lambda i, c, p: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            ] * 5,
            scratch_shapes=[
                pltpu.VMEM((EZ, EY, EX), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )
        shp = jax.ShapeDtypeStruct((T * 8, 128), jnp.float32)
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp, shp, shp),
            grid_spec=grid_spec,
            interpret=interpret,
        )(corners_pass, params, vol_bf16, warm_tiles)

    t_hit, found, gx, gy, gz = run_pass(corners, T)

    # ---- second-chance pass (VERDICT r3 next-round #5) ---------------
    # A tile whose depth spread exceeds the VMEM region serves its
    # majority and leaves the stragglers to the measurement fallback
    # (7.8% of in-volume rays in round 3). Re-run ONLY the tiles with
    # misses, region re-centred on the MISSED pixels' segment median —
    # the minority cluster the first region skipped — and merge. Miss
    # tiles are COMPACTED to the grid front and the pass runs a
    # DYNAMIC grid over just them (~10-20% of tiles on a cluttered
    # frame), so the second chance costs a fraction of pass 1.
    found_tiles = found.reshape(T, 8, 128)[:, :2, :].reshape(T, 256) > 0.5
    miss_px = tvalid & jnp.logical_not(found_tiles)
    pm_miss = jnp.where(miss_px[..., None], pmid_vox, jnp.nan)[:, ::4, :]
    mid2 = jnp.clip(jnp.nanmedian(pm_miss, axis=1), 0.0, R - 1.0)
    mid2 = jnp.where(jnp.isfinite(mid2), mid2, 0.0)
    lox2 = jnp.clip(
        jnp.floor(mid2[:, 0] - EX / 2).astype(jnp.int32) & ~127, 0, R - EX
    )
    loy2 = jnp.clip(
        jnp.floor(mid2[:, 1] - EY / 2).astype(jnp.int32) & ~7, 0, R - EY
    )
    loz2 = jnp.clip(
        jnp.floor(mid2[:, 2] - EZ / 2).astype(jnp.int32) & ~7, 0, R - EZ
    )
    # skip tiles whose miss-median lands in the SAME region as pass 1
    # (re-running there cannot find anything new), and tiles with only
    # a couple of stragglers — a region DMA + full tap sweep for <4
    # pixels costs more than the fallback it avoids
    same = (lox2 == lox) & (loy2 == loy) & (loz2 == loz)
    valid2 = (miss_px.sum(axis=1) >= 4) & jnp.logical_not(same)
    n2 = valid2.sum().astype(jnp.int32)
    perm = jnp.argsort(jnp.logical_not(valid2), stable=True).astype(jnp.int32)
    corners2 = jnp.stack(
        [loz2, loy2, lox2, valid2.astype(jnp.int32), tile_ids], axis=1
    )[perm]
    t2, f2, gx2, gy2, gz2 = run_pass(corners2, n2)
    # compact row-block i holds tile perm[i]; gather back by position
    pos = jnp.zeros((T,), jnp.int32).at[perm].set(tile_ids)

    def uncompact(x):
        xt = x.reshape(T, 8, 128)[pos]
        ok_t = valid2 & (pos < n2)
        return jnp.where(ok_t[:, None, None], xt, 0.0).reshape(T * 8, 128)

    f2 = uncompact(f2)
    take2 = (found <= 0.5) & (f2 > 0.5)
    t_hit = jnp.where(take2, uncompact(t2), t_hit)
    gx = jnp.where(take2, uncompact(gx2), gx)
    gy = jnp.where(take2, uncompact(gy2), gy)
    gz = jnp.where(take2, uncompact(gz2), gz)
    found = jnp.maximum(found, f2)

    def unpack(x):
        """(T*8,128) tile-major -> (h,w)."""
        xt = x.reshape(T, 8, 128)[:, :2, :].reshape(
            nty, ntx, TILE, TILE
        )
        return xt.transpose(0, 2, 1, 3).reshape(h_pad, w_pad)[:h, :w]

    t_hit = unpack(t_hit)
    found = unpack(found) > 0.5
    grad = jnp.stack([unpack(gx), unpack(gy), unpack(gz)], axis=-1)

    # ---- XLA post: normals, colour, fallback -------------------------
    gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
    ok = found & (gnorm[..., 0] > 1e-9)
    normal = jnp.moveaxis(grad / jnp.maximum(gnorm, 1e-12), -1, 0)
    pos_hit = o[:, None, None] + t_hit[None] * dn

    pos_vox = jnp.moveaxis(pos_hit, 0, -1) * inv_vsz - 0.5
    gi = jnp.round(pos_vox).astype(jnp.int32)
    px = jnp.mod(gi[..., 0] + vol.wrap[0], R)
    py = jnp.mod(gi[..., 1] + vol.wrap[1], R)
    pz = jnp.mod(gi[..., 2] + vol.wrap[2], R)
    cw = vol.cw.reshape(-1)[flat_index(R, pz, py, px)]
    wgt, cr, cg, cb = unpack_cw(cw)

    # fallback for region-miss pixels with a measurement: the freshly
    # integrated measurement IS the model there (weight-1 fusion), so
    # use it directly; screen-space normals from the measured depth.
    from kintinuous_tpu.ops import maps as map_ops

    vm_m = map_ops.create_vmap(cam, measured_depth)  # camera frame
    vm_l = jnp.einsum("ij,jhw->ihw", Rot, vm_m) + o[:, None, None]
    nm_c = map_ops.create_nmap(vm_m)
    nm_l = jnp.einsum("ij,jhw->ihw", Rot, nm_c)
    # orient toward the camera (TSDF gradients point into free space)
    facing = jnp.sum(nm_l * dn, axis=0)
    nm_l = jnp.where(facing[None] > 0, -nm_l, nm_l)
    meas_ok = (
        jnp.logical_not(ok)
        & (measured_depth > 0)
        & jnp.isfinite(vm_l).all(axis=0)
        & jnp.isfinite(nm_l).all(axis=0)
    )

    nan = jnp.float32(jnp.nan)
    vmap_out = jnp.where(
        ok[None], pos_hit, jnp.where(meas_ok[None], vm_l, nan)
    )
    nmap_out = jnp.where(
        ok[None], normal, jnp.where(meas_ok[None], nm_l, nan)
    )
    either = ok | meas_ok
    depth_out = jnp.where(
        ok, t_hit * cos_z, jnp.where(meas_ok, measured_depth, 0.0)
    )
    # exported health metric: of the rays whose warm-start point lies
    # INSIDE the active volume (pixels beyond it can never have a model
    # surface, so they are excluded), the fraction served by the
    # measurement fallback instead of the model — region misses and
    # failed window searches; high values silently degrade
    # frame-to-model tracking toward frame-to-frame
    pos_warm = (
        jnp.moveaxis(o[:, None, None] + t_warm[None] * dn, 0, -1) * inv_vsz
    )
    in_vol = (pos_warm >= 0.0).all(axis=-1) & (pos_warm <= R - 1.0).all(
        axis=-1
    ) & (t_warm > 0)
    fallback_frac = (meas_ok & in_vol).sum().astype(jnp.float32) / jnp.maximum(
        (either & in_vol).sum().astype(jnp.float32), 1.0
    )
    return FastRaycastResult(
        vmap=vmap_out,
        nmap=nmap_out,
        color=jnp.where(ok[None], jnp.stack([cr, cg, cb], 0), 0.0),
        weight=jnp.where(ok, wgt, 0.0),
        depth=depth_out,
        fallback_frac=fallback_frac,
    )
