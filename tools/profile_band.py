#!/usr/bin/env python
"""Decompose integrate_fast band-pass cost: projection math vs image
sampling vs update vs scatters, by progressively truncating the
computation (each variant forces materialisation via a checksum)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.blocked import CELLS, make_blocked_volume
from kintinuous_tpu.ops.tsdf_fast import (
    BAND, BLOCK, FREE, build_depth_tables, classify_blocks,
)


def timeit(name, fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)


def main():
    cfg = KintinuousConfig(fast_mode=True, voxel_shift=16, fast_odometry=True)
    cam = cfg.camera
    vsz = cfg.voxel_size
    trunc = cfg.trunc_dist
    max_weight = float(cfg.max_weight)
    band_cap = cfg.band_cap
    poses = orbit_trajectory(3, radius=0.06, angle_deg=3.0)
    d0, c0 = render_frame(Scene.default(), cam, poses[0])
    depth_m = pp.depth_to_metres(jnp.asarray(np.asarray(d0, np.float32)), 6.0)
    rgb = jnp.asarray(np.asarray(c0, np.float32))
    disc = pp.depth_discontinuity_mask(depth_m, radius=3, jump_m=0.2)
    T = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    vol = make_blocked_volume(cfg.volume_resolution)
    B = round(vol.tsdf.shape[0] ** (1 / 3))
    R = B * BLOCK
    H, W = depth_m.shape

    def stage(upto):
        def f(vol):
            tables = build_depth_tables(cam, depth_m, rgb, disc)
            cls = classify_blocks(vol, cam, tables, T, vsz, trunc,
                                  resolution=R)
            if upto == "classify":
                return (cls == BAND).sum()
            tsdf, cw = vol.tsdf, vol.cw
            bandb = (cls == BAND).reshape(-1)
            bidx = jnp.cumsum(bandb.astype(jnp.int32)) - 1
            dest = jnp.where(bandb & (bidx < band_cap), bidx, band_cap)
            all_ids = jnp.arange(B * B * B, dtype=jnp.int32)
            band_ids = jnp.zeros((band_cap,), jnp.int32).at[dest].set(
                all_ids, mode="drop")
            n_band = jnp.minimum(bandb.sum(), band_cap)
            valid_block = (jnp.arange(band_cap) < n_band)[:, None]
            if upto == "compact":
                return band_ids.sum()
            t8 = tsdf[band_ids]
            c8 = cw[band_ids]
            if upto == "rowgather":
                return t8.sum() + (c8 & 1).sum()
            bz = band_ids // (B * B)
            by = (band_ids // B) % B
            bx = band_ids % B
            off = jnp.arange(CELLS, dtype=jnp.int32)[None, :]
            px = (bx[:, None] * BLOCK) + (off & 7)
            py = (by[:, None] * BLOCK) + ((off >> 3) & 7)
            pz = (bz[:, None] * BLOCK) + (off >> 6)
            gx = jnp.mod(px - vol.wrap[0], R).astype(jnp.float32) + 0.5
            gy = jnp.mod(py - vol.wrap[1], R).astype(jnp.float32) + 0.5
            gz = jnp.mod(pz - vol.wrap[2], R).astype(jnp.float32) + 0.5
            wx, wy, wz = gx * vsz, gy * vsz, gz * vsz
            Tinv = jnp.linalg.inv(T)
            Rcl, tcl = Tinv[:3, :3], Tinv[:3, 3]
            x = Rcl[0, 0] * wx + Rcl[0, 1] * wy + Rcl[0, 2] * wz + tcl[0]
            y = Rcl[1, 0] * wx + Rcl[1, 1] * wy + Rcl[1, 2] * wz + tcl[1]
            z = Rcl[2, 0] * wx + Rcl[2, 1] * wy + Rcl[2, 2] * wz + tcl[2]
            zs = jnp.maximum(z, 1e-6)
            ui = jnp.round(x / zs * cam.fx + cam.cx).astype(jnp.int32)
            vi = jnp.round(y / zs * cam.fy + cam.cy).astype(jnp.int32)
            in_img = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            pidx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
            if upto == "project":
                return pidx.sum() + in_img.sum()
            irow = tables.img_rows[(pidx >> 3).reshape(-1)].reshape(
                *pidx.shape, 16)
            if upto == "imggather":
                return irow.sum()
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (*pidx.shape, BLOCK),
                                         pidx.ndim)
                == (pidx & 7)[..., None]
            )
            samp_ray = jnp.sum(jnp.where(onehot, irow[..., :BLOCK], 0.0), -1)
            samp_aux_f = jnp.sum(jnp.where(onehot, irow[..., BLOCK:], 0.0), -1)
            if upto == "onehot":
                return samp_ray.sum() + samp_aux_f.sum()
            samp_aux = jax.lax.bitcast_convert_type(samp_aux_f, jnp.uint32)
            samp_disc = (samp_aux >> 24) > 0
            r_new = ((samp_aux >> 16) & 0xFF).astype(jnp.float32)
            g_new = ((samp_aux >> 8) & 0xFF).astype(jnp.float32)
            b_new = (samp_aux & 0xFF).astype(jnp.float32)
            valid = in_img & (samp_ray > 0) & valid_block
            vox_ray = jnp.sqrt(x * x + y * y + z * z)
            sdf = samp_ray - vox_ray
            fuse = valid & (sdf >= -trunc)
            tsdf_new = jnp.minimum(1.0, sdf / trunc)
            w_old = (c8 >> 24).astype(jnp.float32)
            r_old = ((c8 >> 16) & 0xFF).astype(jnp.float32)
            g_old = ((c8 >> 8) & 0xFF).astype(jnp.float32)
            b_old = (c8 & 0xFF).astype(jnp.float32)
            w_upd = jnp.where(fuse, jnp.minimum(w_old + 1.0, max_weight), w_old)
            t_upd = jnp.where(
                fuse, (t8 * w_old + tsdf_new) / jnp.maximum(w_old + 1.0, 1.0),
                t8)
            cfuse = fuse & (jnp.abs(sdf) < trunc) & jnp.logical_not(samp_disc)
            inv_w = 1.0 / jnp.maximum(w_old + 1.0, 1.0)

            def mix(old, new):
                return jnp.where(cfuse, (old * w_old + new) * inv_w, old)

            c_upd = (
                (jnp.clip(w_upd, 0, 255).astype(jnp.uint32) << 24)
                | (jnp.clip(mix(r_old, r_new), 0, 255).astype(jnp.uint32) << 16)
                | (jnp.clip(mix(g_old, g_new), 0, 255).astype(jnp.uint32) << 8)
                | jnp.clip(mix(b_old, b_new), 0, 255).astype(jnp.uint32)
            )
            if upto == "update":
                return t_upd.sum() + (c_upd & 1).sum()
            n_rows = tsdf.shape[0]
            safe_rows = jnp.where(valid_block[:, 0], band_ids, n_rows)
            tsdf = tsdf.at[safe_rows].set(t_upd, mode="drop")
            cw = cw.at[safe_rows].set(c_upd, mode="drop")
            return tsdf.sum() + (cw & 1).sum()

        return jax.jit(f)

    for s in ["classify", "compact", "rowgather", "project", "imggather",
              "onehot", "update", "full"]:
        timeit(f"band pass upto {s}", stage(s), vol)


if __name__ == "__main__":
    main()
