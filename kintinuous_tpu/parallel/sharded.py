"""Multi-chip sharded tracking step (jax.sharding Mesh + shard_map).

The reference is strictly single-GPU (SURVEY.md §2.7: no NCCL/MPI
anywhere); this module is the new ICI scaling layer the TPU build adds:

- the TSDF/weight/colour volume is sharded into z-SLABS across the mesh
  axis "z" (matching the [z,y,x] HBM layout, so each slab is contiguous);
  `integrate` runs purely slab-local via its z_phys_offset parameter —
  zero communication for fusion;
- ICP shards pixel ROWS of the current frame across the same axis; the
  6x6 GN system is psum-reduced per iteration (a few hundred bytes on
  ICI) and the solve is replicated — the multi-chip analogue of
  reduce.cu's single-GPU tree reduction;
- band clears / wrap / origin / pose bookkeeping are replicated scalar
  work on slab-local masks;
- raycast v1 all-gathers the tsdf slabs (one tiled all_gather per
  frame) and marches replicated pixel rows against the full volume.
  The zero-gather design (slab-local march + psum-min hit combine +
  1-plane ppermute halos for trilinear/normals) is the planned
  optimisation — the all_gather is the correctness baseline and is
  already a real ICI collective.

Volume shifting/extraction in multi-chip runs is host-triggered on the
gathered volume (shift events are rare — every voxel_shift*voxel_size
metres of travel).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.raycast import raycast
from kintinuous_tpu.ops.reduce import icp_solve_level
from kintinuous_tpu.ops.tsdf import VolumeState, integrate, make_volume
from kintinuous_tpu.tracking.odometry import build_map_pyramid, pyramid_from_maps


class ShardedTrackerState(NamedTuple):
    vol: VolumeState  # tsdf/weight/color sharded on z (dim 0)
    pose: jnp.ndarray  # replicated (4,4)
    pred_vmap: jnp.ndarray  # replicated (3,H,W)
    pred_nmap: jnp.ndarray
    pred_pose: jnp.ndarray
    frame: jnp.ndarray


def state_shardings(mesh: Mesh):
    rep = NamedSharding(mesh, P())
    slab = NamedSharding(mesh, P("z"))
    return ShardedTrackerState(
        vol=VolumeState(tsdf=slab, cw=slab, wrap=rep, origin=rep),
        pose=rep, pred_vmap=rep, pred_nmap=rep, pred_pose=rep, frame=rep,
    )


def make_sharded_state(cfg: KintinuousConfig, mesh: Mesh) -> ShardedTrackerState:
    cam = cfg.camera
    H, W = cam.height, cam.width
    vol = make_volume(cfg.volume_resolution)
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    # donated state fields must not alias each other
    state = ShardedTrackerState(
        vol=vol, pose=pose,
        pred_vmap=jnp.full((3, H, W), jnp.nan, jnp.float32),
        pred_nmap=jnp.full((3, H, W), jnp.nan, jnp.float32),
        pred_pose=pose + 0.0, frame=jnp.int32(0),
    )
    sh = state_shardings(mesh)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def make_sharded_step(cfg: KintinuousConfig, mesh: Mesh, use_odometry: bool = True):
    """Build the jitted multi-chip tracking step over `mesh` (axis "z").

    Requirements: volume_resolution and camera.height divisible by the
    mesh size at every pyramid level used.
    """
    cam = cfg.camera
    n = mesh.shape["z"]
    R = cfg.volume_resolution
    assert R % n == 0, "volume resolution must divide across the mesh"
    slab = R // n
    H = cam.height
    levels = cfg.pyramid_levels
    assert (H >> (levels - 1)) % n == 0, "pixel rows must divide at every level"
    iters = cfg.icp_fast_iterations if cfg.fast_odometry else cfg.icp_iterations
    vsz = cfg.voxel_size
    S = cfg.voxel_shift
    center = cfg.volume_size / 2.0
    shift_thresh = S * vsz
    import math
    sin_t = math.sin(math.radians(cfg.icp_angle_thresh_deg))

    vol_spec = VolumeState(tsdf=P("z"), cw=P("z"), wrap=P(), origin=P())
    state_spec = ShardedTrackerState(
        vol=vol_spec, pose=P(), pred_vmap=P(), pred_nmap=P(), pred_pose=P(), frame=P()
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(state_spec, P(), P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    def step(state: ShardedTrackerState, depth_mm, rgb, ext_delta):
        idx = jax.lax.axis_index("z")
        # --- preprocess: replicated (cheap vs. volume work) ---
        filtered = pp.bilateral_filter(
            depth_mm, cfg.bilateral_sigma_depth, cfg.bilateral_sigma_space,
            cfg.bilateral_radius,
        )
        depth_m = pp.depth_to_metres(filtered, cfg.max_depth)
        curr_pyr = build_map_pyramid(cam, depth_m, levels)

        # --- ICP: rows sharded, psum-reduced systems ---
        if use_odometry:
            Tinv = se3.inverse(state.pred_pose)
            Rm, tm = Tinv[:3, :3], Tinv[:3, 3]
            pv = jnp.einsum("ij,jhw->ihw", Rm, state.pred_vmap) + tm[:, None, None]
            pn = jnp.einsum("ij,jhw->ihw", Rm, state.pred_nmap)
            pred_pyr = pyramid_from_maps(pv, pn, levels)
            T = jnp.eye(4, dtype=jnp.float32)
            for l in range(levels - 1, -1, -1):
                it = int(iters[l]) if l < len(iters) else 0
                if it == 0:
                    continue
                vc, nc = curr_pyr[l]
                rows_l = vc.shape[1] // n
                r0 = idx * rows_l
                vc_blk = jax.lax.dynamic_slice_in_dim(vc, r0, rows_l, 1)
                nc_blk = jax.lax.dynamic_slice_in_dim(nc, r0, rows_l, 1)
                vp, np_ = pred_pyr[l]
                T, _, _ = icp_solve_level(
                    cam.at_level(l), T, vc_blk, nc_blk, vp, np_, it,
                    cfg.icp_dist_thresh, sin_t, axis_name="z",
                )
            delta = T
        else:
            delta = ext_delta
        pose = state.pose @ delta

        # --- shift bookkeeping (no in-step extraction in sharded mode) ---
        vol = state.vol
        if not cfg.static_mode:
            cam_off = pose[:3, 3] - center
            shift = jnp.where(
                cam_off >= shift_thresh, S,
                jnp.where(cam_off <= -shift_thresh, -S, 0),
            ).astype(jnp.int32)

            def band_mask(axis, phys):
                s = shift[axis]
                lo = jnp.where(s > 0, 0, R - S)
                hi = jnp.where(s > 0, S, R)
                logical = jnp.mod(phys - vol.wrap[axis], R)
                return (s != 0) & (logical >= lo) & (logical < hi)

            phys_xy = jnp.arange(R, dtype=jnp.int32)
            phys_z = idx * slab + jnp.arange(slab, dtype=jnp.int32)
            bx = band_mask(0, phys_xy)
            by = band_mask(1, phys_xy)
            bz = band_mask(2, phys_z)
            keep = jnp.logical_not(
                bx[None, None, :] | by[None, :, None] | bz[:, None, None]
            )
            vol = vol._replace(
                tsdf=vol.tsdf * keep,
                cw=jnp.where(keep, vol.cw, jnp.uint32(0)),
                wrap=jnp.mod(vol.wrap + shift, R),
                origin=vol.origin + shift.astype(jnp.float32) * vsz,
            )
            pose = pose.at[:3, 3].add(-shift.astype(jnp.float32) * vsz)

        # --- integrate: pure slab-local ---
        disc = pp.depth_discontinuity_mask(
            depth_m, radius=3, jump_m=cfg.depth_discontinuity_mm * 1e-3
        )
        vol = integrate(
            vol, cam, depth_m, rgb, disc, pose, vsz, cfg.trunc_dist,
            float(cfg.max_weight), z_chunk=min(slab, 64),
            z_phys_offset=idx * slab,
        )

        # --- raycast: v1 gathers slabs (correctness baseline) ---
        full = VolumeState(
            tsdf=jax.lax.all_gather(vol.tsdf, "z", axis=0, tiled=True),
            cw=jax.lax.all_gather(vol.cw, "z", axis=0, tiled=True),
            wrap=vol.wrap,
            origin=vol.origin,
        )
        rc = raycast(
            full, cam, pose, vsz, cfg.volume_size, cfg.trunc_dist,
            cfg.raycast_step_factor, cfg.raycast_min_range, cfg.raycast_max_range,
        )

        new_state = ShardedTrackerState(
            vol=vol, pose=pose, pred_vmap=rc.vmap, pred_nmap=rc.nmap,
            pred_pose=pose, frame=state.frame + 1,
        )
        return new_state, pose.at[:3, 3].add(vol.origin)

    return jax.jit(step, donate_argnums=(0,))
