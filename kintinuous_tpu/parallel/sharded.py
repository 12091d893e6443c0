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
- raycast is SLAB-LOCAL: each chip marches every ray but only owns the
  sample pairs whose leading sample lies in its physical z-slab;
  trilinear/normal/colour taps near slab edges read a few halo planes
  exchanged with ring neighbours via `ppermute` (~8 MB/frame on ICI),
  per-ray first-hit candidates combine with a `pmin`, and the winning
  chip's attributes are `psum`-merged. This replaces the v1 correctness
  baseline that all-gathered the full volume (~1 GB/frame);
  `make_sharded_step(..., slab_raycast=False)` keeps that baseline for
  A/B testing.

- volume shifts extract the departing band SLAB-LOCALLY before the
  clear: each chip emits the zero-crossings whose base voxel's physical
  z-plane lies in its slab (one ppermute'd +z halo plane covers
  cross-slab z-crossings, the ring wrap matching the volume's mod-R
  addressing), compacted into per-chip fixed-capacity buffers that the
  host concatenates — so the multi-chip map is lossless, matching the
  single-chip extraction content (KintinuousTracker.cpp:675-831,
  extract.cu:325-419).
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
from kintinuous_tpu.ops.extract import ExtractResult
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
    # previous frame's RGB-D pyramid (replicated) when photometric
    # odometry is on — TrackerState.rgbd / RGBDOdometry.cpp:165-393 role
    rgbd: object = None


class ShardedStepOutputs(NamedTuple):
    """Per-frame outputs of the sharded step. `slices` hold per-chip
    fixed-capacity buffers stacked on the leading (device) axis; counts
    are (n_devices,) so the host concatenates the valid prefixes."""

    pose_global: jnp.ndarray  # (4,4) replicated
    shift: jnp.ndarray  # (3,) i32 voxels shifted this frame
    slices: Tuple[ExtractResult, ExtractResult, ExtractResult]
    icp_count: jnp.ndarray  # () f32
    icp_residual: jnp.ndarray  # () f32
    # fraction of measured pixels the model raycast could not serve
    # (degradation gauge; fast path computes it, dense path reports 0)
    raycast_fallback: jnp.ndarray = 0.0  # () f32
    # per-axis REPLICATED surface-nets band patches when
    # cfg.incremental_mesh (fast sharded path; empty otherwise) — the
    # multi-chip counterpart of tracker.StepOutputs.mesh_patches
    mesh_patches: Tuple = ()


def _init_dense_rgbd(cfg: KintinuousConfig):
    if not (cfg.rgbd_odometry or cfg.icp_plus_rgbd):
        return None
    from kintinuous_tpu.ops.rgbd import build_rgbd_pyramid

    cam = cfg.camera
    return build_rgbd_pyramid(
        jnp.zeros((cam.height, cam.width), jnp.float32),
        jnp.zeros((cam.height, cam.width), jnp.float32),
        cfg.pyramid_levels,
    )


def state_shardings(mesh: Mesh, rgbd_template=None):
    rep = NamedSharding(mesh, P())
    slab = NamedSharding(mesh, P("z"))
    rgbd_sh = (
        jax.tree_util.tree_map(lambda _: rep, rgbd_template)
        if rgbd_template is not None else None
    )
    return ShardedTrackerState(
        vol=VolumeState(tsdf=slab, cw=slab, wrap=rep, origin=rep),
        pose=rep, pred_vmap=rep, pred_nmap=rep, pred_pose=rep, frame=rep,
        rgbd=rgbd_sh,
    )


def make_sharded_state(cfg: KintinuousConfig, mesh: Mesh) -> ShardedTrackerState:
    cam = cfg.camera
    H, W = cam.height, cam.width
    vol = make_volume(cfg.volume_resolution)
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    rgbd = _init_dense_rgbd(cfg)
    # donated state fields must not alias each other
    state = ShardedTrackerState(
        vol=vol, pose=pose,
        pred_vmap=jnp.full((3, H, W), jnp.nan, jnp.float32),
        pred_nmap=jnp.full((3, H, W), jnp.nan, jnp.float32),
        pred_pose=pose + 0.0, frame=jnp.int32(0), rgbd=rgbd,
    )
    sh = state_shardings(mesh, rgbd)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def _slab_trilinear(arr_h, wrap, idx, slab, halo, R, pos_vox):
    """Trilinear sample against a halo-extended z-slab.

    arr_h: (halo + slab + halo, R, R) — physical planes
    [idx*slab - halo, idx*slab + slab + halo) mod R.
    Returns (val, corners(...,8), frac, own) where `own` marks samples
    whose base z-plane this chip owns (each global sample is owned by
    exactly one chip)."""
    base = jnp.floor(pos_vox).astype(jnp.int32)
    frac = pos_vox - base
    nloc = arr_h.shape[0]
    flat = arr_h.reshape(-1)
    pz0 = jnp.mod(base[..., 2] + wrap[2], R)
    lz0 = jnp.mod(pz0 - idx * slab + halo, R)
    own = (lz0 >= halo) & (lz0 < halo + slab)
    reachable = lz0 < nloc - 1

    def corner(cx, cy, cz):
        ix = jnp.mod(base[..., 0] + cx + wrap[0], R)
        iy = jnp.mod(base[..., 1] + cy + wrap[1], R)
        lz = jnp.clip(lz0 + cz, 0, nloc - 1)
        return flat[(lz * R + iy) * R + ix]

    c = [corner(k & 1, (k >> 1) & 1, (k >> 2) & 1) for k in range(8)]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = c[0] * (1 - fx) + c[1] * fx
    c10 = c[2] * (1 - fx) + c[3] * fx
    c01 = c[4] * (1 - fx) + c[5] * fx
    c11 = c[6] * (1 - fx) + c[7] * fx
    val = (c00 * (1 - fy) + c10 * fy) * (1 - fz) + (
        c01 * (1 - fy) + c11 * fy
    ) * fz
    corners = jnp.stack(c, axis=-1)
    return val, corners, frac, own & reachable


def _halo_extend(slab_arr, halo, axis_name="z"):
    """(slab,R,R) -> (halo+slab+halo,R,R) with ring-neighbour halos.

    Two `ppermute`s move `halo` boundary planes per neighbour per frame
    (~R*R*halo elements each) — the ICI cost that replaces the v1
    full-volume all_gather."""
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i - 1) % n) for i in range(n)]  # receive from next chip
    bwd = [(i, (i + 1) % n) for i in range(n)]  # receive from prev chip
    hi = jax.lax.ppermute(slab_arr[:halo], axis_name, perm=fwd)
    lo = jax.lax.ppermute(slab_arr[-halo:], axis_name, perm=bwd)
    return jnp.concatenate([lo, slab_arr, hi], axis=0)


def _empty_extract(capacity: int) -> ExtractResult:
    return ExtractResult(
        points=jnp.zeros((capacity, 3), jnp.float32),
        colors=jnp.zeros((capacity, 3), jnp.float32),
        weights=jnp.zeros((capacity,), jnp.float32),
        count=jnp.zeros((1,), jnp.int32),
    )


def extract_slab(
    vol: VolumeState,
    lo: jnp.ndarray,  # (3,) i32 logical sub-box lower corner [x,y,z]
    size: Tuple[int, int, int],  # STATIC [x,y,z] extent in voxels
    voxel_size: float,
    capacity: int,  # per-chip buffer capacity
    idx,  # this chip's slab index (lax.axis_index)
    slab: int,  # z-planes per slab
    min_weight: float = 1.0,
    axis_name: str = "z",
) -> ExtractResult:
    """Slab-local band extraction inside shard_map — the multi-chip
    equivalent of ops/extract.extract_points (extract.cu:325-419 role).

    Each chip emits exactly the crossings whose BASE voxel's physical
    z-plane lies in its slab, so the union over chips equals the
    single-chip extraction content with no duplicates. The only
    communication is one +z halo plane per array via ppermute (the ring
    wrap matches the volume's mod-R addressing, so logical boxes that
    span the physical wrap boundary need no special casing). Counts are
    returned shaped (1,) so a P('z') out-spec stacks them per chip.
    """
    from kintinuous_tpu.ops.tsdf import unpack_cw

    n = jax.lax.axis_size(axis_name)
    R = slab * n
    sx, sy, sz = int(size[0]), int(size[1]), int(size[2])

    # one +z halo plane: chip i receives chip (i+1)%n's first plane
    fwd = [(i, (i - 1) % n) for i in range(n)]
    tsdf_h = jnp.concatenate(
        [vol.tsdf, jax.lax.ppermute(vol.tsdf[:1], axis_name, perm=fwd)], axis=0
    )
    cw_h = jnp.concatenate(
        [vol.cw, jax.lax.ppermute(vol.cw[:1], axis_name, perm=fwd)], axis=0
    )

    def phys_idx(axis, m):
        logical = jnp.mod(lo[axis] + jnp.arange(m, dtype=jnp.int32), R)
        return jnp.mod(logical + vol.wrap[axis], R), logical

    px, gx = phys_idx(0, sx + 1)
    py, gy = phys_idx(1, sy + 1)
    pz, gz = phys_idx(2, sz + 1)
    lz = jnp.mod(pz - idx * slab, R)  # local plane index; slab == halo
    avail = lz <= slab
    own = lz < slab
    lzc = jnp.clip(lz, 0, slab)

    t = tsdf_h[lzc[:, None, None], py[None, :, None], px[None, None, :]]
    w, cr, cg, cb = unpack_cw(
        cw_h[lzc[:, None, None], py[None, :, None], px[None, None, :]]
    )
    w = jnp.where(avail[:, None, None], w, 0.0)  # mask unavailable planes

    t0 = t[:sz, :sy, :sx]
    w0 = w[:sz, :sy, :sx]
    c0 = jnp.stack(
        [cr[:sz, :sy, :sx], cg[:sz, :sy, :sx], cb[:sz, :sy, :sx]], axis=-1
    )

    def crossing(t1, w1):
        cross = (w0 >= min_weight) & (w1 >= min_weight) & (
            ((t0 > 0) & (t1 < 0)) | ((t0 < 0) & (t1 > 0))
        )
        denom = t0 - t1
        dt = jnp.where(jnp.abs(denom) > 1e-12, t0 / denom, 0.5)
        return cross, jnp.clip(dt, 0.0, 1.0)

    cx_mask, cx_dt = crossing(t[:sz, :sy, 1:], w[:sz, :sy, 1:])
    cy_mask, cy_dt = crossing(t[:sz, 1:, :sx], w[:sz, 1:, :sx])
    cz_mask, cz_dt = crossing(t[1:, :sy, :sx], w[1:, :sy, :sx])
    if sx == R:  # +x neighbour of the last column wraps around
        cx_mask = cx_mask & (jnp.arange(sx)[None, None, :] < sx - 1)
    if sy == R:
        cy_mask = cy_mask & (jnp.arange(sy)[None, :, None] < sy - 1)
    if sz == R:
        cz_mask = cz_mask & (jnp.arange(sz)[:, None, None] < sz - 1)

    any_cross = (cx_mask | cy_mask | cz_mask) & own[:sz, None, None]
    n_cross = (
        cx_mask.astype(jnp.float32)
        + cy_mask.astype(jnp.float32)
        + cz_mask.astype(jnp.float32)
    )

    base_x = gx[:sx].astype(jnp.float32)[None, None, :] + 0.5
    base_y = gy[:sy].astype(jnp.float32)[None, :, None] + 0.5
    base_z = gz[:sz].astype(jnp.float32)[:, None, None] + 0.5
    off_x = jnp.where(cx_mask, cx_dt, 0.0)
    off_y = jnp.where(cy_mask, cy_dt, 0.0)
    off_z = jnp.where(cz_mask, cz_dt, 0.0)
    denom = jnp.maximum(n_cross, 1.0)
    pos = jnp.stack(
        [
            jnp.broadcast_to(base_x, off_x.shape) + off_x / denom,
            jnp.broadcast_to(base_y, off_y.shape) + off_y / denom,
            jnp.broadcast_to(base_z, off_z.shape) + off_z / denom,
        ],
        axis=-1,
    )
    pts_global = pos * voxel_size + vol.origin[None, None, None, :]

    mask = any_cross.reshape(-1)
    m = mask.shape[0]
    didx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask & (didx < capacity), didx, capacity)

    flat_pts = pts_global.reshape(m, 3)
    flat_col = c0.reshape(m, 3)
    flat_wgt = w0.reshape(m)
    points = jnp.zeros((capacity, 3), jnp.float32).at[dest].set(flat_pts, mode="drop")
    colors = jnp.zeros((capacity, 3), jnp.float32).at[dest].set(flat_col, mode="drop")
    weights = jnp.zeros((capacity,), jnp.float32).at[dest].set(flat_wgt, mode="drop")
    count = jnp.minimum(mask.sum(), capacity).astype(jnp.int32).reshape(1)
    return ExtractResult(points=points, colors=colors, weights=weights, count=count)


def _raycast_slab(
    vol: VolumeState,
    cam: CameraIntrinsics,
    T_cam_to_local,
    voxel_size: float,
    volume_size: float,
    trunc_dist: float,
    idx,
    slab: int,
    step_factor: float = 0.8,
    min_range: float = 0.3,
    max_range=None,
    axis_name: str = "z",
):
    """Slab-local replacement for ops/raycast.raycast inside shard_map.

    Every chip marches all rays but owns only the sample pairs whose
    leading sample sits in its physical z-slab; first-hit candidates
    combine with pmin and the winning chip's attributes psum-merge."""
    import math as _math

    from kintinuous_tpu.ops.raycast import _ray_box
    from kintinuous_tpu.ops.tsdf import trilinear_gradient, unpack_cw

    H, W = cam.height, cam.width
    R = vol.tsdf.shape[0] * jax.lax.axis_size(axis_name)
    step = step_factor * trunc_dist
    if max_range is None:
        max_range = volume_size * _math.sqrt(3.0)
    n_steps = int(_math.ceil((max_range - min_range) / step))
    # halo: one step of ray advance (<= step/voxel planes) + trilinear
    halo = int(_math.ceil(step_factor * trunc_dist / voxel_size)) + 2
    halo = min(halo, slab)

    tsdf_h = _halo_extend(vol.tsdf, halo, axis_name)
    cw_h = _halo_extend(vol.cw, halo, axis_name)

    Rot = T_cam_to_local[:3, :3]
    o = T_cam_to_local[:3, 3]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    rx = (u - cam.cx) / cam.fx
    ry = (v - cam.cy) / cam.fy
    ones = jnp.ones((H, W), jnp.float32)
    d_cam = jnp.stack([rx * ones, ry * ones, ones], axis=0)
    d = jnp.einsum("ij,jhw->ihw", Rot, d_cam)
    dn = d / jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    cos_z = jnp.einsum("j,jhw->hw", Rot[:, 2], dn)

    t_near, t_far = _ray_box(o, dn, volume_size)
    t_start = jnp.maximum(min_range, t_near + 1e-5)
    t_stop = jnp.minimum(t_far - 1e-5, max_range)

    def sample_at(t):
        pos = o[:, None, None] + t[None] * dn
        pos_vox = jnp.moveaxis(pos, 0, -1) / voxel_size - 0.5
        val, _, _, own = _slab_trilinear(
            tsdf_h, vol.wrap, idx, slab, halo, R, pos_vox
        )
        return val, own

    INF = jnp.float32(1e9)

    def body(i, carry):
        prev, own_prev, found, t_hit = carry
        t = t_start + (i + 1) * step
        val, own = sample_at(t)
        active = jnp.logical_not(found) & (t <= t_stop) & own_prev
        crossing = active & (prev > 0) & (val < 0)
        denom = prev - val
        frac_t = jnp.where(jnp.abs(denom) > 1e-12, prev / denom, 0.5)
        t_cross = (t - step) + step * frac_t
        t_hit = jnp.where(crossing, t_cross, t_hit)
        found = found | crossing
        prev = val
        return prev, own, found, t_hit

    prev0, own0 = sample_at(t_start)
    init = (
        prev0, own0, jnp.zeros((H, W), bool), jnp.full((H, W), INF)
    )
    _, _, found_l, t_hit_l = jax.lax.fori_loop(0, n_steps, body, init)

    t_loc = jnp.where(found_l, t_hit_l, INF)
    t_min = jax.lax.pmin(t_loc, axis_name)
    found = t_min < INF
    winner = found_l & (t_loc <= t_min)

    t_hit = jnp.where(found, t_min, 0.0)
    pos_hit = o[:, None, None] + t_hit[None] * dn
    pos_vox = jnp.moveaxis(pos_hit, 0, -1) / voxel_size - 0.5
    _, corners, frac, _ = _slab_trilinear(
        tsdf_h, vol.wrap, idx, slab, halo, R, pos_vox
    )
    grad = trilinear_gradient(corners, frac)
    gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
    normal = jnp.moveaxis(grad / jnp.maximum(gnorm, 1e-12), -1, 0)
    ok_l = winner & (gnorm[..., 0] > 1e-9)

    # nearest colour/weight from the halo-extended cw slab
    gi = jnp.round(pos_vox).astype(jnp.int32)
    ix = jnp.mod(gi[..., 0] + vol.wrap[0], R)
    iy = jnp.mod(gi[..., 1] + vol.wrap[1], R)
    pz = jnp.mod(gi[..., 2] + vol.wrap[2], R)
    lz = jnp.clip(jnp.mod(pz - idx * slab + halo, R), 0, cw_h.shape[0] - 1)
    cwv = cw_h.reshape(-1)[(lz * R + iy) * R + ix]
    wgt, cr, cg, cb = unpack_cw(cwv)

    def merge(x, mask):
        return jax.lax.psum(jnp.where(mask, x, 0.0), axis_name)

    ok = jax.lax.psum(ok_l.astype(jnp.float32), axis_name) > 0
    normal_g = merge(normal, ok_l[None])
    col_g = jnp.stack(
        [merge(cr, ok_l), merge(cg, ok_l), merge(cb, ok_l)], axis=0
    )
    wgt_g = merge(wgt, ok_l)

    from kintinuous_tpu.ops.raycast import RaycastResult

    nan = jnp.float32(jnp.nan)
    return RaycastResult(
        vmap=jnp.where(ok[None], pos_hit, nan),
        nmap=jnp.where(ok[None], normal_g, nan),
        color=jnp.where(ok[None], col_g, 0.0),
        weight=jnp.where(ok, wgt_g, 0.0),
        depth=jnp.where(ok, t_hit * cos_z, 0.0),
    )


def make_sharded_step(cfg: KintinuousConfig, mesh: Mesh, use_odometry: bool = True,
                      slab_raycast: bool = True):
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
    OV = cfg.shift_overlap
    cap = cfg.extraction_capacity
    center = cfg.volume_size / 2.0
    shift_thresh = S * vsz
    import math
    sin_t = math.sin(math.radians(cfg.icp_angle_thresh_deg))
    use_rgbd = cfg.rgbd_odometry or cfg.icp_plus_rgbd
    if use_rgbd:
        from kintinuous_tpu.ops.rgbd import (
            MIN_GRAD2,
            build_rgbd_pyramid,
            pack_prev_texture,
            rgb_system,
        )
        from kintinuous_tpu.ops.reduce import GNSystem, icp_step, solve_gn

    vol_spec = VolumeState(tsdf=P("z"), cw=P("z"), wrap=P(), origin=P())
    rgbd_spec = (
        jax.tree_util.tree_map(lambda _: P(), _init_dense_rgbd(cfg))
        if use_rgbd else None
    )
    state_spec = ShardedTrackerState(
        vol=vol_spec, pose=P(), pred_vmap=P(), pred_nmap=P(),
        pred_pose=P(), frame=P(), rgbd=rgbd_spec,
    )
    slice_spec = ExtractResult(
        points=P("z"), colors=P("z"), weights=P("z"), count=P("z")
    )
    inc_mesh = cfg.incremental_mesh
    mvc, mfc = cfg.mesh_vertex_capacity, cfg.mesh_face_capacity
    if inc_mesh:
        from kintinuous_tpu.ops.surface_nets import MeshResult, extract_mesh

        mesh_spec = MeshResult(
            vertices=P(), colors=P(), faces=P(),
            n_vertices=P(), n_faces=P(), cells=P(),
        )
        mesh_specs = (mesh_spec, mesh_spec, mesh_spec)

        def _empty_mesh():
            return MeshResult(
                vertices=jnp.zeros((mvc, 3), jnp.float32),
                colors=jnp.zeros((mvc, 3), jnp.float32),
                faces=jnp.zeros((mfc, 3), jnp.int32),
                n_vertices=jnp.int32(0),
                n_faces=jnp.int32(0),
                cells=jnp.zeros((mvc, 3), jnp.int32),
            )
    else:
        mesh_specs = ()
    out_spec = ShardedStepOutputs(
        pose_global=P(), shift=P(),
        slices=(slice_spec, slice_spec, slice_spec),
        icp_count=P(), icp_residual=P(), raycast_fallback=P(),
        mesh_patches=mesh_specs,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(state_spec, P(), P(), P()),
        out_specs=(state_spec, out_spec),
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
        if use_rgbd:
            curr_rgbd = build_rgbd_pyramid(
                pp.rgb_to_intensity(rgb), depth_m, levels
            )
        else:
            curr_rgbd = None

        # --- odometry: rows sharded, psum-reduced systems ---
        if use_odometry and use_rgbd:
            # fused photometric + ICP (-ri), full-res dense-path variant
            # of fast_sharded's fused block (RGBDOdometry.cpp:165-393):
            # each chip builds both 6x6 systems on its row block, psums,
            # and solves the trace-normalised fusion replicated
            Tinv = se3.inverse(state.pred_pose)
            Rm, tm = Tinv[:3, :3], Tinv[:3, 3]
            pv = jnp.einsum("ij,jhw->ihw", Rm, state.pred_vmap) + tm[:, None, None]
            pn = jnp.einsum("ij,jhw->ihw", Rm, state.pred_nmap)
            pred_pyr = pyramid_from_maps(pv, pn, levels)
            use_icp_term = cfg.icp_plus_rgbd and not cfg.frame_to_frame_rgbd
            w2 = cfg.rgbd_icp_weight * cfg.rgbd_icp_weight
            T = jnp.eye(4, dtype=jnp.float32)
            icp_count = jnp.float32(0.0)
            icp_res = jnp.float32(0.0)
            for l in range(levels - 1, -1, -1):
                it = int(iters[l]) if l < len(iters) else 0
                if it == 0:
                    continue
                cam_l = cam.at_level(l)
                vc, nc = curr_pyr[l]
                rows_l = vc.shape[1] // n
                r0 = idx * rows_l
                vc_blk = jax.lax.dynamic_slice_in_dim(vc, r0, rows_l, 1)
                nc_blk = jax.lax.dynamic_slice_in_dim(nc, r0, rows_l, 1)
                int_blk = jax.lax.dynamic_slice_in_dim(
                    curr_rgbd.intensity[l], r0, rows_l, 0
                )
                mg2 = MIN_GRAD2[min(l, len(MIN_GRAD2) - 1)]
                tex_prev = pack_prev_texture(
                    state.rgbd.intensity[l], state.rgbd.gradx[l],
                    state.rgbd.grady[l], state.rgbd.depth[l],
                )
                prev_hw = state.rgbd.intensity[l].shape
                vp, np_ = pred_pyr[l]

                def make_body(bilinear):
                    def body(_, carry):
                        T, _, _ = carry
                        rgbs = rgb_system(
                            cam_l, T, vc_blk, int_blk, tex_prev, prev_hw,
                            mg2,
                            max_depth_delta=cfg.rgbd_max_depth_delta,
                            axis_name="z", bilinear=bilinear,
                        )
                        rgbs = GNSystem(
                            *[jax.lax.psum(x, "z") for x in rgbs]
                        )
                        A, b = rgbs.A, rgbs.b
                        if use_icp_term:
                            icp = icp_step(
                                cam_l, T, vc_blk, nc_blk, vp, np_,
                                cfg.icp_dist_thresh, sin_t,
                            )
                            icp = GNSystem(
                                *[jax.lax.psum(x, "z") for x in icp]
                            )
                            s_rgb = 1.0 / (jnp.trace(A) + 1e-12)
                            s_icp = 1.0 / (jnp.trace(icp.A) + 1e-12)
                            A = s_rgb * A + w2 * s_icp * icp.A
                            b = s_rgb * b + w2 * s_icp * icp.b
                        xi, ok = solve_gn(A, b)
                        ok = ok & (rgbs.count >= 30.0)
                        T_new = se3.exp_se3(xi) @ T
                        T = jnp.where(ok, T_new, T)
                        return T, rgbs.count, rgbs.residual

                    return body

                # nearest texture taps for the coarse phase, bilinear
                # for the final 2 (ops/rgbd.rgbd_icp_odometry phasing)
                n_coarse = max(it - 2, 0)
                if n_coarse:
                    T, icp_count, icp_res = jax.lax.fori_loop(
                        0, n_coarse, make_body(False),
                        (T, icp_count, icp_res),
                    )
                T, icp_count, icp_res = jax.lax.fori_loop(
                    0, it - n_coarse, make_body(True),
                    (T, icp_count, icp_res),
                )
            # 0.3 m jump guard (RGBDOdometry.cpp:383-387)
            jump = jnp.linalg.norm(T[:3, 3])
            delta = jnp.where(
                jump < cfg.rgbd_jump_reject, T,
                jnp.eye(4, dtype=jnp.float32),
            )
        elif use_odometry:
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
                T, icp_count, icp_res = icp_solve_level(
                    cam.at_level(l), T, vc_blk, nc_blk, vp, np_, it,
                    cfg.icp_dist_thresh, sin_t, axis_name="z",
                )
            delta = T
        else:
            delta = ext_delta
            icp_count = jnp.float32(0.0)
            icp_res = jnp.float32(0.0)
        pose = state.pose @ delta

        # --- shift: slab-local band extraction, then clears ---
        vol = state.vol
        empty3 = (_empty_extract(cap), _empty_extract(cap), _empty_extract(cap))
        mesh_patches = ()
        if inc_mesh:
            mesh_patches = (_empty_mesh(), _empty_mesh(), _empty_mesh())
        if cfg.static_mode:
            shift = jnp.zeros(3, jnp.int32)
            slices = empty3
        else:
            # dynamic cube (-dc): anchor the shift on where the camera
            # LOOKS (KintinuousTracker.cpp:384-442)
            anchor = pose[:3, 3]
            if cfg.dynamic_cube:
                anchor = anchor + pose[:3, 2] * (0.35 * cfg.volume_size)
            cam_off = anchor - center
            shift = jnp.where(
                cam_off >= shift_thresh, S,
                jnp.where(cam_off <= -shift_thresh, -S, 0),
            ).astype(jnp.int32)

            # extract the departing band (+overlap) BEFORE the clear so
            # shifted-out geometry becomes the persistent map
            # (KintinuousTracker.cpp:675-831)
            def axis_slice(axis, size_xyz):
                s = shift[axis]

                def ex(v):
                    lo = jnp.zeros(3, jnp.int32)
                    lo = lo.at[axis].set(jnp.where(s > 0, 0, R - S - OV))
                    return extract_slab(v, lo, size_xyz, vsz, cap, idx, slab)

                return jax.lax.cond(
                    s != 0, ex, lambda v: _empty_extract(cap), vol
                )

            slices = (
                axis_slice(0, (S + OV, R, R)),
                axis_slice(1, (R, S + OV, R)),
                axis_slice(2, (R, R, S + OV)),
            )

            if inc_mesh:
                # band mesh patches on the DENSE sharded path (VERDICT
                # r4 next-round #9 — mirrors fast_sharded.mesh_axis):
                # each chip contributes the z-planes it owns of the
                # departing band's logical box, a psum assembles the
                # box REPLICATED, and every chip runs the same
                # surface-nets extraction — identical coords to the
                # single-chip band patches, so cell-identity welding
                # composes them with the final volume mesh at save.
                def mesh_axis(axis):
                    s = shift[axis]
                    ext_xyz = [R, R, R]
                    ext_xyz[axis] = S + OV + 1

                    def ex(v):
                        lo3 = jnp.zeros(3, jnp.int32).at[axis].set(
                            jnp.where(s > 0, 0, R - S - OV)
                        )
                        # mod-wrap runs (NOT clamp) so the assembled box
                        # reproduces the single-chip dense band mesh
                        # (_band_mesh_patches gathers through vol.wrap
                        # with logical mod-R addressing) bit-for-bit
                        phys = [
                            jnp.mod(
                                lo3[a]
                                + jnp.arange(ext_xyz[a], dtype=jnp.int32)
                                + v.wrap[a],
                                R,
                            )
                            for a in range(3)
                        ]
                        lz = phys[2] - idx * slab
                        own = (lz >= 0) & (lz < slab)
                        lzc = jnp.clip(lz, 0, slab - 1)
                        gi = (
                            lzc[:, None, None],
                            phys[1][None, :, None],
                            phys[0][None, None, :],
                        )
                        t_box = jnp.where(own[:, None, None], v.tsdf[gi], 0.0)
                        c_box = jnp.where(
                            own[:, None, None], v.cw[gi], jnp.uint32(0)
                        )
                        t_box = jax.lax.psum(t_box, "z")
                        c_box = jax.lax.psum(c_box, "z")
                        view = VolumeState(
                            tsdf=t_box, cw=c_box,
                            wrap=jnp.zeros(3, jnp.int32), origin=v.origin,
                        )
                        size_mesh = [R, R, R]
                        size_mesh[axis] = S + OV
                        # lo=0 over the pre-gathered box: the wrap-branch
                        # gather inside extract_mesh becomes the identity
                        # (each axis run is exactly the box extent), and
                        # coord_offset restores the band's logical coords
                        return extract_mesh(
                            view, jnp.zeros(3, jnp.int32), tuple(size_mesh),
                            vsz, mvc, mfc, coord_offset=lo3,
                        )

                    return jax.lax.cond(
                        s != 0, ex, lambda v: _empty_mesh(), vol
                    )

                mesh_patches = (mesh_axis(0), mesh_axis(1), mesh_axis(2))

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
        from kintinuous_tpu.ops.maps import color_fusion_weight

        color_w = color_fusion_weight(
            cam, depth_m, disc, angle=cfg.color_angle_weight
        )
        vol = integrate(
            vol, cam, depth_m, rgb, color_w, pose, vsz, cfg.trunc_dist,
            float(cfg.max_weight), z_chunk=min(slab, 64),
            z_phys_offset=idx * slab,
        )

        if slab_raycast:
            # slab-local march + ppermute halos + pmin/psum combine
            rc = _raycast_slab(
                vol, cam, pose, vsz, cfg.volume_size, cfg.trunc_dist,
                idx, slab, cfg.raycast_step_factor, cfg.raycast_min_range,
                cfg.raycast_max_range,
            )
        else:
            # v1 baseline: gather the slabs and march the full volume
            full = VolumeState(
                tsdf=jax.lax.all_gather(vol.tsdf, "z", axis=0, tiled=True),
                cw=jax.lax.all_gather(vol.cw, "z", axis=0, tiled=True),
                wrap=vol.wrap,
                origin=vol.origin,
            )
            rc = raycast(
                full, cam, pose, vsz, cfg.volume_size, cfg.trunc_dist,
                cfg.raycast_step_factor, cfg.raycast_min_range,
                cfg.raycast_max_range,
            )

        new_state = ShardedTrackerState(
            vol=vol, pose=pose, pred_vmap=rc.vmap, pred_nmap=rc.nmap,
            pred_pose=pose, frame=state.frame + 1, rgbd=curr_rgbd,
        )
        out = ShardedStepOutputs(
            pose_global=pose.at[:3, 3].add(vol.origin),
            shift=shift,
            slices=slices,
            icp_count=icp_count,
            icp_residual=icp_res,
            raycast_fallback=jnp.float32(0.0),
            mesh_patches=mesh_patches,
        )
        return new_state, out

    return jax.jit(step, donate_argnums=(0,))


def make_sharded_extract(cfg: KintinuousConfig, mesh: Mesh):
    """Jitted whole-volume extraction under sharding — the FINAL-slice
    fetch of finalise (KintinuousTracker.cpp:1003-1048) without
    gathering the volume to one chip."""
    R = cfg.volume_resolution
    n = mesh.shape["z"]
    slab = R // n
    cap = cfg.extraction_capacity
    vsz = cfg.voxel_size
    vol_spec = VolumeState(tsdf=P("z"), cw=P("z"), wrap=P(), origin=P())
    slice_spec = ExtractResult(
        points=P("z"), colors=P("z"), weights=P("z"), count=P("z")
    )

    @partial(
        shard_map, mesh=mesh, in_specs=(vol_spec,), out_specs=slice_spec,
        check_vma=False,
    )
    def fetch(vol: VolumeState):
        idx = jax.lax.axis_index("z")
        return extract_slab(
            vol, jnp.zeros(3, jnp.int32), (R, R, R), vsz, cap, idx, slab
        )

    return jax.jit(fetch)
