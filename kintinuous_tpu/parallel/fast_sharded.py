"""Multi-chip FAST path: the blocked production volume sharded in
block-z slabs over an ICI mesh (axis "z").

The single-chip fast path (ops/blocked, ops/tsdf_fast, ops/raycast_fast,
ops/pallas_*) is what actually hits the 30 Hz budget; this module scales
it without leaving the blocked layout:

- the (B^3, 4, 128) block-row array is block-z-major, so a plain
  leading-dim P("z") shard IS a block-z slab — no relayout;
- integrate: slab-local and communication-free —
  ops/tsdf_fast.integrate_fast(resolution=R, z_block_offset=...) lets
  each chip classify + update only its own block rows (the reference's
  integrate is one kernel over one GPU, tsdf_volume.cu:612-674; here
  the depth tables are replicated and the volume work divides by n);
  with cfg.pallas (auto-on on TPU) each slab instead runs the
  production Pallas band-fusion kernel (ops/pallas_integrate) with
  wrap + z_block_offset addressing — the same kernel that carries the
  single-chip 30 Hz budget, now per slab;
- raycast: the warm-started windowed search of ops/raycast_fast run
  per chip against a ppermute'd block-plane halo; a chip claims the
  crossings whose first tap's z-plane it owns and first hits combine
  with pmin + psum (same ownership scheme as
  parallel/sharded._raycast_slab, at fast-path tap counts);
- ICP: pixel rows sharded, psum'd 6x6 GN systems
  (ops/reduce.icp_solve_level(axis_name="z")), as the slow sharded path;
- shift: wrap-based mod addressing (the single-chip fast path instead
  physically rolls the volume so wrap stays 0 — a roll would move
  block-planes ACROSS chips, so the sharded build keeps the wrap),
  with slab-local band extraction through parallel.sharded.extract_slab
  on a dense view of the slab (KintinuousTracker.cpp:675-831 semantics,
  lossless under sharding).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.ops import maps as map_ops
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.blocked import BLOCK, BlockedVolume
from kintinuous_tpu.ops.extract import ExtractResult
from kintinuous_tpu.ops.raycast_fast import (
    FastRaycastResult,
    _unpack_pair,
    build_pair_texture,
)
from kintinuous_tpu.ops.reduce import icp_solve_level, pack_maps
from kintinuous_tpu.ops.tsdf import VolumeState, unpack_cw
from kintinuous_tpu.ops.tsdf_fast import integrate_fast
from kintinuous_tpu.parallel.sharded import (
    ShardedStepOutputs,
    _empty_extract,
    extract_slab,
)
from kintinuous_tpu.tracking.odometry import build_map_pyramid, pyramid_from_maps


class FastShardedState(NamedTuple):
    vol: BlockedVolume  # tsdf/cw sharded on the leading block-row axis
    pose: jnp.ndarray  # (4,4) camera->local, replicated
    pred_vmap: jnp.ndarray  # (3,h,w) HALF-res prediction, replicated
    pred_nmap: jnp.ndarray
    pred_pose: jnp.ndarray
    frame: jnp.ndarray
    # previous-frame RGBDFramePyramid (replicated) when photometric
    # odometry is on (-r / -ri), else None — the multi-chip analogue of
    # TrackerState.rgbd (reference RGBDOdometry.cpp:165-393 state)
    rgbd: object = None


def _init_rgbd(cfg: KintinuousConfig):
    if not (cfg.rgbd_odometry or cfg.icp_plus_rgbd):
        return None
    from kintinuous_tpu.ops.rgbd import build_rgbd_pyramid

    cam = cfg.camera
    h, w = cam.height // 2, cam.width // 2
    levels = max(2, cfg.pyramid_levels - 1)
    return build_rgbd_pyramid(
        jnp.zeros((h, w), jnp.float32), jnp.zeros((h, w), jnp.float32), levels
    )


def state_shardings(mesh: Mesh, rgbd_template=None):
    rep = NamedSharding(mesh, P())
    slab = NamedSharding(mesh, P("z"))
    rgbd_spec = (
        jax.tree_util.tree_map(lambda _: rep, rgbd_template)
        if rgbd_template is not None else None
    )
    return FastShardedState(
        vol=BlockedVolume(tsdf=slab, cw=slab, wrap=rep, origin=rep),
        pose=rep, pred_vmap=rep, pred_nmap=rep, pred_pose=rep, frame=rep,
        rgbd=rgbd_spec,
    )


def make_fast_sharded_state(cfg: KintinuousConfig, mesh: Mesh) -> FastShardedState:
    from kintinuous_tpu.ops.blocked import make_blocked_volume

    cam = cfg.camera
    h, w = cam.height // 2, cam.width // 2  # predictions at half res
    vol = make_blocked_volume(cfg.volume_resolution)
    pose = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(cfg.volume_size / 2.0)
    rgbd = _init_rgbd(cfg)
    state = FastShardedState(
        vol=vol, pose=pose,
        pred_vmap=jnp.full((3, h, w), jnp.nan, jnp.float32),
        pred_nmap=jnp.full((3, h, w), jnp.nan, jnp.float32),
        pred_pose=pose + 0.0, frame=jnp.int32(0), rgbd=rgbd,
    )
    return jax.tree_util.tree_map(
        jax.device_put, state, state_shardings(mesh, rgbd)
    )


def blocked_slab_to_dense(arr: jnp.ndarray, xy_blocks: int) -> jnp.ndarray:
    """(Bz*B*B, 4, 128) block-z slab -> dense (Bz*8, R, R) [z,y,x]."""
    B = xy_blocks
    Bz = arr.shape[0] // (B * B)
    return (
        arr.reshape(Bz, B, B, BLOCK, BLOCK, BLOCK)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(Bz * BLOCK, B * BLOCK, B * BLOCK)
    )


def _blocked_halo_extend(arr, halo_b: int, xy_blocks: int, axis_name="z"):
    """Extend a block-z slab with `halo_b` block-planes from each ring
    neighbour. arr: (Bz*B*B, 4, 128) -> ((halo_b+Bz+halo_b)*B*B, 4, 128).
    The leading axis is block-z-major, so neighbour planes are
    contiguous leading-row ranges — two ppermutes per array per frame.
    """
    n = jax.lax.axis_size(axis_name)
    rows = halo_b * xy_blocks * xy_blocks
    fwd = [(i, (i - 1) % n) for i in range(n)]  # receive from next chip
    bwd = [(i, (i + 1) % n) for i in range(n)]  # receive from prev chip
    hi = jax.lax.ppermute(arr[:rows], axis_name, perm=fwd)
    lo = jax.lax.ppermute(arr[-rows:], axis_name, perm=bwd)
    return jnp.concatenate([lo, arr, hi], axis=0)


def _slab_rowoff(R, B, lz, py, px):
    """Local (extended) voxel coords -> (row, offset) into a blocked
    slab array whose leading dim covers lz's range."""
    row = ((lz >> 3) * B + (py >> 3)) * B + (px >> 3)
    off = ((lz & 7) << 6) | ((py & 7) << 3) | (px & 7)
    return row * 512 + off


class _SlabAddr(NamedTuple):
    """Static addressing info for halo-extended slab sampling."""

    R: int
    B: int
    slab_v: int  # owned z-planes per chip
    halo_v: int  # halo z-planes per side


def _slab_local_z(addr: _SlabAddr, z0, pz):
    """Physical plane -> (local extended plane index, own, reachable)."""
    lzr = jnp.mod(pz - z0, addr.R)
    own = lzr < addr.slab_v
    lz_ext = jnp.where(lzr >= addr.R - addr.halo_v, lzr - addr.R, lzr) + addr.halo_v
    reach = (lz_ext >= 0) & (lz_ext < addr.slab_v + 2 * addr.halo_v)
    return jnp.clip(lz_ext, 0, addr.slab_v + 2 * addr.halo_v - 1), own, reach


def _slab_nearest_pairs(pairs_ext, addr: _SlabAddr, wrap, z0, pos_vox):
    """Nearest-voxel tsdf (hi limb of the x-pair) + ownership."""
    gi = jnp.round(pos_vox).astype(jnp.int32)
    px = jnp.mod(gi[..., 0] + wrap[0], addr.R)
    py = jnp.mod(gi[..., 1] + wrap[1], addr.R)
    pz = jnp.mod(gi[..., 2] + wrap[2], addr.R)
    lz, own, reach = _slab_local_z(addr, z0, pz)
    p = pairs_ext.reshape(-1)[_slab_rowoff(addr.R, addr.B, lz, py, px)]
    return _unpack_pair(p)[0], own & reach


def _slab_trilinear_pairs(pairs_ext, addr: _SlabAddr, wrap, z0, pos_vox):
    """Trilinear value + corners via 4 x-pair gathers against the
    halo-extended slab (raycast_fast._trilinear_pairs semantics)."""
    base = jnp.floor(pos_vox).astype(jnp.int32)
    frac = pos_vox - base
    flat = pairs_ext.reshape(-1)
    px = jnp.mod(base[..., 0] + wrap[0], addr.R)

    def ypair(cy, cz):
        py = jnp.mod(base[..., 1] + cy + wrap[1], addr.R)
        pz = jnp.mod(base[..., 2] + cz + wrap[2], addr.R)
        lz, _, _ = _slab_local_z(addr, z0, pz)
        return _unpack_pair(flat[_slab_rowoff(addr.R, addr.B, lz, py, px)])

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


def raycast_fast_slab(
    vol: BlockedVolume,  # this chip's block-z slab
    cam: CameraIntrinsics,  # HALF-resolution intrinsics
    T_cam_to_local: jnp.ndarray,
    measured_depth: jnp.ndarray,  # (h,w) current filtered depth (m)
    voxel_size: float,
    trunc_dist: float,
    idx,  # this chip's slab index
    resolution: int,
    window: int = 6,
    halo_blocks: int = 2,
    axis_name: str = "z",
) -> FastRaycastResult:
    """Slab-sharded ops/raycast_fast.raycast_fast: warm start from the
    just-integrated measurement, windowed nearest search, two Newton
    refinements — each chip claims crossings whose first tap's z-plane
    it owns, first hits merge with pmin and the winner's attributes
    psum (ray_caster.cu:298-425 role at multi-chip fast-path cost)."""
    from kintinuous_tpu.ops.tsdf import trilinear_gradient

    h, w = cam.height, cam.width
    R = resolution
    B = R // BLOCK
    n = jax.lax.axis_size(axis_name)
    Bz = B // n
    halo_b = min(halo_blocks, Bz)
    addr = _SlabAddr(R=R, B=B, slab_v=Bz * BLOCK, halo_v=halo_b * BLOCK)
    z0 = idx * addr.slab_v
    step = 0.8 * trunc_dist

    tsdf_ext = _blocked_halo_extend(vol.tsdf, halo_b, B, axis_name)
    cw_ext = _blocked_halo_extend(vol.cw, halo_b, B, axis_name)
    pairs = build_pair_texture(tsdf_ext, xy_blocks=B)

    Rot = T_cam_to_local[:3, :3]
    o = T_cam_to_local[:3, 3]
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

    # warm start: the just-integrated measurement predicts the model
    # surface (replicated computation; matches the single-chip fast
    # path which also warms from the measurement only)
    INF = jnp.float32(1e9)
    has_warm = measured_depth > 0
    t_warm = jnp.where(has_warm, measured_depth * lam, 0.0)

    t0 = t_warm - (window // 2) * step
    inv_vsz = 1.0 / voxel_size

    def sample_t(t):
        pos = o[:, None, None] + t[None] * dn
        pos_vox = jnp.moveaxis(pos, 0, -1) * inv_vsz - 0.5
        return _slab_nearest_pairs(pairs, addr, vol.wrap, z0, pos_vox)

    ts = [t0 + i * step for i in range(window)]
    samples = [sample_t(t) for t in ts]
    found = jnp.zeros((h, w), bool)
    t_hit = jnp.zeros((h, w), jnp.float32)
    for i in range(window - 1):
        (a, own_a), (b, _) = samples[i], samples[i + 1]
        # ownership of the FIRST tap decides the claiming chip; own
        # implies the second tap (<= one step away) is halo-reachable
        crossing = jnp.logical_not(found) & own_a & (a > 0) & (b < 0)
        denom = a - b
        frac_t = jnp.where(jnp.abs(denom) > 1e-12, a / denom, 0.5)
        t_hit = jnp.where(crossing, ts[i] + step * frac_t, t_hit)
        found = found | crossing
    found = found & has_warm

    # first hit across chips
    t_loc = jnp.where(found, t_hit, INF)
    t_min = jax.lax.pmin(t_loc, axis_name)
    found_g = t_min < INF
    winner = found & (t_loc <= t_min)
    t_ref = jnp.where(found_g, t_min, 0.0)

    # Newton refine on the winning chip's halo-extended trilinear field
    dn_hw = jnp.moveaxis(dn, 0, -1)
    grad = jnp.zeros((h, w, 3), jnp.float32)
    for _ in range(2):
        pos_vox = (
            jnp.moveaxis(o[:, None, None] + t_ref[None] * dn, 0, -1) * inv_vsz
            - 0.5
        )
        val, corners, frac = _slab_trilinear_pairs(
            pairs, addr, vol.wrap, z0, pos_vox
        )
        grad = trilinear_gradient(corners, frac)
        dval_dt = jnp.sum(grad * dn_hw, axis=-1) * inv_vsz
        newton = jnp.where(jnp.abs(dval_dt) > 1e-6, val / dval_dt, 0.0)
        t_ref = t_ref - jnp.clip(newton, -2.0 * trunc_dist, 2.0 * trunc_dist)
    t_fin = jnp.where(found_g, t_ref, 0.0)
    pos_hit = o[:, None, None] + t_fin[None] * dn
    pos_vox = jnp.moveaxis(pos_hit, 0, -1) * inv_vsz - 0.5
    gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
    normal = jnp.moveaxis(grad / jnp.maximum(gnorm, 1e-12), -1, 0)
    ok_l = winner & (gnorm[..., 0] > 1e-9)

    # nearest colour/weight from the halo-extended cw slab
    gi = jnp.round(pos_vox).astype(jnp.int32)
    px = jnp.mod(gi[..., 0] + vol.wrap[0], R)
    py = jnp.mod(gi[..., 1] + vol.wrap[1], R)
    pz = jnp.mod(gi[..., 2] + vol.wrap[2], R)
    lz, _, _ = _slab_local_z(addr, z0, pz)
    cwv = cw_ext.reshape(-1)[_slab_rowoff(R, B, lz, py, px)]
    wgt, cr, cg, cb = unpack_cw(cwv)

    def merge(x, mask):
        return jax.lax.psum(jnp.where(mask, x, 0.0), axis_name)

    ok = jax.lax.psum(ok_l.astype(jnp.float32), axis_name) > 0
    # the winner's refined t/position are exact; losers contribute 0
    t_g = merge(jnp.where(ok_l, t_fin, 0.0), ok_l)
    pos_g = o[:, None, None] + t_g[None] * dn
    normal_g = merge(normal, ok_l[None])
    col_g = jnp.stack([merge(cr, ok_l), merge(cg, ok_l), merge(cb, ok_l)], 0)
    wgt_g = merge(wgt, ok_l)

    nan = jnp.float32(jnp.nan)
    return FastRaycastResult(
        vmap=jnp.where(ok[None], pos_g, nan),
        nmap=jnp.where(ok[None], normal_g, nan),
        color=jnp.where(ok[None], col_g, 0.0),
        weight=jnp.where(ok, wgt_g, 0.0),
        depth=jnp.where(ok, t_g * cos_z, 0.0),
    )


def make_fast_sharded_step(cfg: KintinuousConfig, mesh: Mesh,
                           use_odometry: bool = True):
    """Jitted multi-chip FAST tracking step over `mesh` (axis "z").

    Requirements: volume block count (R/8) and half-res pixel rows must
    divide by the mesh size at every ICP level used; voxel_shift is
    8-aligned (enforced by config in fast mode)."""
    cam = cfg.camera
    cam_half = cam.at_level(1)
    n = mesh.shape["z"]
    R = cfg.volume_resolution
    B = R // BLOCK
    assert B % n == 0, "volume block count must divide across the mesh"
    Bz = B // n
    slab_v = Bz * BLOCK
    levels = max(2, cfg.pyramid_levels - 1)
    h = cam_half.height
    assert (h >> (levels - 1)) % n == 0, (
        "half-res pixel rows must divide at every level"
    )
    base_iters = cfg.icp_fast_iterations if cfg.fast_odometry else cfg.icp_iterations
    iters = tuple(base_iters[1:]) if len(base_iters) > 1 else (10, 5)
    # production Pallas integrate per slab (cfg.pallas None = auto on
    # TPU, like the single-chip tracker); interpret mode on CPU meshes
    use_pallas = cfg.pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    pallas_interpret = jax.default_backend() not in ("tpu", "axon")
    vsz = cfg.voxel_size
    S = cfg.voxel_shift
    OV = cfg.shift_overlap
    cap = cfg.extraction_capacity
    center = cfg.volume_size / 2.0
    shift_thresh = S * vsz
    sin_t = math.sin(math.radians(cfg.icp_angle_thresh_deg))
    band_cap = min(cfg.band_cap, Bz * B * B)
    free_cap = min(12288, Bz * B * B)  # integrate_fast FREE-carve default
    use_rgbd = cfg.rgbd_odometry or cfg.icp_plus_rgbd
    if use_rgbd:
        from kintinuous_tpu.ops.rgbd import (
            MIN_GRAD2,
            build_rgbd_pyramid,
            pack_prev_texture,
            rgb_system,
        )
        from kintinuous_tpu.ops.reduce import GNSystem, icp_step, solve_gn

    vol_spec = BlockedVolume(tsdf=P("z"), cw=P("z"), wrap=P(), origin=P())
    rgbd_spec = (
        jax.tree_util.tree_map(lambda _: P(), _init_rgbd(cfg))
        if use_rgbd else None
    )
    state_spec = FastShardedState(
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
    def step(state: FastShardedState, depth_raw, rgb_raw, ext_delta):
        idx = jax.lax.axis_index("z")
        depth_mm = depth_raw.astype(jnp.float32)
        rgb = rgb_raw.astype(jnp.float32)
        filtered_mm = pp.bilateral_filter(
            depth_mm, cfg.bilateral_sigma_depth, cfg.bilateral_sigma_space,
            cfg.bilateral_radius,
        )
        depth_m = pp.depth_to_metres(filtered_mm, cfg.max_depth)
        depth_half = pp.pyr_down_depth(depth_m, sigma=0.09)
        curr_pyr = build_map_pyramid(cam_half, depth_half, levels)
        if use_rgbd:
            intensity_half = pp.pyr_down_gauss(pp.rgb_to_intensity(rgb))
            curr_rgbd = build_rgbd_pyramid(intensity_half, depth_half, levels)
        else:
            curr_rgbd = None

        # --- odometry: pixel rows sharded, psum'd 6x6 systems ---
        if use_odometry and use_rgbd:
            # fused photometric + ICP (-ri), the multi-chip analogue of
            # ops/rgbd.rgbd_icp_odometry (RGBDOdometry.cpp:165-393):
            # each chip builds both systems on its row block, psums, and
            # solves the trace-normalised fused system replicated
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
                cam_l = cam_half.at_level(l)
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
                            cam_l, T, vc_blk, int_blk, tex_prev, prev_hw, mg2,
                            max_depth_delta=cfg.rgbd_max_depth_delta,
                            axis_name="z", bilinear=bilinear,
                        )
                        rgbs = GNSystem(*[jax.lax.psum(x, "z") for x in rgbs])
                        A, b = rgbs.A, rgbs.b
                        if use_icp_term:
                            icp = icp_step(
                                cam_l, T, vc_blk, nc_blk, vp, np_,
                                cfg.icp_dist_thresh, sin_t,
                            )
                            icp = GNSystem(*[jax.lax.psum(x, "z") for x in icp])
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

                # nearest-neighbour texture taps for the coarse phase,
                # bilinear for the final 2 (ops/rgbd.rgbd_icp_odometry)
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
                jump < cfg.rgbd_jump_reject, T, jnp.eye(4, dtype=jnp.float32)
            )
        elif use_odometry:
            Tinv = se3.inverse(state.pred_pose)
            Rm, tm = Tinv[:3, :3], Tinv[:3, 3]
            pv = jnp.einsum("ij,jhw->ihw", Rm, state.pred_vmap) + tm[:, None, None]
            pn = jnp.einsum("ij,jhw->ihw", Rm, state.pred_nmap)
            pred_pyr = pyramid_from_maps(pv, pn, levels)
            T = jnp.eye(4, dtype=jnp.float32)
            icp_count = jnp.float32(0.0)
            icp_res = jnp.float32(0.0)
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
                # same packed-association grouping as the single-chip
                # fast path (odometry.icp_odometry) for bit-comparable
                # iteration trajectories
                packed = pack_maps(vp, np_)
                T, icp_count, icp_res = icp_solve_level(
                    cam_half.at_level(l), T, vc_blk, nc_blk, vp, np_, it,
                    cfg.icp_dist_thresh, sin_t, axis_name="z",
                    packed_prev=packed,
                    reassoc_every=cfg.icp_reassoc_every if l == 0 else 1,
                )
            delta = T
        else:
            delta = ext_delta
            icp_count = jnp.float32(0.0)
            icp_res = jnp.float32(0.0)
        pose = state.pose @ delta

        # --- shift: slab-local extraction, wrap-based clears ---
        vol = state.vol
        empty3 = (_empty_extract(cap), _empty_extract(cap), _empty_extract(cap))
        mesh_patches = ()
        if inc_mesh:
            mesh_patches = (_empty_mesh(), _empty_mesh(), _empty_mesh())
        if cfg.static_mode:
            shift = jnp.zeros(3, jnp.int32)
            slices = empty3
        else:
            anchor = pose[:3, 3]
            if cfg.dynamic_cube:
                anchor = anchor + pose[:3, 2] * (0.35 * cfg.volume_size)
            cam_off = anchor - center
            shift = jnp.where(
                cam_off >= shift_thresh, S,
                jnp.where(cam_off <= -shift_thresh, -S, 0),
            ).astype(jnp.int32)

            def axis_slice(axis, size_xyz):
                s = shift[axis]

                def ex(v):
                    dense_view = VolumeState(
                        tsdf=blocked_slab_to_dense(v.tsdf, B),
                        cw=blocked_slab_to_dense(v.cw, B),
                        wrap=v.wrap, origin=v.origin,
                    )
                    lo = jnp.zeros(3, jnp.int32)
                    lo = lo.at[axis].set(jnp.where(s > 0, 0, R - S - OV))
                    return extract_slab(
                        dense_view, lo, size_xyz, vsz, cap, idx, slab_v
                    )

                return jax.lax.cond(
                    s != 0, ex, lambda v: _empty_extract(cap), vol
                )

            slices = (
                axis_slice(0, (S + OV, R, R)),
                axis_slice(1, (R, S + OV, R)),
                axis_slice(2, (R, R, S + OV)),
            )

            if inc_mesh:
                # band mesh patches (VERDICT r3 next-round #9): each
                # chip contributes its owned z-planes of the departing
                # band's logical box (masked gather from its dense
                # slab), a psum assembles the full ~40 MB box
                # REPLICATED, and every chip runs the same surface-nets
                # extraction — identical coords to the single-chip band
                # patches, so cell-identity welding composes them with
                # the final volume mesh at save (backend/meshing.py)
                def mesh_axis(axis):
                    s = shift[axis]
                    ext_xyz = [R, R, R]
                    ext_xyz[axis] = S + OV + 1

                    def ex(v):
                        dt = blocked_slab_to_dense(v.tsdf, B)
                        dc = blocked_slab_to_dense(v.cw, B)
                        lo3 = jnp.zeros(3, jnp.int32).at[axis].set(
                            jnp.where(s > 0, 0, R - S - OV)
                        )
                        runs = [
                            jnp.clip(
                                lo3[a]
                                + jnp.arange(ext_xyz[a], dtype=jnp.int32),
                                0, R - 1,
                            )
                            for a in range(3)
                        ]
                        phys = [
                            jnp.mod(runs[a] + v.wrap[a], R) for a in range(3)
                        ]
                        lz = phys[2] - idx * slab_v
                        own = (lz >= 0) & (lz < slab_v)
                        lzc = jnp.clip(lz, 0, slab_v - 1)
                        gi = (
                            lzc[:, None, None],
                            phys[1][None, :, None],
                            phys[0][None, None, :],
                        )
                        t_box = jnp.where(own[:, None, None], dt[gi], 0.0)
                        c_box = jnp.where(
                            own[:, None, None], dc[gi], jnp.uint32(0)
                        )
                        t_box = jax.lax.psum(t_box, "z")
                        c_box = jax.lax.psum(c_box, "z")
                        view = VolumeState(
                            tsdf=t_box, cw=c_box,
                            wrap=jnp.zeros(3, jnp.int32), origin=v.origin,
                        )
                        size_mesh = [R, R, R]
                        size_mesh[axis] = S + OV
                        return extract_mesh(
                            view, jnp.zeros(3, jnp.int32), tuple(size_mesh),
                            vsz, mvc, mfc, clamp_edges=True, coord_offset=lo3,
                        )

                    return jax.lax.cond(
                        s != 0, ex, lambda v: _empty_mesh(), vol
                    )

                mesh_patches = (mesh_axis(0), mesh_axis(1), mesh_axis(2))

            def band_keep(axis, phys):
                s = shift[axis]
                lo = jnp.where(s > 0, 0, R - S)
                hi = jnp.where(s > 0, S, R)
                logical = jnp.mod(phys - vol.wrap[axis], R)
                return jnp.logical_not(
                    (s != 0) & (logical >= lo) & (logical < hi)
                )

            phys_xy = jnp.arange(R, dtype=jnp.int32)
            phys_z = idx * slab_v + jnp.arange(slab_v, dtype=jnp.int32)
            kx = band_keep(0, phys_xy).reshape(B, BLOCK)
            ky = band_keep(1, phys_xy).reshape(B, BLOCK)
            kz = band_keep(2, phys_z).reshape(Bz, BLOCK)
            keep = (
                kz[:, None, None, :, None, None]
                & ky[None, :, None, None, :, None]
                & kx[None, None, :, None, None, :]
            ).reshape(Bz * B * B, 4, 128)
            vol = vol._replace(
                tsdf=vol.tsdf * keep,
                cw=jnp.where(keep, vol.cw, jnp.uint32(0)),
                wrap=jnp.mod(vol.wrap + shift, R),
                origin=vol.origin + shift.astype(jnp.float32) * vsz,
            )
            pose = pose.at[:3, 3].add(-shift.astype(jnp.float32) * vsz)

        # --- integrate: slab-local, no communication ---
        disc = pp.depth_discontinuity_mask(
            depth_m, radius=3, jump_m=cfg.depth_discontinuity_mm * 1e-3
        )
        color_w = map_ops.color_fusion_weight(
            cam, depth_m, disc, angle=cfg.color_angle_weight
        )
        if use_pallas:
            from kintinuous_tpu.ops.pallas_integrate import integrate_pallas

            vol = integrate_pallas(
                vol, cam, depth_m, rgb, color_w, pose, vsz, cfg.trunc_dist,
                float(cfg.max_weight),
                band_cap=band_cap,
                t1_cap=min(4096, Bz * B * B),
                t2_cap=min(1024, Bz * B * B),
                fb_cap=min(128, Bz * B * B),
                free_cap=free_cap,
                interpret=pallas_interpret,
                resolution=R, z_block_offset=idx * Bz,
            )
        else:
            vol = integrate_fast(
                vol, cam, depth_m, rgb, color_w, pose, vsz, cfg.trunc_dist,
                float(cfg.max_weight), band_cap=band_cap, free_cap=free_cap,
                resolution=R, z_block_offset=idx * Bz,
            )

        rc = raycast_fast_slab(
            vol, cam_half, pose, depth_half, vsz, cfg.trunc_dist,
            idx, R,
        )
        # degradation gauge (VERDICT r2 weak #8): fraction of measured
        # pixels the model raycast could NOT serve — the multi-chip
        # analogue of the Pallas raycast's measurement-fallback stat
        measured = (depth_half > 0).sum().astype(jnp.float32)
        served = (rc.depth > 0).sum().astype(jnp.float32)
        fallback = 1.0 - served / jnp.maximum(measured, 1.0)

        new_state = FastShardedState(
            vol=vol, pose=pose, pred_vmap=rc.vmap, pred_nmap=rc.nmap,
            pred_pose=pose, frame=state.frame + 1, rgbd=curr_rgbd,
        )
        out = ShardedStepOutputs(
            pose_global=pose.at[:3, 3].add(vol.origin),
            shift=shift,
            slices=slices,
            icp_count=icp_count,
            icp_residual=icp_res,
            raycast_fallback=fallback,
            mesh_patches=mesh_patches,
        )
        return new_state, out

    return jax.jit(step, donate_argnums=(0,)), step


def make_batched_fast_sharded_step(cfg: KintinuousConfig, mesh: Mesh,
                                   use_odometry: bool = True,
                                   batch: int = 32):
    """Scan `batch` frames through the sharded fast step in ONE dispatch
    — the multi-chip counterpart of tracker.make_batched_step_fast
    (VERDICT r2 missing #5: without it, multi-chip throughput is
    dispatch-bound).

    Slice accumulation mirrors the single-chip POOL design (VERDICT r3
    next-round #7): every shift event appends each chip's slab-local
    extraction to that chip's pool segment at a per-chip running
    offset, recording one replicated event row (frame, axis, per-chip
    offset/count, direction) — so a batch keeps EVERY extracted band
    regardless of shift cadence. The append runs under shard_map so
    per-chip offsets (counts differ per slab) stay chip-local; event
    indices advance on the replicated shift flag, keeping the event
    list identical on every chip. Non-shift frames park their write
    past the live pool, keeping the buffers aliasable (no lax.cond
    copies). Pool exhaustion parks too and is counted per chip.
    """
    _, core = make_fast_sharded_step(cfg, mesh, use_odometry)
    cap = cfg.extraction_capacity
    n = mesh.shape["z"]
    # live rows per chip; the park region is [Pc, Pc+cap)
    Pc = max(cap, int(cfg.batch_slice_pool) // n)
    MAXE = 3 * batch

    @partial(
        shard_map, mesh=mesh,
        in_specs=(
            P("z"), P("z"), P("z"),          # pools (pts, cols, wts)
            P("z"), P("z"),                  # events, ctr
            P("z"), P("z"), P("z"), P("z"),  # ExtractResult fields
            P(), P(), P(),                   # shift value, axis id, frame id
        ),
        out_specs=(P("z"), P("z"), P("z"), P("z"), P("z")),
        check_vma=False,
    )
    def _append(pp, pc, pw, events, ctr, rp, rc, rw, rcnt, s, axis, fidx):
        # local views: pp (Pc+cap,3); events (MAXE+1,5); ctr (1,3) =
        # [point_off, n_events, dropped]; rp (cap,3); rcnt (1,)
        off0 = ctr[0, 0]
        cnt = rcnt[0]
        shifted = s != 0
        fits = off0 + cnt <= Pc
        take = shifted & fits
        off = jnp.where(take, off0, Pc)
        pp = jax.lax.dynamic_update_slice(pp, rp, (off, 0))
        pc = jax.lax.dynamic_update_slice(pc, rc, (off, 0))
        pw = jax.lax.dynamic_update_slice(pw, rw, (off,))
        e = ctr[0, 1]
        row = jnp.stack([
            jnp.where(shifted, fidx, jnp.int32(-1)),
            axis, off, jnp.where(take, cnt, 0), s,
        ]).astype(jnp.int32)[None]
        events = jax.lax.dynamic_update_slice(
            events, row, (jnp.where(shifted, e, jnp.int32(MAXE)), 0)
        )
        ctr = ctr + jnp.stack([
            jnp.where(take, cnt, 0),
            shifted.astype(jnp.int32),
            (shifted & jnp.logical_not(fits)).astype(jnp.int32),
        ])[None]
        return pp, pc, pw, events, ctr

    def batched(state, depths, rgbs, deltas):
        B = depths.shape[0]

        def body(carry, inp):
            st, pool, events, ctr = carry
            d, c, dl, i = inp
            st, out = core(st, d, c, dl)
            for axis in range(3):
                res = out.slices[axis]
                pp, pc, pw, events, ctr = _append(
                    *pool, events, ctr,
                    res.points, res.colors, res.weights, res.count,
                    out.shift[axis], jnp.int32(axis), i,
                )
                pool = (pp, pc, pw)
            y = (out.pose_global, out.shift, out.icp_count,
                 out.icp_residual, out.raycast_fallback)
            return (st, pool, events, ctr), y

        pool0 = (
            jnp.zeros((n * (Pc + cap), 3), jnp.float32),
            jnp.zeros((n * (Pc + cap), 3), jnp.float32),
            jnp.zeros((n * (Pc + cap),), jnp.float32),
        )
        init = (
            state, pool0,
            jnp.full((n * (MAXE + 1), 5), -1, jnp.int32),
            jnp.zeros((n, 3), jnp.int32),
        )
        (state, pool, events, ctr), ys = jax.lax.scan(
            body, init, (depths, rgbs, deltas, jnp.arange(B, dtype=jnp.int32))
        )
        return state, ys, pool, events, ctr

    return jax.jit(batched, donate_argnums=(0,))


def make_fast_sharded_extract(cfg: KintinuousConfig, mesh: Mesh):
    """Whole-volume FINAL-slice fetch on the sharded BLOCKED volume —
    finalise (KintinuousTracker.cpp:1003-1048) without gathering."""
    R = cfg.volume_resolution
    B = R // BLOCK
    n = mesh.shape["z"]
    slab_v = (B // n) * BLOCK
    cap = cfg.extraction_capacity
    vsz = cfg.voxel_size
    vol_spec = BlockedVolume(tsdf=P("z"), cw=P("z"), wrap=P(), origin=P())
    slice_spec = ExtractResult(
        points=P("z"), colors=P("z"), weights=P("z"), count=P("z")
    )

    @partial(
        shard_map, mesh=mesh, in_specs=(vol_spec,), out_specs=slice_spec,
        check_vma=False,
    )
    def fetch(vol: BlockedVolume):
        idx = jax.lax.axis_index("z")
        dense_view = VolumeState(
            tsdf=blocked_slab_to_dense(vol.tsdf, B),
            cw=blocked_slab_to_dense(vol.cw, B),
            wrap=vol.wrap, origin=vol.origin,
        )
        return extract_slab(
            dense_view, jnp.zeros(3, jnp.int32), (R, R, R), vsz, cap, idx,
            slab_v,
        )

    return jax.jit(fetch)
