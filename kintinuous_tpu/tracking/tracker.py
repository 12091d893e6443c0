"""The frontend tracker: odometry + rolling-volume fusion as ONE jitted step.

TPU-native redesign of src/frontend/KintinuousTracker.{h,cpp}
(processFrame :444-909, volume shifting :675-831, finalise :1003-1048):

- the whole per-frame pipeline — bilateral filter, map pyramids,
  coarse-to-fine ICP, shift decision, departing-band extraction, band
  clears, TSDF integrate, raycast prediction — is a single XLA program
  with the volume state donated (updated in place in HBM). The
  reference launches ~30 kernels with per-ICP-iteration host syncs;
  here the host only reads back a handful of scalars per frame.
- volume shifts happen *inside* the step via lax.cond-gated extraction
  (fixed-capacity buffers), so no host round-trip is needed to decide
  them (SURVEY.md §7 hard part 5);
- shifts move the volume window by exactly `voxel_shift` voxels per
  axis per frame (the reference triggers at the same threshold,
  KintinuousTracker.cpp:675-831) and the camera pose is re-localised
  by subtracting the shift, with the global placement accumulated in
  VolumeState.origin (the role of voxelWrap/realVoxelWrap bookkeeping).

Host-side, `Tracker` wraps the step with async dispatch: outputs are
consumed one frame late so slice downloads never stall the device
pipeline (the reference's cloudSignal condvar handoff,
KintinuousTracker.cpp:1186-1207, becomes a host deque).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.extract import ExtractResult, extract_points
from kintinuous_tpu.ops.raycast import raycast
from kintinuous_tpu.ops.tsdf import VolumeState, integrate, make_volume
from kintinuous_tpu.tracking.odometry import (
    build_map_pyramid,
    icp_odometry,
    pyramid_from_maps,
)


class TrackerState(NamedTuple):
    vol: VolumeState
    pose: jnp.ndarray  # (4,4) camera->local-volume
    pred_vmap: jnp.ndarray  # (3,H,W) raycast prediction, LOCAL frame
    pred_nmap: jnp.ndarray  # (3,H,W)
    pred_pose: jnp.ndarray  # (4,4) pose the prediction was cast from
    frame: jnp.ndarray  # () i32
    rgbd: Optional[object]  # RGBDFramePyramid of the previous frame, or None


class StepOutputs(NamedTuple):
    pose_local: jnp.ndarray  # (4,4)
    pose_global: jnp.ndarray  # (4,4) local pose + volume origin
    shift: jnp.ndarray  # (3,) i32 voxels shifted this frame [x,y,z]
    slices: Tuple[ExtractResult, ExtractResult, ExtractResult]  # per axis
    icp_count: jnp.ndarray  # () f32 inliers at finest solved level
    icp_residual: jnp.ndarray  # () f32
    raycast_hits: jnp.ndarray  # () f32 pixels with a predicted surface


@dataclass
class CloudSlice:
    """Host-side slice record (reference src/frontend/CloudSlice.h)."""

    points: np.ndarray  # (N,3) global metres
    colors: np.ndarray  # (N,3) uint8
    weights: np.ndarray  # (N,)
    dimension: str  # 'XPlus','XMinus','YPlus',...,'FIRST','FINAL'
    pose: np.ndarray  # (4,4) global camera pose at emission
    timestamp_us: int
    frame_index: int
    processed: Optional[dict] = None  # filled by the backend slice processor


def make_step(cfg: KintinuousConfig, use_odometry: bool):
    """Builds the jitted tracking step. Two variants are compiled: with
    on-device ICP odometry, or with an externally supplied delta
    (ground-truth replay / first frame)."""
    cam = cfg.camera
    R = cfg.volume_resolution
    vsz = cfg.voxel_size
    S = cfg.voxel_shift
    OV = cfg.shift_overlap
    cap = cfg.extraction_capacity
    center = cfg.volume_size / 2.0
    shift_thresh = S * vsz
    levels = cfg.pyramid_levels
    iters = cfg.icp_fast_iterations if cfg.fast_odometry else cfg.icp_iterations

    use_rgbd = cfg.rgbd_odometry or cfg.icp_plus_rgbd

    def step(state: TrackerState, depth_mm, rgb, ext_delta):
        # --- preprocess (KintinuousTracker.cpp:465-479) ---
        filtered_mm = pp.bilateral_filter(
            depth_mm,
            cfg.bilateral_sigma_depth,
            cfg.bilateral_sigma_space,
            cfg.bilateral_radius,
        )
        depth_m = pp.depth_to_metres(filtered_mm, cfg.max_depth)
        curr_pyr = build_map_pyramid(cam, depth_m, levels)
        if use_rgbd:
            from kintinuous_tpu.ops.rgbd import build_rgbd_pyramid

            intensity = pp.rgb_to_intensity(rgb)
            curr_rgbd = build_rgbd_pyramid(intensity, depth_m, levels)
        else:
            curr_rgbd = None

        # --- odometry (KintinuousTracker.cpp:564-572) ---
        if use_odometry:
            Tinv = se3.inverse(state.pred_pose)
            Rm, tm = Tinv[:3, :3], Tinv[:3, 3]
            pv = jnp.einsum("ij,jhw->ihw", Rm, state.pred_vmap) + tm[:, None, None]
            pn = jnp.einsum("ij,jhw->ihw", Rm, state.pred_nmap)
            pred_pyr = pyramid_from_maps(pv, pn, levels)
            if use_rgbd:
                from kintinuous_tpu.ops.rgbd import rgbd_icp_odometry

                delta, icp_count, icp_res = rgbd_icp_odometry(
                    cam, curr_pyr, curr_rgbd, state.rgbd,
                    pred_pyr if (cfg.icp_plus_rgbd and not cfg.frame_to_frame_rgbd) else None,
                    iters,
                    icp_weight=cfg.rgbd_icp_weight,
                    dist_thresh=cfg.icp_dist_thresh,
                    angle_thresh_deg=cfg.icp_angle_thresh_deg,
                    jump_reject_m=cfg.rgbd_jump_reject,
                )
            else:
                delta, icp_count, icp_res = icp_odometry(
                    cam, curr_pyr, pred_pyr, iters,
                    cfg.icp_dist_thresh, cfg.icp_angle_thresh_deg,
                )
        else:
            delta = ext_delta
            icp_count = jnp.float32(0.0)
            icp_res = jnp.float32(0.0)

        pose = state.pose @ delta

        # --- volume shift (KintinuousTracker.cpp:675-831) ---
        vol = state.vol
        if cfg.static_mode:
            shift = jnp.zeros(3, jnp.int32)
            empty = ExtractResult(
                points=jnp.zeros((cap, 3), jnp.float32),
                colors=jnp.zeros((cap, 3), jnp.float32),
                weights=jnp.zeros((cap,), jnp.float32),
                count=jnp.int32(0),
            )
            slices = (empty, empty, empty)
        else:
            cam_off = pose[:3, 3] - center  # metres from volume center [x,y,z]
            shift = jnp.where(
                cam_off >= shift_thresh, S, jnp.where(cam_off <= -shift_thresh, -S, 0)
            ).astype(jnp.int32)

            def axis_slice(axis: int, size_xyz):
                s = shift[axis]

                def do_extract(v):
                    lo = jnp.zeros(3, jnp.int32)
                    lo = lo.at[axis].set(jnp.where(s > 0, 0, R - S - OV))
                    return extract_points(v, lo, size_xyz, vsz, cap,
                                          min_weight=1.0)

                def no_extract(v):
                    return ExtractResult(
                        points=jnp.zeros((cap, 3), jnp.float32),
                        colors=jnp.zeros((cap, 3), jnp.float32),
                        weights=jnp.zeros((cap,), jnp.float32),
                        count=jnp.int32(0),
                    )

                return jax.lax.cond(s != 0, do_extract, no_extract, vol)

            sx = axis_slice(0, (S + OV, R, R))
            sy = axis_slice(1, (R, S + OV, R))
            sz = axis_slice(2, (R, R, S + OV))
            slices = (sx, sy, sz)

            # clear the recycled bands — one fused masked pass over the
            # volume for all three axes (vs. 12 dedicated CUDA kernels,
            # tsdf_volume.cu:117-448)
            def band_mask(axis):
                s = shift[axis]
                lo = jnp.where(s > 0, 0, R - S)
                hi = jnp.where(s > 0, S, R)
                logical = jnp.mod(jnp.arange(R, dtype=jnp.int32) - vol.wrap[axis], R)
                return (s != 0) & (logical >= lo) & (logical < hi)

            bx, by, bz = band_mask(0), band_mask(1), band_mask(2)
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

        # --- fuse (KintinuousTracker.cpp:864-876) ---
        disc = pp.depth_discontinuity_mask(
            depth_m, radius=3, jump_m=cfg.depth_discontinuity_mm * 1e-3
        )
        vol = integrate(
            vol, cam, depth_m, rgb, disc, pose, vsz, cfg.trunc_dist,
            float(cfg.max_weight),
        )

        # --- predict (KintinuousTracker.cpp:880-899) ---
        rc = raycast(
            vol, cam, pose, vsz, cfg.volume_size, cfg.trunc_dist,
            cfg.raycast_step_factor, cfg.raycast_min_range, cfg.raycast_max_range,
        )

        pose_global = pose.at[:3, 3].add(vol.origin)
        new_state = TrackerState(
            vol=vol,
            pose=pose,
            pred_vmap=rc.vmap,
            pred_nmap=rc.nmap,
            pred_pose=pose,
            frame=state.frame + 1,
            rgbd=curr_rgbd,
        )
        out = StepOutputs(
            pose_local=pose,
            pose_global=pose_global,
            shift=shift,
            slices=slices,
            icp_count=icp_count,
            icp_residual=icp_res,
            raycast_hits=jnp.isfinite(rc.depth).sum().astype(jnp.float32),
        )
        return new_state, out

    return jax.jit(step, donate_argnums=(0,))


_AXIS_DIM = {
    (0, 1): "XPlus", (0, -1): "XMinus",
    (1, 1): "YPlus", (1, -1): "YMinus",
    (2, 1): "ZPlus", (2, -1): "ZMinus",
}


class Tracker:
    """Host wrapper: owns the device state, streams frames through the
    jitted step, and materialises slices/poses on the host.

    The public surface mirrors KintinuousTracker: process_frame,
    finalise, get_slices, current global pose.
    """

    def __init__(self, cfg: KintinuousConfig,
                 slice_callback: Optional[Callable[[CloudSlice], None]] = None):
        self.cfg = cfg
        self._step_odom = make_step(cfg, use_odometry=True)
        self._step_ext = make_step(cfg, use_odometry=False)
        cam = cfg.camera
        H, W = cam.height, cam.width
        init_pose = jnp.eye(4, dtype=jnp.float32)
        init_pose = init_pose.at[:3, 3].set(cfg.volume_size / 2.0)
        if cfg.rgbd_odometry or cfg.icp_plus_rgbd:
            from kintinuous_tpu.ops.rgbd import build_rgbd_pyramid

            init_rgbd = build_rgbd_pyramid(
                jnp.zeros((H, W), jnp.float32),
                jnp.zeros((H, W), jnp.float32),
                cfg.pyramid_levels,
            )
        else:
            init_rgbd = None
        # donated state fields must not alias each other
        self.state = TrackerState(
            vol=make_volume(cfg.volume_resolution),
            pose=init_pose,
            pred_vmap=jnp.full((3, H, W), jnp.nan, jnp.float32),
            pred_nmap=jnp.full((3, H, W), jnp.nan, jnp.float32),
            pred_pose=init_pose + 0.0,
            frame=jnp.int32(0),
            rgbd=init_rgbd,
        )
        self._pending: deque = deque()  # (out, timestamp_us, frame_idx)
        self.slices: List[CloudSlice] = []
        self.poses: List[np.ndarray] = []  # global poses per frame
        self.stamps_us: List[int] = []
        self.slice_callback = slice_callback
        self._frame_idx = 0
        self.stats = {"icp_count": [], "icp_residual": []}
        self.shift_log: List[np.ndarray] = []  # per-frame (3,) voxel shifts

    # ------------------------------------------------------------------
    def process_frame(
        self,
        depth_mm: np.ndarray,
        rgb: Optional[np.ndarray],
        timestamp_us: int,
        ext_delta: Optional[np.ndarray] = None,
    ) -> None:
        """Feed one frame. depth_mm: (H,W) uint16/float; rgb: (H,W,3)
        uint8 or None. ext_delta replaces on-device odometry (ground
        truth replay) when given; the first frame always uses identity."""
        d = jnp.asarray(np.asarray(depth_mm, np.float32))
        if rgb is None:
            rgb_f = jnp.zeros((*d.shape, 3), jnp.float32)
        else:
            rgb_f = jnp.asarray(np.asarray(rgb, np.float32))
        first = self._frame_idx == 0
        if ext_delta is not None or first:
            delta = jnp.asarray(
                np.eye(4, dtype=np.float32) if (first or ext_delta is None) else ext_delta
            )
            self.state, out = self._step_ext(self.state, d, rgb_f, delta)
        else:
            dummy = jnp.eye(4, dtype=jnp.float32)
            self.state, out = self._step_odom(self.state, d, rgb_f, dummy)
        self._pending.append((out, timestamp_us, self._frame_idx))
        self._frame_idx += 1
        # consume lagged outputs so downloads overlap device compute
        while len(self._pending) > 1:
            self._consume(*self._pending.popleft())

    def flush(self) -> None:
        while self._pending:
            self._consume(*self._pending.popleft())

    def _consume(self, out: StepOutputs, timestamp_us: int, frame_idx: int) -> None:
        pose_g = np.asarray(out.pose_global)
        self.poses.append(pose_g)
        self.stamps_us.append(timestamp_us)
        self.stats["icp_count"].append(float(out.icp_count))
        self.stats["icp_residual"].append(float(out.icp_residual))
        shift = np.asarray(out.shift)
        self.shift_log.append(shift)
        for axis in range(3):
            s = int(shift[axis])
            if s == 0:
                continue
            res = out.slices[axis]
            cnt = int(res.count)
            if cnt == 0:
                continue
            sl = CloudSlice(
                points=np.asarray(res.points[:cnt]),
                colors=np.clip(np.asarray(res.colors[:cnt]), 0, 255).astype(np.uint8),
                weights=np.asarray(res.weights[:cnt]),
                dimension=_AXIS_DIM[(axis, 1 if s > 0 else -1)],
                pose=pose_g,
                timestamp_us=timestamp_us,
                frame_index=frame_idx,
            )
            self.slices.append(sl)
            if self.slice_callback:
                self.slice_callback(sl)

    # ------------------------------------------------------------------
    def finalise(self) -> CloudSlice:
        """Extract the whole remaining volume as the FINAL slice
        (reference finalise, KintinuousTracker.cpp:1003-1048)."""
        self.flush()
        cfg = self.cfg
        R = cfg.volume_resolution
        res = jax.jit(
            lambda v: extract_points(
                v, jnp.zeros(3, jnp.int32), (R, R, R), cfg.voxel_size,
                cfg.extraction_capacity,
            )
        )(self.state.vol)
        cnt = int(res.count)
        pose = self.poses[-1] if self.poses else np.eye(4)
        ts = self.stamps_us[-1] if self.stamps_us else 0
        sl = CloudSlice(
            points=np.asarray(res.points[:cnt]),
            colors=np.clip(np.asarray(res.colors[:cnt]), 0, 255).astype(np.uint8),
            weights=np.asarray(res.weights[:cnt]),
            dimension="FINAL",
            pose=pose,
            timestamp_us=ts,
            frame_index=self._frame_idx,
        )
        self.slices.append(sl)
        if self.slice_callback:
            self.slice_callback(sl)
        return sl

    @property
    def global_pose(self) -> np.ndarray:
        self.flush()
        return self.poses[-1] if self.poses else np.eye(4)
