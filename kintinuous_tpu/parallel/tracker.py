"""Host wrapper around the multi-chip sharded tracking step.

Mirrors tracking.tracker.Tracker's public surface (process_frame /
flush / finalise / poses / slices / stats) so runtime.engine.SlamEngine
can run the FULL pipeline — slices -> backend -> saves — on a sharded
volume, the multi-chip analogue of the reference running everything as
one system (src/MainController.cpp:66-160). Per-chip extraction
buffers are concatenated on the host into the same CloudSlice records
the backend consumes (src/frontend/CloudSlice.h role).
"""

from __future__ import annotations

from collections import deque
from typing import Callable, List, Optional

import time as _time
import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.parallel.sharded import (
    make_sharded_extract,
    make_sharded_state,
    make_sharded_step,
)
from kintinuous_tpu.tracking.tracker import _AXIS_DIM, CloudSlice


def build_mesh(n_devices: int):
    """An n-device 1D mesh over the first n local devices (axis "z")."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"requested {n_devices} devices, only {len(devs)} available"
        )
    return Mesh(np.array(devs[:n_devices]), axis_names=("z",))


class ShardedTracker:
    """Tracker-compatible host wrapper over make_sharded_step."""

    def __init__(self, cfg: KintinuousConfig, mesh=None,
                 slice_callback: Optional[Callable[[CloudSlice], None]] = None,
                 mesh_callback=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else build_mesh(cfg.devices)
        self.n = self.mesh.shape["z"]
        if cfg.fast_mode:
            from kintinuous_tpu.parallel.fast_sharded import (
                make_fast_sharded_extract,
                make_fast_sharded_state,
                make_fast_sharded_step,
            )

            self._step_odom = make_fast_sharded_step(
                cfg, self.mesh, use_odometry=True
            )[0]
            self._step_ext = make_fast_sharded_step(
                cfg, self.mesh, use_odometry=False
            )[0]
            self._fetch_all = make_fast_sharded_extract(cfg, self.mesh)
            self.state = make_fast_sharded_state(cfg, self.mesh)
        else:
            self._step_odom = make_sharded_step(cfg, self.mesh, use_odometry=True)
            self._step_ext = make_sharded_step(cfg, self.mesh, use_odometry=False)
            self._fetch_all = make_sharded_extract(cfg, self.mesh)
            self.state = make_sharded_state(cfg, self.mesh)
        self._batched = None  # lazily built scanned multi-frame dispatch
        self._pending_batches: deque = deque()
        self._pending: deque = deque()
        self.slices: List[CloudSlice] = []
        self.mesh_patches: List = []
        self.poses: List[np.ndarray] = []
        self.stamps_us: List[int] = []
        self.slice_callback = slice_callback
        self.pose_callback: Optional[Callable] = None
        self.mesh_callback = mesh_callback
        self._frame_idx = 0
        self.stats = {
            "icp_count": [], "icp_residual": [], "raycast_fallback": [],
        }
        self.shift_log: List[np.ndarray] = []

    # ------------------------------------------------------------------
    def process_frame(self, depth_mm, rgb, timestamp_us: int,
                      ext_delta: Optional[np.ndarray] = None) -> None:
        d = jnp.asarray(np.asarray(depth_mm).astype(np.float32))
        if rgb is None:
            rgb_f = jnp.zeros((*d.shape, 3), jnp.float32)
        else:
            rgb_f = jnp.asarray(np.asarray(rgb).astype(np.float32))
        first = self._frame_idx == 0
        with self.mesh:
            if ext_delta is not None or first:
                delta = jnp.asarray(
                    np.eye(4, dtype=np.float32)
                    if (first or ext_delta is None) else ext_delta
                )
                self.state, out = self._step_ext(self.state, d, rgb_f, delta)
            else:
                dummy = jnp.eye(4, dtype=jnp.float32)
                self.state, out = self._step_odom(self.state, d, rgb_f, dummy)
        self._pending.append((out, timestamp_us, self._frame_idx))
        self._frame_idx += 1
        while len(self._pending) > 1:
            self._consume(*self._pending.popleft())

    def flush(self) -> None:
        while self._pending:
            self._consume(*self._pending.popleft())
        while self._pending_batches:
            self._consume_batch(*self._pending_batches.popleft())

    # ---------------------------------------------------- batched path
    def upload_batch(self, frames):
        """Host->device upload of (depth, rgb, ts) frames for
        process_batch_device (mirrors Tracker.upload_batch)."""
        H, W = self.cfg.camera.height, self.cfg.camera.width
        depths = np.stack([np.asarray(f[0], np.uint16) for f in frames])
        rgbs = np.stack(
            [
                np.asarray(f[1], np.uint8)
                if f[1] is not None else np.zeros((H, W, 3), np.uint8)
                for f in frames
            ]
        )
        return jnp.asarray(depths), jnp.asarray(rgbs), [f[2] for f in frames]

    def process_batch_device(self, depths_j, rgbs_j, ts_list) -> None:
        """Scanned multi-frame dispatch over the sharded step — ONE
        device round-trip per batch (fast_mode only; the single-chip
        analogue is Tracker.process_batch_device)."""
        assert self.cfg.fast_mode, "batched sharded dispatch needs fast_mode"
        assert not self.cfg.incremental_mesh, (
            "sharded incremental mesh runs per-frame (the multi-chip "
            "engine path); the batched wrapper does not pool mesh patches"
        )
        assert self._frame_idx > 0, "first frame must go through process_frame"
        from kintinuous_tpu.parallel.fast_sharded import (
            make_batched_fast_sharded_step,
        )

        self.flush()
        B = int(depths_j.shape[0])
        if self._batched is None:
            self._batched = {}
        if B not in self._batched:
            self._batched[B] = make_batched_fast_sharded_step(
                self.cfg, self.mesh, use_odometry=True, batch=B
            )
        deltas = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
        with self.mesh:
            self.state, ys, pool, events, ctr = self._batched[B](
                self.state, depths_j, rgbs_j, deltas
            )
        self._frame_idx += B
        self._pending_batches.append((ys, pool, events, ctr, list(ts_list), B))
        while len(self._pending_batches) > 1:
            self._consume_batch(*self._pending_batches.popleft())

    def process_frames(self, frames) -> None:
        """Batched offline path over pre-assembled (depth, rgb, ts)."""
        while frames and self._frame_idx == 0:
            d, c, ts = frames[0]
            self.process_frame(d, c, ts)
            frames = frames[1:]
        if not frames:
            return
        self.process_batch_device(*self.upload_batch(frames))
        self.flush()

    def _consume_batch(self, ys, pool, events, ctr, ts_list, B) -> None:
        """Emit every pooled shift event as a CloudSlice, concatenating
        the per-chip pool segments (each chip appended its slab-local
        extraction at its own offset; the event list is replicated)."""
        poses_g, shifts, counts, resids, fallbacks, events_h, ctr_h = (
            jax.device_get((ys[0], ys[1], ys[2], ys[3], ys[4], events, ctr))
        )
        for k, ts in enumerate(ts_list):
            self.poses.append(np.asarray(poses_g[k]))
            self.stamps_us.append(ts)
            if self.pose_callback:
                self.pose_callback(ts, self.poses[-1])
            self.stats["icp_count"].append(float(counts[k]))
            self.stats["icp_residual"].append(float(resids[k]))
            self.stats["raycast_fallback"].append(float(fallbacks[k]))
            self.shift_log.append(np.asarray(shifts[k]))
        ctr_h = np.asarray(ctr_h)  # (n, 3): [off, n_events, dropped]
        events_h = np.asarray(events_h).reshape(self.n, -1, 5)
        n_events = int(ctr_h[:, 1].max())
        dropped = int(ctr_h[:, 2].sum())
        if dropped:
            self.stats.setdefault("batch_slices_dropped", []).append(dropped)
        pts_h, cols_h, wts_h = (np.asarray(a) for a in pool)
        seg = pts_h.shape[0] // self.n  # per-chip pool rows (Pc + cap)
        for e in range(n_events):
            fidx = int(events_h[0, e, 0])
            axis = int(events_h[0, e, 1])
            s = int(events_h[0, e, 4])
            segs_p, segs_c, segs_w = [], [], []
            for k in range(self.n):
                off = int(events_h[k, e, 2])
                cnt = int(events_h[k, e, 3])
                if cnt == 0:
                    continue
                lo = k * seg + off
                segs_p.append(pts_h[lo:lo + cnt])
                segs_c.append(cols_h[lo:lo + cnt])
                segs_w.append(wts_h[lo:lo + cnt])
            if not segs_p:
                continue
            sl = CloudSlice(
                points=np.concatenate(segs_p),
                colors=np.clip(np.concatenate(segs_c), 0, 255).astype(np.uint8),
                weights=np.concatenate(segs_w),
                dimension=_AXIS_DIM[(axis, 1 if s > 0 else -1)],
                pose=np.asarray(poses_g[fidx]),
                timestamp_us=ts_list[fidx],
                frame_index=len(self.poses) - B + fidx,
                wall_time=_time.time(),
            )
            self.slices.append(sl)
            if self.slice_callback:
                self.slice_callback(sl)

    def _concat_chips(self, res) -> tuple:
        """Per-chip stacked ExtractResult -> (points, colors, weights)."""
        counts = np.asarray(res.count)
        cap = res.points.shape[0] // self.n
        pts, cols, wgts = (np.asarray(res.points), np.asarray(res.colors),
                          np.asarray(res.weights))
        segs_p, segs_c, segs_w = [], [], []
        for k in range(self.n):
            c = int(counts[k])
            if c == 0:
                continue
            segs_p.append(pts[k * cap: k * cap + c])
            segs_c.append(cols[k * cap: k * cap + c])
            segs_w.append(wgts[k * cap: k * cap + c])
        if not segs_p:
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                    np.zeros((0,), np.float32))
        return (np.concatenate(segs_p), np.concatenate(segs_c),
                np.concatenate(segs_w))

    def _consume(self, out, timestamp_us: int, frame_idx: int) -> None:
        pose_g = np.asarray(out.pose_global)
        self.poses.append(pose_g)
        self.stamps_us.append(timestamp_us)
        if self.pose_callback:
            self.pose_callback(timestamp_us, pose_g)
        self.stats["icp_count"].append(float(out.icp_count))
        self.stats["icp_residual"].append(float(out.icp_residual))
        self.stats["raycast_fallback"].append(float(out.raycast_fallback))
        shift = np.asarray(out.shift)
        self.shift_log.append(shift)
        for axis in range(3):
            s = int(shift[axis])
            if s == 0:
                continue
            p, c, w = self._concat_chips(out.slices[axis])
            if len(p) == 0:
                continue
            sl = CloudSlice(
                points=p,
                colors=np.clip(c, 0, 255).astype(np.uint8),
                weights=w,
                dimension=_AXIS_DIM[(axis, 1 if s > 0 else -1)],
                pose=pose_g,
                timestamp_us=timestamp_us,
                frame_index=frame_idx,
                wall_time=_time.time(),
            )
            self.slices.append(sl)
            if self.slice_callback:
                self.slice_callback(sl)
            if self.cfg.incremental_mesh and out.mesh_patches:
                self._take_mesh_patch(out.mesh_patches[axis], timestamp_us)

    def _take_mesh_patch(self, res, timestamp_us: int) -> None:
        """Replicated per-axis band MeshResult -> host MeshPatch
        (mirrors tracking.tracker.Tracker._take_mesh_patch)."""
        from kintinuous_tpu.backend.meshing import MeshPatch

        nv, nf = int(res.n_vertices), int(res.n_faces)
        if nv == 0 or nf == 0:
            return
        patch = MeshPatch(
            vertices=np.asarray(res.vertices[:nv]),
            colors=np.clip(np.asarray(res.colors[:nv]), 0, 255).astype(
                np.uint8
            ),
            faces=np.asarray(res.faces[:nf]),
            timestamp_us=timestamp_us,
            cells=np.asarray(res.cells[:nv]),
        )
        self.mesh_patches.append(patch)
        if self.mesh_callback:
            self.mesh_callback(patch)

    # ------------------------------------------------------------------
    def finalise(self) -> CloudSlice:
        """Whole-remaining-volume FINAL slice, extracted slab-locally
        (KintinuousTracker.cpp:1003-1048)."""
        self.flush()
        with self.mesh:
            res = self._fetch_all(self.state.vol)
        p, c, w = self._concat_chips(res)
        pose = self.poses[-1] if self.poses else np.eye(4)
        ts = self.stamps_us[-1] if self.stamps_us else 0
        sl = CloudSlice(
            points=p,
            colors=np.clip(c, 0, 255).astype(np.uint8),
            weights=w,
            dimension="FINAL",
            pose=pose,
            timestamp_us=ts,
            frame_index=self._frame_idx,
            wall_time=_time.time(),
        )
        self.slices.append(sl)
        if self.slice_callback:
            self.slice_callback(sl)
        if self.cfg.incremental_mesh:
            # whole live-volume mesh patch, welded with the band patches
            # at save (single-chip finalise parity)
            from kintinuous_tpu.backend.meshing import mesh_current_volume

            patch = mesh_current_volume(self, self.cfg)
            if len(patch.vertices):
                patch.timestamp_us = ts
                self.mesh_patches.append(patch)
                if self.mesh_callback:
                    self.mesh_callback(patch)
        return sl

    @property
    def global_pose(self) -> np.ndarray:
        self.flush()
        return self.poses[-1] if self.poses else np.eye(4)
