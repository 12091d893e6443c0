"""Command-line interface.

Flag-for-flag compatible with the reference CLI
(src/utils/ConfigArgs.h:124-160, README.md:132-161):

    -l  <log.klg>      RawLogReader input
    -live <addr>       live capture socket (LiveLogReader role)
    -p  <traj>         ground-truth trajectory replay
    -v  <vocab.npy>    BoW vocabulary file
    -c  <calib>        calibration: "fx fy cx cy [w h]" text file
    -s  <m>            volume size (default 6)
    -t  <voxels>       shift threshold in voxels (default 14, clamp 1-16)
    -n  <frames>       frame limit
    -cw <n>            extracted-point weight cull (default 8)
    -lt <s>            loop throttle seconds (default 30)
    -dg <m>            dense sampling rate for the deformation graph
    -il <ratio>        PnP/registration inlier-ratio gate (default 0.35)
    -it <thresh>       pose-graph residual gate (default 10)
    -f                 flip RGB/BGR colours at ingest
    -sm                static mode (no shifting)
    -m                 mesh output
    -od                online deformation (loop closure)
    -no                disable shift-overlap extraction
    -nos               disable overlap removal on save
    -r                 RGB-D odometry
    -ri                fused ICP + RGB-D odometry
    -ftf               frame-to-frame RGB-D
    -fod               fast odometry
    -fl                fast loops (pose subsampling)
    -d                 dynamic cube positioning
    -dc                disable colour view-angle weighting
    -o  <basename>     output basename (default "output")

Extras beyond the reference: --fast (TPU blocked fast path),
--resolution, --trunc, --viz-port (web viewer), --frame-limit (30 Hz
throttle), --prior (constant-velocity odometry prior weight).

Usage: python -m kintinuous_tpu.cli -l seq.klg -v vocab.npy -m -od -o mymap
"""

from __future__ import annotations

import argparse
import sys

from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig


def load_calibration(path: str, width=640, height=480) -> CameraIntrinsics:
    """Parses the reference's text calibration: `fx fy cx cy [w h]`
    (MainController::loadCalibration, MainController.cpp:184-231)."""
    with open(path) as f:
        vals = f.read().replace(",", " ").split()
    vals = [float(v) for v in vals]
    if len(vals) >= 6:
        width, height = int(vals[4]), int(vals[5])
    return CameraIntrinsics(
        fx=vals[0], fy=vals[1], cx=vals[2], cy=vals[3], width=width, height=height
    )


def build_config(argv) -> KintinuousConfig:
    p = argparse.ArgumentParser(
        prog="kintinuous_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("-l", dest="log_file")
    p.add_argument(
        "-live", dest="live_source",
        help="live capture from a sensor daemon socket (host:port or "
             "unix path) — the LiveLogReader/OpenNI2 role",
    )
    p.add_argument("-p", dest="trajectory_file")
    p.add_argument("-v", dest="vocab_file")
    p.add_argument("-c", dest="calibration")
    p.add_argument("-s", dest="volume_size", type=float, default=6.0)
    p.add_argument("-t", dest="voxel_shift", type=int, default=14)
    p.add_argument("-n", dest="total_num_frames", type=int, default=-1)
    p.add_argument("-cw", dest="weight_cull", type=int, default=8)
    p.add_argument("-lt", dest="loop_throttle", type=float, default=30.0)
    p.add_argument("-dg", dest="dense_sampling", type=float, default=0.8)
    p.add_argument("-il", dest="inlier_ratio", type=float, default=0.35)
    p.add_argument("-it", dest="isam_thresh", type=float, default=10.0)
    p.add_argument("-f", dest="flip_colors", action="store_true")
    p.add_argument("-sm", dest="static_mode", action="store_true")
    p.add_argument("-m", dest="mesh", action="store_true")
    p.add_argument("-od", dest="online_deformation", action="store_true")
    p.add_argument("-no", dest="no_overlap", action="store_true")
    p.add_argument("-nos", dest="no_save_overlap", action="store_true")
    p.add_argument("-r", dest="rgbd", action="store_true")
    p.add_argument("-ri", dest="rgbd_icp", action="store_true")
    p.add_argument("-ftf", dest="ftf", action="store_true")
    p.add_argument("-fod", dest="fast_odometry", action="store_true")
    p.add_argument("-fl", dest="fast_loops", action="store_true")
    p.add_argument("-d", dest="dynamic_cube", action="store_true")
    p.add_argument("-dc", dest="no_color_angle", action="store_true")
    p.add_argument("-o", dest="save_file", default="output")
    p.add_argument("--trunc", dest="trunc_dist", type=float, default=0.03)
    p.add_argument("--frame-limit", dest="frame_limit", action="store_true")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument(
        "--viz-port", dest="viz_port", type=int, default=None,
        help="serve the live web viewer (PangoVis role) on this port",
    )
    p.add_argument(
        "--fast", dest="fast_mode", action="store_true",
        help="blocked fast path: sparse TSDF updates + warm raycast + batched dispatch",
    )
    p.add_argument(
        "--prior", dest="odom_prior_weight", type=float, default=0.0,
        help="constant-velocity odometry prior weight (0 = off, the "
             "reference's identity start; ~0.01 pins near-null motion "
             "directions — see config.odom_prior_weight)",
    )
    p.add_argument(
        "--profile-dir", dest="profile_dir", type=str, default=None,
        help="write a jax.profiler trace of the run to this directory "
             "(view with TensorBoard / Perfetto)",
    )
    p.add_argument(
        "--dump-tsdf", dest="dump_tsdf", type=str, default=None,
        help="save the raw TSDF volume (tsdf + packed color/weight + "
             "origin) to this .npz at exit — the reference's debug "
             "voxel-grid dump (TSDFVolume.cpp:203-227)",
    )
    p.add_argument(
        "--devices", dest="devices", type=int, default=1,
        help="shard the volume into z-slabs over N chips (ICI mesh)",
    )
    p.add_argument(
        "--num-processes", dest="num_processes", type=int, default=1,
        help="jax.distributed process count (multi-host over DCN)",
    )
    p.add_argument(
        "--process-id", dest="process_id", type=int, default=0,
        help="this process's id in the multi-host run",
    )
    p.add_argument(
        "--coordinator", dest="coordinator", type=str, default=None,
        help="host:port of process 0's jax.distributed coordinator",
    )
    a = p.parse_args(argv)
    if not a.log_file and not a.live_source:
        p.error("one of -l <log.klg> or -live <address> is required")

    cam = load_calibration(a.calibration) if a.calibration else CameraIntrinsics()
    return KintinuousConfig(
        log_file=a.log_file,
        live_source=a.live_source,
        trajectory_file=a.trajectory_file,
        vocab_file=a.vocab_file,
        camera=cam,
        volume_size=a.volume_size,
        volume_resolution=a.resolution,
        voxel_shift=a.voxel_shift,
        total_num_frames=a.total_num_frames,
        trunc_dist=a.trunc_dist,
        weight_cull=a.weight_cull,
        loop_throttle_s=a.loop_throttle,
        dense_sampling_rate=a.dense_sampling,
        inlier_ratio=a.inlier_ratio,
        isam_thresh=a.isam_thresh,
        flip_colors=a.flip_colors,
        color_angle_weight=not a.no_color_angle,
        shift_overlap=0 if a.no_overlap else 3,
        save_deoverlap=not a.no_save_overlap,
        frame_rate_limit=30.0 if a.frame_limit else None,
        static_mode=a.static_mode,
        mesh=a.mesh,
        online_deformation=a.online_deformation,
        rgbd_odometry=a.rgbd,
        icp_plus_rgbd=a.rgbd_icp,
        odom_prior_weight=a.odom_prior_weight,
        frame_to_frame_rgbd=a.ftf,
        fast_odometry=a.fast_odometry,
        fast_loops=a.fast_loops,
        dynamic_cube=a.dynamic_cube,
        save_file=a.save_file,
        fast_mode=a.fast_mode,
        devices=a.devices,
        num_processes=a.num_processes,
        process_id=a.process_id,
        coordinator=a.coordinator,
    )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]

    def strarg(flag):
        if flag in argv:
            return argv[argv.index(flag) + 1]
        return None

    viz_port = strarg("--viz-port")
    viz_port = int(viz_port) if viz_port is not None else None
    profile_dir = strarg("--profile-dir")
    dump_tsdf = strarg("--dump-tsdf")
    cfg = build_config(argv)
    from kintinuous_tpu.runtime.engine import SlamEngine

    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    engine = SlamEngine(cfg)
    viewer = None
    if viz_port is not None:
        from kintinuous_tpu.viz.server import ViewerServer

        viewer = ViewerServer(engine, port=viz_port)
        print(f"viewer: http://127.0.0.1:{viewer.port}/")

    def progress(done, total):
        if done % 30 == 0 or done == total:
            print(
                f"\rframe {done}/{total}  {engine.fps:.1f} fps", end="", flush=True
            )

    engine.run(progress=progress)
    print()
    outputs = engine.save()
    if profile_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace: {profile_dir}")
    if dump_tsdf:
        import numpy as np

        vol = engine.tracker.state.vol
        np.savez_compressed(
            dump_tsdf,
            tsdf=np.asarray(vol.tsdf), cw=np.asarray(vol.cw),
            wrap=np.asarray(vol.wrap), origin=np.asarray(vol.origin),
            blocked=np.asarray(engine.cfg.fast_mode),
        )
        print(f"saved tsdf dump: {dump_tsdf}")
    for kind, path in outputs.items():
        print(f"saved {kind}: {path}")
    stats = engine.sw.stats()
    for name in ("processFrame", "SliceProcessor", "PlaceRecognition", "Deformation"):
        if name in stats:
            s = stats[name]
            print(f"{name}: mean {s['mean_ms']:.1f} ms over {s['count']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
