"""Live capture source: socket streaming + latest-frame ring semantics
(reference LiveLogReader.cpp:63-85 / OpenNI2Interface ring buffer)."""

import os
import tempfile
import time

import numpy as np

from kintinuous_tpu.config import tiny_test_config
from kintinuous_tpu.io.live import LiveLogReader, SyntheticSensorServer
from kintinuous_tpu.io.synth import orbit_trajectory


def test_live_reader_receives_frames():
    cfg = tiny_test_config()
    cam = cfg.camera
    sock = os.path.join(tempfile.mkdtemp(), "sensor.sock")
    srv = SyntheticSensorServer(sock, cam, orbit_trajectory(6), fps=120.0)
    try:
        with LiveLogReader(sock, width=cam.width, height=cam.height,
                           timeout_s=5.0) as rdr:
            frames = []
            for fr in rdr:
                frames.append(fr)
                if len(frames) >= 3:
                    break
        assert len(frames) == 3
        for fr in frames:
            assert fr.depth.shape == (cam.height, cam.width)
            assert fr.depth.dtype == np.uint16
            assert fr.rgb.shape == (cam.height, cam.width, 3)
            assert (fr.depth > 0).mean() > 0.5  # scene visible
        # live semantics: timestamps strictly increase (no replays)
        ts = [f.timestamp for f in frames]
        assert ts == sorted(set(ts))
    finally:
        srv.close()


def test_live_reader_drops_stale_frames():
    """A slow consumer must skip ahead to the freshest frame."""
    cfg = tiny_test_config()
    cam = cfg.camera
    sock = os.path.join(tempfile.mkdtemp(), "sensor2.sock")
    srv = SyntheticSensorServer(sock, cam, orbit_trajectory(12), fps=240.0)
    try:
        with LiveLogReader(sock, width=cam.width, height=cam.height,
                           timeout_s=5.0) as rdr:
            first = rdr.grab_next()
            time.sleep(0.2)  # sensor races ahead ~48 frames
            later = rdr.grab_next()
        assert first is not None and later is not None
        # consumer skipped frames: gap larger than 1 period
        assert later.timestamp - first.timestamp > 2 * int(1e6 / 240)
    finally:
        srv.close()


def test_live_stream_end_returns_none():
    cfg = tiny_test_config()
    cam = cfg.camera
    sock = os.path.join(tempfile.mkdtemp(), "sensor3.sock")
    srv = SyntheticSensorServer(sock, cam, orbit_trajectory(2), fps=500.0)
    try:
        with LiveLogReader(sock, width=cam.width, height=cam.height,
                           timeout_s=5.0) as rdr:
            seen = list(rdr)
        assert 1 <= len(seen) <= 2
    finally:
        srv.close()


def test_engine_runs_from_live_source(tmp_path):
    """Full SlamEngine consuming the live socket (reference: running
    Kintinuous without -l uses LiveLogReader, MainController.cpp:80-89)."""
    from kintinuous_tpu.config import tiny_test_config
    from kintinuous_tpu.runtime.engine import SlamEngine

    cfg = tiny_test_config()
    cam = cfg.camera
    sock = str(tmp_path / "sensor.sock")
    # loop=True: a live sensor never stops; the engine leaves when it
    # has processed total_num_frames (latest-frame drops are expected
    # while the first jit compiles)
    srv = SyntheticSensorServer(
        sock, cam, orbit_trajectory(8), fps=60.0, loop=True
    )
    try:
        cfg2 = tiny_test_config(live_source=sock, total_num_frames=6,
                                save_file=str(tmp_path / "live_out"))
        eng = SlamEngine(cfg2)
        eng.run()
        assert len(eng.tracker.poses) == 6
    finally:
        srv.close()
