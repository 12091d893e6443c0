"""Live RGB-D capture source.

Reference parity: src/utils/LiveLogReader.{h,cpp} + OpenNI2Interface
(LiveLogReader.cpp:63-85 polls a 10-deep ring buffer that OpenNI2
callbacks fill; grabs always return the LATEST pair, dropping stale
frames). This environment has no physical sensor or OpenNI2, so the
transport is a socket: any camera daemon (or the bundled synthetic
sensor server) streams frames over a UNIX or TCP socket using the
same per-frame wire format as .klg logs:

    int64 timestamp_us, int32 depth_bytes, int32 rgb_bytes,
    zlib(uint16 depth[h*w]), jpeg(rgb)    (RawLogReader.cpp:52-64)

A listener thread decompresses into a ring of RING_SIZE frames;
`grab_next()` blocks until at least one frame exists, then returns the
newest (live semantics — never replays a backlog). The object exposes
the same surface as KlgLogReader (`grab_next`, iteration, context
manager), so TrackerInterface-style consumers take either
interchangeably (reference LogReader.h:46 interface role).
"""

from __future__ import annotations

import socket
import struct
import threading
import time
import zlib
from typing import Iterator, Optional

import numpy as np

from kintinuous_tpu.io.klg import Frame, _decode_rgb

_FRAME_HDR = struct.Struct("<qii")
RING_SIZE = 10  # reference OpenNI2Interface.h ring depth


class LiveLogReader:
    """Streams live frames from a sensor daemon socket."""

    def __init__(
        self,
        address,  # "host:port" string or a unix socket path
        width: int = 640,
        height: int = 480,
        timeout_s: float = 10.0,
    ):
        self.width = width
        self.height = height
        self.timeout_s = timeout_s
        self.total_num_frames = -1  # unbounded, like the reference
        self._ring: list = []  # [(seq, Frame)]
        self._seq = 0
        self._last_returned = -1
        self._lock = threading.Lock()
        self._have = threading.Condition(self._lock)
        self._stop = threading.Event()
        self._sock = self._connect(address)
        self._thread = threading.Thread(target=self._listen, daemon=True)
        self._thread.start()

    @staticmethod
    def _connect(address):
        if isinstance(address, str) and ":" in address:
            host, port = address.rsplit(":", 1)
            s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            s.connect((host, int(port)))
        else:
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.connect(address)
        return s

    def _recv_exact(self, n: int) -> Optional[bytes]:
        buf = b""
        while len(buf) < n:
            try:
                chunk = self._sock.recv(n - len(buf))
            except OSError:
                return None
            if not chunk:
                return None
            buf += chunk
        return buf

    def _listen(self):
        while not self._stop.is_set():
            hdr = self._recv_exact(_FRAME_HDR.size)
            if hdr is None:
                break
            ts, dlen, clen = _FRAME_HDR.unpack(hdr)
            dbuf = self._recv_exact(dlen)
            cbuf = self._recv_exact(clen) if clen else b""
            if dbuf is None or (clen and cbuf is None):
                break
            depth = np.frombuffer(
                zlib.decompress(dbuf), np.uint16
            ).reshape(self.height, self.width)
            rgb = (
                _decode_rgb(cbuf)
                if cbuf
                else np.zeros((self.height, self.width, 3), np.uint8)
            )
            fr = Frame(timestamp=ts, depth=depth, rgb=rgb, index=self._seq)
            with self._have:
                self._ring.append((self._seq, fr))
                self._seq += 1
                if len(self._ring) > RING_SIZE:
                    self._ring = self._ring[-RING_SIZE:]
                self._have.notify_all()
        with self._have:
            self._stop.set()
            self._have.notify_all()

    def grab_next(self) -> Optional[Frame]:
        """Latest unseen frame, or None when the stream ended. Blocks
        until a NEW frame arrives (reference LiveLogReader.cpp:63-85
        semantics: always the freshest pair, stale ones dropped)."""
        deadline = time.monotonic() + self.timeout_s
        with self._have:
            while True:
                if self._ring and self._ring[-1][0] > self._last_returned:
                    seq, fr = self._ring[-1]
                    self._last_returned = seq
                    return fr
                if self._stop.is_set():
                    return None
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return None
                self._have.wait(timeout=remaining)

    @property
    def dropped_frames(self) -> int:
        """Frames produced by the sensor but never returned."""
        return self._seq - (self._last_returned + 1) - len(
            [1 for s, _ in self._ring if s > self._last_returned]
        )

    def __iter__(self) -> Iterator[Frame]:
        while True:
            fr = self.grab_next()
            if fr is None:
                return
            yield fr

    def close(self):
        self._stop.set()
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()
        self._thread.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class SyntheticSensorServer:
    """A stand-in camera daemon: renders the synthetic scene along a
    trajectory and streams klg-format frames at `fps` over a socket.
    Used by tests and demos in lieu of OpenNI2 hardware."""

    def __init__(self, address, cam, poses, fps: float = 30.0,
                 scene=None, loop: bool = False):
        from kintinuous_tpu.io.klg import _encode_rgb
        from kintinuous_tpu.io.synth import Scene, render_frame

        self._encode_rgb = _encode_rgb
        self.address = address
        self.cam = cam
        self.fps = fps
        self.loop = loop
        scene = scene or Scene.default()
        self.frames = []
        for T in poses:
            depth, rgb = render_frame(scene, cam, T)
            self.frames.append(
                (np.asarray(depth, np.uint16), np.asarray(rgb, np.uint8))
            )
        if isinstance(address, str) and ":" in address:
            host, port = address.rsplit(":", 1)
            self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._srv.bind((host, int(port)))
        else:
            self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._srv.bind(address)
        self._srv.listen(1)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        try:
            conn, _ = self._srv.accept()
        except OSError:
            return
        period = 1.0 / self.fps
        i = 0
        t0 = time.monotonic()
        try:
            while not self._stop.is_set():
                if i >= len(self.frames):
                    if not self.loop:
                        break
                    i = 0
                depth, rgb = self.frames[i]
                dbuf = zlib.compress(depth.tobytes(), 1)
                cbuf = self._encode_rgb(rgb)
                ts = int(i * 1e6 / self.fps)
                conn.sendall(
                    _FRAME_HDR.pack(ts, len(dbuf), len(cbuf)) + dbuf + cbuf
                )
                i += 1
                next_t = t0 + i * period
                delay = next_t - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
        except OSError:
            pass
        finally:
            try:
                conn.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            conn.close()

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        self._thread.join(timeout=3.0)
