"""`.klg` RGB-D log reading/writing.

On-disk format (reference: src/utils/RawLogReader.cpp:29,52-64):

    int32  numFrames
    repeated numFrames times:
        int64  timestamp (microseconds)
        int32  depthSize (compressed bytes)
        int32  imageSize (compressed bytes; 0 => no rgb frame)
        bytes  depth  — zlib-compressed uint16 little-endian, H*W
        bytes  rgb    — JPEG, H x W x 3

The reference decodes on its tracker thread (zlib `uncompress`
RawLogReader.cpp:110, `cv::imdecode` :85); here decoding runs on a small
thread pool that prefetches ahead of the consumer, so host decode
overlaps TPU compute instead of serialising with it.
"""

from __future__ import annotations

import struct
import threading
import zlib
from collections import deque
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

_HEADER = struct.Struct("<i")
_FRAME_HEADER = struct.Struct("<qii")


@dataclass
class Frame:
    timestamp: int  # microseconds
    depth: np.ndarray  # (H, W) uint16, raw sensor units (mm)
    rgb: Optional[np.ndarray]  # (H, W, 3) uint8 RGB or None
    index: int


def _decode_rgb(buf: bytes) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    if cv2 is not None:
        bgr = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        return bgr[:, :, ::-1].copy()  # BGR -> RGB (ref flips too, RawLogReader.cpp:122-130)
    from PIL import Image  # pragma: no cover
    import io as _io

    return np.asarray(Image.open(_io.BytesIO(buf)).convert("RGB"))


def _encode_rgb(rgb: np.ndarray, quality: int = 90) -> bytes:
    if cv2 is not None:
        ok, buf = cv2.imencode(".jpg", rgb[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality])
        assert ok
        return buf.tobytes()
    from PIL import Image  # pragma: no cover
    import io as _io

    b = _io.BytesIO()
    Image.fromarray(rgb).save(b, format="JPEG", quality=quality)
    return b.getvalue()


class KlgLogReader:
    """Sequential `.klg` reader with background decode prefetch.

    Mirrors LogReader::grabNext (src/utils/LogReader.h:46) as a Python
    iterator; `total_num_frames` is read from the header like
    RawLogReader.cpp:36-39.
    """

    def __init__(
        self,
        path: str,
        width: int = 640,
        height: int = 480,
        prefetch: int = 8,
        max_frames: int = -1,
    ):
        self.path = path
        self.width = width
        self.height = height
        self._f = open(path, "rb")
        (self.total_num_frames,) = _HEADER.unpack(self._f.read(_HEADER.size))
        if max_frames > 0:
            self.total_num_frames = min(self.total_num_frames, max_frames)
        self._prefetch = max(1, prefetch)
        self._queue: deque = deque()
        self._cond = threading.Condition()
        self._next_read = 0
        self._done = False
        self._thread = threading.Thread(target=self._reader_loop, daemon=True)
        self._thread.start()

    def _read_one(self) -> Optional[Frame]:
        hdr = self._f.read(_FRAME_HEADER.size)
        if len(hdr) < _FRAME_HEADER.size:
            return None
        ts, depth_size, img_size = _FRAME_HEADER.unpack(hdr)
        depth_buf = self._f.read(depth_size)
        img_buf = self._f.read(img_size) if img_size > 0 else b""
        depth_raw = zlib.decompress(depth_buf)
        depth = np.frombuffer(depth_raw, dtype="<u2").reshape(self.height, self.width)
        rgb = _decode_rgb(img_buf) if img_buf else None
        frame = Frame(timestamp=ts, depth=depth, rgb=rgb, index=self._next_read)
        self._next_read += 1
        return frame

    def _reader_loop(self):
        while True:
            with self._cond:
                while len(self._queue) >= self._prefetch and not self._done:
                    self._cond.wait()
                if self._done:
                    return
            if self._next_read >= self.total_num_frames:
                frame = None
            else:
                try:
                    frame = self._read_one()
                except Exception:
                    frame = None
            with self._cond:
                self._queue.append(frame)
                self._cond.notify_all()
                if frame is None:
                    return

    def __iter__(self) -> Iterator[Frame]:
        while True:
            with self._cond:
                while not self._queue:
                    self._cond.wait()
                frame = self._queue.popleft()
                self._cond.notify_all()
            if frame is None:
                return
            yield frame

    def close(self):
        with self._cond:
            self._done = True
            self._cond.notify_all()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class KlgLogWriter:
    """Writes `.klg` logs (used by the synthetic dataset generator)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self._f.write(_HEADER.pack(0))
        self._count = 0

    def write(self, timestamp: int, depth: np.ndarray, rgb: Optional[np.ndarray]):
        assert depth.dtype == np.uint16
        depth_buf = zlib.compress(depth.astype("<u2").tobytes())
        img_buf = _encode_rgb(rgb) if rgb is not None else b""
        self._f.write(_FRAME_HEADER.pack(int(timestamp), len(depth_buf), len(img_buf)))
        self._f.write(depth_buf)
        self._f.write(img_buf)
        self._count += 1

    def close(self):
        self._f.seek(0)
        self._f.write(_HEADER.pack(self._count))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
