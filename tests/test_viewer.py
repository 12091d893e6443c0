"""Web viewer server: endpoints + control proxies (PangoVis role)."""

import json
import struct
import urllib.request

import numpy as np

from kintinuous_tpu.config import tiny_test_config
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame
from kintinuous_tpu.runtime.engine import SlamEngine
from kintinuous_tpu.viz.server import ViewerServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.read()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def test_viewer_endpoints(tmp_path):
    cfg = tiny_test_config(voxel_shift=4, save_file=str(tmp_path / "v"))
    cam = cfg.camera
    eng = SlamEngine(cfg)
    viewer = ViewerServer(eng, port=0)  # ephemeral port
    try:
        # feed a few frames (sideways walk forces a shift + slices)
        poses = orbit_trajectory(6, radius=0.4, angle_deg=0.0)
        for i, T in enumerate(poses):
            d, c = render_frame(Scene.default(), cam, T)
            eng.tracker.process_frame(np.asarray(d), np.asarray(c), i * 33333)
        eng.tracker.flush()
        # drain slices synchronously (no worker threads in this test)
        while not eng.slice_q.empty():
            eng.slice_proc.process(eng.slice_q.get())

        page = _get(viewer.port, "/").decode()
        assert "<canvas" in page and "cloud.bin" in page

        st = json.loads(_get(viewer.port, "/state.json"))
        assert st["frame"] == 6
        assert len(st["traj"]) == 6
        assert st["status"] in ("tracking", "finished")
        # frusta for the 3D view (PangoVis.cpp:421-436 role)
        assert len(st["frusta"]) >= 1
        assert len(st["frusta"][-1]) == 12
        assert "n_triangles" in st and "backend_lag_s" in st

        blob = _get(viewer.port, "/cloud.bin")
        (n,) = struct.unpack("<I", blob[:4])
        assert len(blob) == 4 + n * 12 + n * 3
        if n:
            pts = np.frombuffer(blob[4 : 4 + 12 * n], np.float32).reshape(n, 3)
            assert np.isfinite(pts).all()

        # control proxies
        assert _post(viewer.port, "/control", {"cmd": "pause"})["ok"]
        assert eng.paused.is_set()
        assert _post(viewer.port, "/control", {"cmd": "pause"})["ok"]
        assert not eng.paused.is_set()
        assert _post(viewer.port, "/control", {"cmd": "complete"})["ok"]
        assert eng.stop_requested.is_set()
        assert not _post(viewer.port, "/control", {"cmd": "bogus"})["ok"]
    finally:
        viewer.close()


def test_viewer_panes(tmp_path):
    cfg = tiny_test_config(save_file=str(tmp_path / "p"))
    cam = cfg.camera
    eng = SlamEngine(cfg)
    viewer = ViewerServer(eng, port=0)
    try:
        d, c = render_frame(Scene.default(), cam, orbit_trajectory(1)[0])
        eng.tracker.process_frame(np.asarray(d), np.asarray(c), 0)
        eng.tracker.flush()
        eng.last_frame = (np.asarray(d), np.asarray(c))
        for name in ("rgb", "depth", "model", "model_depth"):
            png = _get(viewer.port, f"/pane/{name}.png")
            assert png[:8] == b"\x89PNG\r\n\x1a\n", name
    finally:
        viewer.close()


def test_viewer_mesh_endpoint(tmp_path):
    """mesh.bin serves the cell-welded incremental mesh for the 3D view
    (PangoVis.cpp:343-390 mesh draw role)."""
    from kintinuous_tpu.backend.meshing import MeshPatch

    cfg = tiny_test_config(save_file=str(tmp_path / "m"))
    eng = SlamEngine(cfg)
    viewer = ViewerServer(eng, port=0)
    try:
        # empty mesh
        blob = _get(viewer.port, "/mesh.bin")
        assert struct.unpack("<I", blob[:4])[0] == 0
        # two overlapping patches with shared cells weld to one mesh
        cells1 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.int32)
        cells2 = np.array([[1, 0, 0], [0, 1, 0], [1, 1, 0]], np.int32)
        mk = lambda cells: MeshPatch(
            vertices=cells.astype(np.float32) * 0.01,
            colors=np.full((3, 3), 128, np.uint8),
            faces=np.array([[0, 1, 2]], np.int32),
            cells=cells,
        )
        eng.tracker.mesh_patches = [mk(cells1), mk(cells2)]
        st = json.loads(_get(viewer.port, "/state.json"))
        assert st["n_triangles"] == 2
        blob = _get(viewer.port, "/mesh.bin")
        (nv,) = struct.unpack("<I", blob[:4])
        assert nv == 4  # 6 verts weld to 4 unique cells
        off = 4 + 12 * nv + 3 * nv
        off += (4 - off % 4) % 4
        (nf,) = struct.unpack("<I", blob[off : off + 4])
        faces = np.frombuffer(
            blob[off + 4 : off + 4 + 12 * nf], np.uint32
        ).reshape(nf, 3)
        assert nf == 2 and faces.max() < nv
    finally:
        viewer.close()
