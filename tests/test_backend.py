import numpy as np
import jax
import jax.numpy as jnp

from kintinuous_tpu.backend.slice_proc import (
    SliceProcessor,
    estimate_normals,
    voxel_downsample,
)
from kintinuous_tpu.config import tiny_test_config
from kintinuous_tpu.io.pcd import load_pcd, save_pcd
from kintinuous_tpu.io.ply import load_ply, save_ply
from kintinuous_tpu.ops.surface_nets import extract_mesh
from kintinuous_tpu.tracking.tracker import CloudSlice
from tests.test_tsdf import fused_sphere_volume, SPHERE_CAM, SPHERE_R, CFG


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(10, 3)).astype(np.float32)
    c = rng.integers(0, 255, (10, 3)).astype(np.uint8)
    n = rng.normal(size=(10, 3)).astype(np.float32)
    f = rng.integers(0, 10, (5, 3)).astype(np.int32)
    p = str(tmp_path / "m.ply")
    save_ply(p, v, c, n, f)
    out = load_ply(p)
    np.testing.assert_allclose(out["vertices"], v, atol=1e-6)
    np.testing.assert_array_equal(out["colors"], c)
    np.testing.assert_allclose(out["normals"], n, atol=1e-6)
    np.testing.assert_array_equal(out["faces"], f)


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    c = rng.integers(0, 255, (20, 3)).astype(np.uint8)
    n = rng.normal(size=(20, 3)).astype(np.float32)
    p = str(tmp_path / "c.pcd")
    save_pcd(p, pts, c, n)
    out = load_pcd(p)
    np.testing.assert_allclose(out["points"], pts, atol=1e-6)
    np.testing.assert_array_equal(out["colors"], c)
    np.testing.assert_allclose(out["normals"], n, atol=1e-6)


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]])
    cols = np.array([[10, 10, 10], [20, 20, 20], [30, 30, 30]], np.uint8)
    p, c, _ = voxel_downsample(pts, cols, None, leaf=0.1)
    assert len(p) == 2
    i = int(np.argmin(p[:, 0]))
    np.testing.assert_allclose(p[i], [0.005, 0, 0], atol=1e-9)
    assert c[i][0] == 15


def test_estimate_normals_plane():
    rng = np.random.default_rng(2)
    pts = np.zeros((200, 3))
    pts[:, :2] = rng.uniform(-1, 1, (200, 2))
    n = estimate_normals(pts, k=10, viewpoint=np.array([0.0, 0.0, 5.0]))
    assert (n[:, 2] > 0.99).all()  # +z, oriented towards viewpoint


def test_slice_processor_pipeline():
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    n = 3000
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pts[:, 2] = 0.5  # plane
    weights = np.full(n, 20.0)
    weights[:100] = 1.0  # culled
    sl = CloudSlice(
        points=pts, colors=np.full((n, 3), 100, np.uint8), weights=weights,
        dimension="XPlus", pose=np.eye(4), timestamp_us=0, frame_index=0,
    )
    proc = SliceProcessor(cfg)
    proc.process(sl)
    out = sl.processed
    assert out is not None
    assert 0 < len(out["points"]) < n  # culled + downsampled
    assert (np.abs(out["normals"][:, 2]) > 0.95).mean() > 0.95


def test_slice_processor_save(tmp_path):
    cfg = tiny_test_config()
    proc = SliceProcessor(cfg)
    rng = np.random.default_rng(4)
    for i in range(2):
        pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        sl = CloudSlice(
            points=pts, colors=np.full((500, 3), 50, np.uint8),
            weights=np.full(500, 10.0), dimension="XPlus",
            pose=np.eye(4), timestamp_us=0, frame_index=i,
        )
        proc.process(sl)
    p = str(tmp_path / "map.pcd")
    n = proc.save(p)
    out = load_pcd(p)
    assert len(out["points"]) == n > 0
    assert "normals" in out


def test_surface_nets_sphere_mesh():
    vol, T, _ = fused_sphere_volume()
    R = CFG.volume_resolution
    res = jax.jit(
        lambda v: extract_mesh(
            v, jnp.zeros(3, jnp.int32), (R, R, R), CFG.voxel_size,
            vertex_capacity=60000, face_capacity=120000,
        )
    )(vol)
    nv, nf = int(res.n_vertices), int(res.n_faces)
    assert 100 < nv < 60000
    assert nf > nv  # ~2 faces per vertex on a closed-ish surface
    verts = np.array(res.vertices[:nv])
    faces = np.array(res.faces[:nf])
    assert faces.min() >= 0 and faces.max() < nv
    center = np.array([CFG.volume_size / 2] * 3) + SPHERE_CAM
    r = np.linalg.norm(verts - center, axis=1)
    assert np.median(np.abs(r - SPHERE_R)) < CFG.voxel_size
    # face normals point outward from the sphere centre (winding check)
    tri = verts[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
    radial = tri.mean(axis=1) - center
    radial /= np.maximum(np.linalg.norm(radial, axis=1, keepdims=True), 1e-12)
    agree = (fn * radial).sum(axis=1)
    frac_out = (agree > 0).mean()
    assert frac_out > 0.9 or frac_out < 0.1, f"inconsistent winding: {frac_out}"


def test_surface_nets_empty():
    from kintinuous_tpu.ops.tsdf import make_volume

    vol = make_volume(32)
    res = extract_mesh(
        vol, jnp.zeros(3, jnp.int32), (32, 32, 32), 0.05,
        vertex_capacity=100, face_capacity=100,
    )
    assert int(res.n_vertices) == 0 and int(res.n_faces) == 0


def test_train_vocab_from_klg(tmp_path):
    from kintinuous_tpu.backend.features import Vocabulary, train_vocab_from_klg
    from kintinuous_tpu.config import CameraIntrinsics
    from kintinuous_tpu.io.synth import Scene, generate_klg, orbit_trajectory

    cam = CameraIntrinsics(fx=70, fy=70, cx=40, cy=30, width=80, height=60)
    klg = str(tmp_path / "v.klg")
    generate_klg(klg, cam, orbit_trajectory(6))
    out = str(tmp_path / "vocab.npy")
    v = train_vocab_from_klg(klg, out, k=32, frame_stride=1,
                             width=80, height=60)
    assert v.centroids.shape[1] == 32
    v2 = Vocabulary.load(out)
    assert (v2.centroids == v.centroids).all()


def test_ate_files(tmp_path):
    import numpy as np

    from kintinuous_tpu.eval.ate import ate_files
    from kintinuous_tpu.io.synth import orbit_trajectory
    from kintinuous_tpu.io.tum import save_trajectory

    poses = orbit_trajectory(10)
    stamps = [i / 30.0 for i in range(10)]
    gt = str(tmp_path / "gt.txt")
    est = str(tmp_path / "est.txt")
    save_trajectory(gt, stamps, poses)
    off = np.eye(4)
    off[:3, 3] = [0.5, -0.2, 0.1]
    save_trajectory(est, stamps, [off @ T for T in poses])
    rmse, n = ate_files(est, gt)
    assert n == 10 and rmse < 1e-6  # rigid offset aligns away
