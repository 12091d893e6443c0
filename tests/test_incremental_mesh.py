"""Incremental meshing: device-side band patches + deformation rewrite.

TPU-native replacement for the reference's UGP3 incremental greedy
triangulation (src/backend/IncrementalMesh.cpp, UGP3.cpp): each shifted-
out band is surface-nets-meshed on device inside the tracking step; loop
closures rewrite patch vertices through the deformation graph without
retriangulating (UGP3::updatePoints, UGP3.cpp:1667-1677).
"""

import numpy as np

from kintinuous_tpu.config import CameraIntrinsics, tiny_test_config
from kintinuous_tpu.io.synth import Scene, render_frame, straight_trajectory
from kintinuous_tpu.tracking.tracker import Tracker

CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=60.0, width=160, height=120)


def cfg_incr(**kw):
    base = dict(
        camera=CAM,
        volume_size=3.0,
        volume_resolution=128,
        fast_mode=True,
        voxel_shift=8,
        pyramid_levels=4,
        icp_iterations=(0, 10, 5, 0),
        bilateral_radius=2,
        extraction_capacity=200_000,
        band_cap=2048,
        mesh=True,
        online_deformation=True,
        mesh_vertex_capacity=100_000,
        mesh_face_capacity=200_000,
    )
    base.update(kw)
    return tiny_test_config(**base)


def run_straight(cfg, n=25, batched=False):
    poses = straight_trajectory(n, distance=1.0, axis=0)
    frames = [render_frame(Scene.default(), CAM, T) for T in poses]
    tracker = Tracker(cfg)
    items = []
    last = None
    for i, T in enumerate(poses):
        delta = (
            np.linalg.inv(last) @ T if last is not None else np.eye(4)
        ).astype(np.float32)
        items.append((frames[i][0], frames[i][1], int(i * 1e6 / 30), delta))
        last = T
    if batched:
        # batched path runs odometry internally; feed via process_frames
        tracker.process_frames([(d, c, ts) for d, c, ts, _ in items])
    else:
        for d, c, ts, delta in items:
            tracker.process_frame(d, c, ts, ext_delta=delta)
        tracker.flush()
    return tracker


def test_band_patches_emitted():
    cfg = cfg_incr()
    tracker = run_straight(cfg)
    # not every shift band contains surface (regions behind the camera
    # were never observed -> empty patches are skipped)
    assert len(tracker.mesh_patches) >= 2
    for p in tracker.mesh_patches:
        assert len(p.vertices) > 0 and len(p.faces) > 0
        assert np.isfinite(p.vertices).all()
        assert p.faces.max() < len(p.vertices)


def test_band_patches_near_slice_points():
    """Mesh-patch vertices should lie on the same surface as the
    extracted slice points (both come from the departing band)."""
    cfg = cfg_incr()
    tracker = run_straight(cfg)
    sl = next(s for s in tracker.slices if s.dimension.startswith("X"))
    patch = tracker.mesh_patches[0]
    # compare bounding boxes along the shift axis
    lo_s, hi_s = sl.points[:, 0].min(), sl.points[:, 0].max()
    lo_m, hi_m = patch.vertices[:, 0].min(), patch.vertices[:, 0].max()
    assert abs(lo_s - lo_m) < 0.15 and abs(hi_s - hi_m) < 0.15


def test_final_patch_on_finalise():
    cfg = cfg_incr()
    tracker = run_straight(cfg, n=10)
    n_before = len(tracker.mesh_patches)
    tracker.finalise()
    assert len(tracker.mesh_patches) == n_before + 1


def test_batched_emits_patches():
    cfg = cfg_incr()
    tracker = run_straight(cfg, batched=True)
    assert len(tracker.mesh_patches) >= 1
    for p in tracker.mesh_patches:
        assert p.faces.max() < len(p.vertices)


def test_deformation_rewrites_mesh_vertices():
    from kintinuous_tpu.backend.deform_runner import MapDeformation
    from kintinuous_tpu.backend.meshing import MeshPatch

    cfg = cfg_incr(fast_loops=False, dense_sampling_rate=0.15)
    md = MapDeformation(cfg)
    rng = np.random.default_rng(0)
    # straight trajectory of poses feeding graph nodes
    n = 12
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = i * 0.2
        md.add_frame_pose(i * 100000, T)
    patch = MeshPatch(
        vertices=rng.uniform(0, 2.0, (500, 3)).astype(np.float32),
        colors=np.zeros((500, 3), np.uint8),
        faces=np.zeros((2, 3), np.int32),
        timestamp_us=5 * 100000,
    )
    md.add_mesh_patch(patch)
    before = patch.vertices.copy()
    # synthetic loop: translate all node targets by 5 cm in y
    src = np.array([[i * 0.2, 0, 0] for i in range(n)], np.float64)
    dst = src + np.array([0.0, 0.05, 0.0])
    b = md.dgraph.bind(src, np.arange(n) * 100000)
    md.dgraph.optimise(src, dst, b, iters=10)
    md._apply_to_mesh()
    moved = np.linalg.norm(patch.vertices - before, axis=1)
    assert moved.mean() > 0.01  # vertices actually moved
    assert np.isfinite(patch.vertices).all()


def test_engine_saves_incremental_mesh(tmp_path):
    """Engine save path picks the deformed mesh when loops were accepted."""
    from kintinuous_tpu.backend.deform_runner import MapDeformation
    from kintinuous_tpu.backend.meshing import MeshPatch

    cfg = cfg_incr()
    md = MapDeformation(cfg)
    md.n_loops_accepted = 1
    md.add_mesh_patch(
        MeshPatch(
            vertices=np.zeros((4, 3), np.float32),
            colors=np.zeros((4, 3), np.uint8),
            faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        )
    )
    out = tmp_path / "m_opt.ply"
    n = md.save_mesh(str(out))
    assert n == 4 and out.exists()


def test_whole_map_mesh_without_deformation(tmp_path):
    """-m WITHOUT -od must still save a mesh covering shifted-out
    regions (reference meshes every accumulated slice at save,
    MeshGenerator.cpp:37-191) — not just the live volume."""
    from kintinuous_tpu.io.synth import Scene, generate_klg, straight_trajectory
    from kintinuous_tpu.io.ply import load_ply
    from kintinuous_tpu.runtime.engine import SlamEngine

    cfg = cfg_incr(online_deformation=False)
    poses = straight_trajectory(18, distance=1.0, axis=0)
    log = str(tmp_path / "walk.klg")
    gt = str(tmp_path / "walk.gt")
    generate_klg(log, CAM, poses, scene=Scene.default(), gt_path=gt)
    cfg = cfg.replace(
        log_file=log, trajectory_file=gt, save_file=str(tmp_path / "out"),
    )
    engine = SlamEngine(cfg).run()
    shifts = np.array(engine.tracker.shift_log)
    assert (shifts != 0).any(), "walk never shifted — weaken test"
    outs = engine.save()
    mesh = load_ply(outs["mesh"])
    assert len(mesh["vertices"]) > 100 and len(mesh["faces"]) > 100
    # departed bands lie BEHIND the live volume's -x face
    vol_lo_x = float(np.asarray(engine.tracker.state.vol.origin)[0])
    n_behind = int((mesh["vertices"][:, 0] < vol_lo_x - 1e-3).sum())
    assert n_behind > 50, (
        f"saved mesh has only {n_behind} vertices behind the live volume "
        f"(x < {vol_lo_x:.3f}) — shifted-out regions missing"
    )


def _edge_stats(faces):
    """(interior_fraction, n_edges): interior = edge used by >=2 faces."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return float((counts >= 2).mean()), len(counts)


def test_weld_seals_patch_seams():
    """Band patches weld by global cell identity into one seamless mesh
    (the UGP3 fringe role, UGP3.cpp:1642-1665): no duplicated cells, no
    double-wall near-duplicate vertices, and seam edges closed vs the
    naive offset concat."""
    from kintinuous_tpu.backend.meshing import MeshCollector, _cell_keys, weld_patches

    cfg = cfg_incr()
    tracker = run_straight(cfg)
    tracker.finalise()
    patches = [p for p in tracker.mesh_patches if len(p.vertices)]
    assert len(patches) >= 3  # several bands + FINAL
    assert all(p.cells is not None for p in patches)

    verts, cols, faces = weld_patches(patches)
    # 1. one vertex per global cell
    keys = np.concatenate([_cell_keys(p.cells) for p in patches])
    assert len(verts) == len(np.unique(keys))
    assert faces.max() < len(verts)
    # 2. no double walls: near-coincident vertex pairs ~eliminated
    vsz = cfg.voxel_size

    def near_dups(v):
        q = np.round(v / (0.25 * vsz)).astype(np.int64)
        _, c = np.unique(q, axis=0, return_counts=True)
        return int((c > 1).sum())

    concat = np.concatenate([p.vertices for p in patches])
    d_concat = near_dups(concat)
    d_weld = near_dups(verts)
    # noise floor: even a single seamless extraction has incidental
    # near-pairs (adjacent cells whose crossings sit near a shared
    # corner) — the FINAL patch is one such extraction
    final = patches[-1]
    floor = near_dups(final.vertices) * len(verts) / max(len(final.vertices), 1)
    assert d_concat > 50, "test scene produced no overlap — weaken test"
    assert d_weld < 0.5 * d_concat, (d_weld, d_concat)
    assert d_weld <= 2.0 * floor + 10, (d_weld, floor)
    # 3. seams close: interior-edge fraction improves over offset concat
    off_faces = []
    off = 0
    for p in patches:
        off_faces.append(p.faces + off)
        off += len(p.vertices)
    frac_concat, _ = _edge_stats(np.concatenate(off_faces))
    frac_weld, n_edges = _edge_stats(faces)
    assert n_edges > 1000
    # open edges at the NEVER-OBSERVED outer borders dominate both
    # numbers; welding must close the seam edges (strictly better) and
    # keep the union overwhelmingly interior-connected
    assert frac_weld >= frac_concat
    assert frac_weld > 0.9, f"welded mesh still {1-frac_weld:.1%} open edges"


def test_sharded_band_patches_match_single_chip():
    """--devices N -m: the sharded fast step emits the SAME band mesh
    patches as the single-chip tracker (psum-assembled replicated band
    box, VERDICT r3 next-round #9), and the welded whole-map .ply
    saves (band patches + final volume mesh via cell identity)."""
    import jax
    from jax.sharding import Mesh
    from kintinuous_tpu.backend.meshing import MeshCollector, mesh_current_volume
    from kintinuous_tpu.parallel.tracker import ShardedTracker

    devs = jax.devices()
    assert len(devs) >= 4
    mesh = Mesh(np.array(devs[:4]), axis_names=("z",))

    # half-res pixel rows must divide the 4-chip mesh at every level
    cam = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=64.0,
                           width=160, height=128)
    cfg = cfg_incr(camera=cam, online_deformation=False, pallas=False)
    poses = straight_trajectory(25, distance=1.0, axis=0)
    frames = [render_frame(Scene.default(), cam, T) for T in poses]

    def run(tracker):
        last = None
        for i, T in enumerate(poses):
            delta = (
                np.linalg.inv(last) @ T if last is not None else np.eye(4)
            ).astype(np.float32)
            tracker.process_frame(
                frames[i][0], frames[i][1], int(i * 1e6 / 30),
                ext_delta=delta,
            )
            last = T
        tracker.flush()
        return tracker

    single = run(Tracker(cfg))
    sharded = run(ShardedTracker(cfg, mesh=mesh))
    assert len(single.mesh_patches) >= 2, "walk emitted no band patches"
    assert len(sharded.mesh_patches) == len(single.mesh_patches)
    for a, b in zip(single.mesh_patches, sharded.mesh_patches):
        assert len(a.vertices) == len(b.vertices)
        assert len(a.faces) == len(b.faces)
        oa = np.lexsort((a.cells[:, 2], a.cells[:, 1], a.cells[:, 0]))
        ob = np.lexsort((b.cells[:, 2], b.cells[:, 1], b.cells[:, 0]))
        np.testing.assert_array_equal(a.cells[oa], b.cells[ob])
        np.testing.assert_allclose(
            a.vertices[oa], b.vertices[ob], atol=1e-4
        )

    # welded whole-map save: band patches + final volume mesh
    sharded.finalise()
    import tempfile, os

    mc = MeshCollector()
    for p in sharded.mesh_patches:
        mc.add(p)
    out = os.path.join(tempfile.mkdtemp(), "sharded.ply")
    n = mc.save(out)
    assert os.path.exists(out) and n > 500
