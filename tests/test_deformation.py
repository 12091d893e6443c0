import numpy as np

from kintinuous_tpu.backend.deformation import DeformationGraph


def make_graph(n_nodes=10, spacing=1.0):
    g = DeformationGraph(k=4, sample_dist=0.5)
    times = np.arange(n_nodes) * 1000
    pos = np.zeros((n_nodes, 3))
    pos[:, 0] = np.arange(n_nodes) * spacing
    g.append_poses(times, pos)
    return g, times, pos


def test_node_sampling_respects_distance():
    g = DeformationGraph(k=4, sample_dist=0.8)
    times = np.arange(10)
    pos = np.zeros((10, 3))
    pos[:, 0] = np.arange(10) * 0.3  # 0.3 m apart -> every 3rd kept
    added = g.append_poses(times, pos)
    assert added == 4  # 0.0, 0.9, 1.8, 2.7
    np.testing.assert_allclose([p[0] for p in g.g], [0.0, 0.9, 1.8, 2.7])


def test_binding_back_in_time():
    g, times, pos = make_graph(10)
    verts = np.array([[5.2, 0.1, 0.0], [2.1, -0.1, 0.0]])
    vtimes = np.array([5500, 2500])
    b = g.bind(verts, vtimes)
    # bindings only to nodes at or before the vertex time
    assert (times[b.ids[0]] <= 5500).all()
    assert (times[b.ids[1]] <= 2500).all()
    np.testing.assert_allclose(b.w.sum(axis=1), 1.0, atol=1e-5)


def test_identity_constraints_keep_graph_still():
    g, times, pos = make_graph(8)
    verts = pos[:6] + np.array([0.1, 0.2, 0.0])
    b = g.bind(verts, times[:6] + 1)
    err = g.optimise(verts, verts.copy(), b, iters=4)
    assert err < 1e-6
    out = g.apply(verts, b)
    np.testing.assert_allclose(out, verts, atol=1e-3)


def test_deformation_moves_constrained_points():
    g, times, pos = make_graph(12)
    # demand that points near the end of the trajectory move up by 0.5 m,
    # while the start stays pinned
    src = np.concatenate([pos[:3], pos[9:]])
    dst = src.copy()
    dst[3:, 1] += 0.5
    vt = np.concatenate([times[:3], times[9:]]) + 1
    b = g.bind(src, vt)
    err = g.optimise(src, dst, b, iters=10)
    assert err < 5e-3, f"constraint error {err}"
    moved = g.apply(src, b)
    np.testing.assert_allclose(moved[3:, 1], dst[3:, 1], atol=0.05)
    np.testing.assert_allclose(moved[:3, 1], 0.0, atol=0.05)
    # in-between vertices deform smoothly (monotonic-ish lift)
    mid = pos[4:9] + np.array([0.3, 0.0, 0.0])
    bm = g.bind(mid, times[4:9] + 1)
    lifted = g.apply(mid, bm)
    assert (np.diff(lifted[:, 1]) > -0.05).all()


def test_rotation_stays_near_orthonormal():
    g, times, pos = make_graph(10)
    src = pos[7:]
    dst = src + np.array([0.0, 0.3, 0.1])
    b = g.bind(src, times[7:] + 1)
    g.optimise(src, dst, b, iters=8)
    RtR = np.einsum("mji,mjk->mik", g.A, g.A)
    err = np.abs(RtR - np.eye(3)).max()
    assert err < 0.15, f"A drifted from orthonormal: {err}"
